"""Sources: full scans, incremental (checkpointed) scans, statement files.

Reference semantics reimagined Spark-first:

- S1 full scan (``statement`` run once, one event per row,
  /root/reference/lib/logstash/inputs/jdbc.rb:339-353): a declarative
  table/parquet read — Catalyst handles projection pushdown.
- S2 incremental scan (``WHERE tracking > :sql_last_value``,
  /root/reference/lib/logstash/plugin_mixins/jdbc/jdbc.rb:219-270): a
  filter on the tracking column. Expressed declaratively so the predicate
  pushes into the parquet/Iceberg scan (partition + file pruning — at
  100 TB this is the difference between reading one hour and reading
  everything).
- S4/S5 pagination (statement_handler.rb:72-124): obsolete under Spark —
  the scan is partitioned; ``jdbc_page_size`` maps to
  ``spark.sql.files.maxPartitionBytes`` / ``repartition``.
- S6 prepared statements (statement_handler.rb:126-174): parameterized
  ``spark.sql(sql, args=...)``.
- S7 statement from file (jdbc.rb:170-171,292-296).
- P1 lowercase column names (jdbc mixin :192-198).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_testdata(spark: SparkSession, sf_dir: str, *tables: str) -> dict[str, DataFrame]:
    """Load driver-provided parquet tables and register temp views."""
    names = tables or TESTDATA_TABLES
    out: dict[str, DataFrame] = {}
    for name in names:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def scan_table(
    spark: SparkSession,
    path: str,
    lowercase_column_names: bool = True,
    target: str | None = None,
) -> DataFrame:
    """S1 full scan + P1 lowercase + P2 target nesting.

    ``target`` nests the whole row under one struct column, mirroring the
    input's ``target`` option (jdbc.rb:247-248): the reference wraps each
    row hash under a sub-field; here it is a zero-cost struct projection.
    """
    df = spark.read.parquet(path)
    if lowercase_column_names:
        df = df.toDF(*[c.lower() for c in df.columns])
    if target:
        df = df.select(F.struct(*df.columns).alias(target))
    return df


def incremental_scan(
    df: DataFrame,
    tracking_column: str,
    last_value: Any,
    inclusive: bool = False,
) -> DataFrame:
    """S2: rows strictly above the persisted watermark.

    The reference substitutes ``:sql_last_value`` into the user's SQL
    (statement_handler.rb:65-68); rows at-or-below the watermark are
    skipped forever (docs/input-jdbc.asciidoc:69-76 — late data is
    dropped). The filter is a plain Catalyst predicate, so it reaches the
    file scan (check ``PushedFilters`` in ``.explain``).
    """
    col = F.col(tracking_column)
    pred: Column = (col >= F.lit(last_value)) if inclusive else (col > F.lit(last_value))
    return df.filter(pred)


def max_watermark(df: DataFrame, tracking_column: str) -> Any:
    """A2: the scan's max tracking value (safe vs the reference's
    last-seen-row value, which under-records on unordered scans —
    SURVEY.md §7.3a)."""
    row = df.agg(F.max(tracking_column).alias("w")).collect()[0]
    return row["w"]


def partition_cursors(
    df: DataFrame,
    ts_col: str = "ts",
    bucket_expr: Column | None = None,
    n_buckets: int = 16,
) -> dict[str, dict[str, Any]]:
    """North-star per-partition cursors: bucket → (max ts, conv_id, turn_idx).

    Buckets default to a stable hash of conv_id — the same bucketing the
    router's salted repartition uses — so the cursor file is executor-count
    independent. Computed with one ``max(struct(...))`` aggregation
    (map-side partial, tiny shuffle: n_buckets rows out).
    """
    bucket = bucket_expr if bucket_expr is not None else F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets))
    rows = (
        df.groupBy(bucket.cast("string").alias("bucket"))
        .agg(F.max(F.struct(F.col(ts_col).alias("max_ts"), "conv_id", "turn_idx")).alias("cur"))
        .collect()
    )
    return {
        r["bucket"]: {
            "max_ts": r["cur"]["max_ts"],
            "conv_id": r["cur"]["conv_id"],
            "turn_idx": r["cur"]["turn_idx"],
        }
        for r in rows
    }


def read_statement_file(path: str) -> str:
    """S7: statement_filepath — read the SQL text."""
    with open(path, encoding="utf-8") as f:
        return f.read().strip()


def resolve_statement(statement: str | None = None,
                      statement_filepath: str | None = None) -> str:
    """S7 exclusivity: exactly one of statement / statement_filepath
    (jdbc.rb:292-296 raises the same configuration error)."""
    if (statement is None) == (statement_filepath is None):
        raise ValueError(
            "Must set either statement or statement_filepath. "
            "Only one may be set at a time."
        )
    return statement if statement is not None else read_statement_file(statement_filepath)


def validate_prepared_statement_mode(
    statement: str,
    bind_values: list[Any] | tuple[Any, ...],
    name: str = "",
    paging_enabled: bool = False,
    warn_on_constant_usage: bool = True,
) -> list[str]:
    """Full prepared-statement-mode validation parity
    (jdbc.rb:361-375): returns every error message, empty = valid.
    ``run_statement`` enforces the marker-count rule itself; this is the
    config-level check covering the two the execution path can't see —
    the statement name (the db-session handle the reference registers)
    and the paging conflict (pagination is unsupported with prepared
    statements). ``warn_on_constant_usage`` (default-on, matching
    jdbc_streaming.rb:95,188-194) logs when a bare string bind value
    would silently bind as a constant rather than a field reference."""
    if warn_on_constant_usage:
        from logstash_integration_jdbc_spark.functions.interpolate import (
            warn_on_string_constants,
        )

        warn_on_string_constants(bind_values)
    errors: list[str] = []
    if not name:
        errors.append("must provide a name for the Prepared Statement, "
                      "it must be unique for the db session")
    if statement.count("?") != len(bind_values):
        errors.append("there is a mismatch between the number of statement "
                      "`?` placeholders and :prepared_statement_bind_values "
                      "array setting elements")
    if paging_enabled:
        errors.append("JDBC pagination cannot be used at this time")
    return errors


def run_statement(
    spark: SparkSession,
    statement: str,
    params: dict[str, Any] | list[Any] | tuple[Any, ...] | None = None,
    sql_last_value: Any = None,
) -> DataFrame:
    """S6: prepared-statement analog — parameterized spark.sql.

    Two schemes, both bound safely by Spark (no string splicing, no
    injection):

    - named: ``params`` dict → ``:name`` markers;
    - positional (reference parity): ``params`` list/tuple → ordered
      ``?`` markers, where a literal ``":sql_last_value"`` entry is
      substituted with ``sql_last_value`` before binding
      (statement_handler.rb:126-174 ``positional_bind_mapping``).

    Positional validation mirrors the reference's register check
    (jdbc.rb:361-370): the number of ``?`` markers must equal the number
    of bind values, else a configuration error.
    """
    if isinstance(params, (list, tuple)):
        if statement.count("?") != len(params):
            raise ValueError(
                "there is a mismatch between the number of statement `?` "
                f"placeholders ({statement.count('?')}) and bind values "
                f"({len(params)})"
            )
        binds = [sql_last_value if p == ":sql_last_value" else p for p in params]
        return spark.sql(statement, args=binds)
    return spark.sql(statement, args=params or {})
