"""One-pass table profiling (data-quality stats per column).

The reference's closest feature is its count-guard prefetch
(lib/logstash/plugin_mixins/jdbc/jdbc.rb execute_statement counting);
this generalizes it to the column-level profile a 100 TB ingest needs
before committing a crawl drop: null rates, cardinalities, ranges and
moments for every column in ONE scan.

Scale design: everything is a single ``df.agg(...)`` — count/min/max/
avg/stddev are all partial-aggregatable, so the exchange carries one
pre-aggregated row per task, never data. Distinct counts default to
``approx_count_distinct`` (HyperLogLog++, also partial-aggregatable);
``exact_distinct=True`` switches to exact ``countDistinct``, which
Catalyst plans as an Expand (one pass, but the shuffle grows by a
factor of the profiled-column count — fine for validation runs at
moderate scale, the approx path is the 100 TB default). The long-form
reshape is an explode of a literal struct array over the single
aggregate row — no second scan, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}
_ATOMIC_PREFIXES = ("decimal",)


def _is_atomic(dtype: str) -> bool:
    return (
        dtype in _NUMERIC
        or dtype in {"string", "boolean", "date", "timestamp", "timestamp_ntz"}
        or dtype.startswith(_ATOMIC_PREFIXES)
    )


def profile(df: DataFrame, columns: list[str] | None = None,
            exact_distinct: bool = False) -> DataFrame:
    """Profile the atomic columns of ``df`` in one aggregation pass.

    Returns one row per column:
    (column, dtype, n_rows, n_nulls, n_distinct, min_val, max_val,
    mean, stddev) — min/max cast to string so every column fits one
    schema; mean/stddev (sample) are NULL for non-numeric columns;
    ``n_distinct`` excludes NULLs (both engines' count-distinct
    semantics). Non-atomic columns (array/struct/map/binary) are
    skipped — profile their exploded or decoded projections instead.
    """
    cols = [(c, t) for c, t in df.dtypes if _is_atomic(t)
            and (columns is None or c in columns)]
    if not cols:
        raise ValueError("profile: no atomic columns selected")
    distinct = F.countDistinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c, t in cols:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"__nn_{c}"),
            distinct(col).alias(f"__nd_{c}"),
            F.min(col).cast("string").alias(f"__mn_{c}"),
            F.max(col).cast("string").alias(f"__mx_{c}"),
        ]
        if t in _NUMERIC or t.startswith("decimal"):
            aggs += [
                F.avg(col).cast("double").alias(f"__av_{c}"),
                F.stddev_samp(col).cast("double").alias(f"__sd_{c}"),
            ]
    row = df.agg(*aggs)
    pieces = []
    for c, t in cols:
        numeric = t in _NUMERIC or t.startswith("decimal")
        pieces.append(F.struct(
            F.lit(c).alias("column"),
            F.lit(t).alias("dtype"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nn_{c}").alias("n_nulls"),
            F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_val"),
            F.col(f"__mx_{c}").alias("max_val"),
            (F.col(f"__av_{c}") if numeric
             else F.lit(None).cast("double")).alias("mean"),
            (F.col(f"__sd_{c}") if numeric
             else F.lit(None).cast("double")).alias("stddev"),
        ))
    return row.select(F.explode(F.array(*pieces)).alias("p")).select("p.*")
