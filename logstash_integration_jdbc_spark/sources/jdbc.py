"""Generic JDBC source adapter: the reference's connection surface on
Spark's native JDBC datasource.

The reference's raison d'être is JDBC connectivity
(/root/reference/lib/logstash/inputs/jdbc.rb:339-353 executes the
statement over a Sequel connection; paged fetch
statement_handler.rb:72-124; fetch size jdbc.rb:66-69). Everything else
in this engine reads parquet/Iceberg; this module closes the last
conceptual surface a user migrating off the reference would hit, as a
thin declarative translation — NOT a reimplementation of connection
handling, which `spark.read.format("jdbc")` (JDBCRelation) already does
distributed, partition-parallel, and with predicate pushdown.

Option translation (reference → Spark):

- ``jdbc_connection_string`` → ``url``; ``jdbc_user``/``jdbc_password``
  → ``user``/``password``; ``jdbc_driver_class`` → ``driver``
  (jdbc.rb:34-51).
- ``jdbc_fetch_size`` → ``fetchsize`` (jdbc.rb:66-69): same JDBC-level
  row-batching knob, applied per partition reader.
- ``statement`` (or ``statement_filepath``) → ``query``; with paging it
  becomes a ``dbtable`` derived-table subquery because Spark's
  partitioned reads require a relation, not a bare query.
- ``jdbc_paging_enabled`` + ``jdbc_page_size`` (auto mode,
  statement_handler.rb:72-103): the reference fetches the result
  serially in LIMIT/OFFSET pages of ``jdbc_page_size`` rows; Spark
  reads the SAME pages as ``numPartitions = ceil(span / page_size)``
  range partitions on ``partitionColumn`` — in parallel, one executor
  per page, no OFFSET re-scan cost on the database (OFFSET N makes the
  server walk N rows; range predicates seek). This is the S4 mapping
  SURVEY.md §2 promises.
- ``jdbc_paging_mode == "explicit"`` (statement_handler.rb:105-124):
  the user's statement carries ``:size``/``:offset`` markers and the
  reference substitutes page bounds itself; here each page becomes one
  partition via Spark's ``predicates`` mechanism — see
  ``explicit_page_predicates``.
- ``:sql_last_value`` (and named ``parameters``) are substituted into
  the statement TEXT as SQL literals before it ships to the database —
  the reference does the same string substitution
  (statement_handler.rb:65-68 via Sequel named binds). This makes F5
  (SQL literal quoting, value_handler.rb) applicable here and only
  here: ``sql_literal`` below is its Spark-side twin.

Scale note: the in-memory Derby used by the tests is same-JVM only; on
a real cluster the url must point at a network-reachable database, and
``numPartitions`` bounds the number of concurrent connections the
cluster opens (each partition is one connection — cap it with
``max_partitions`` so a 1000-executor cluster does not DDoS the DB;
the reference, single-threaded, never had to think about this).
"""

from __future__ import annotations

import datetime as _dt
import math
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from logstash_integration_jdbc_spark.sources.scan import resolve_statement

_MISSING = object()


def sql_literal(value: Any) -> str:
    """Render a Python value as an ANSI SQL literal (F5 twin of the
    reference's Sequel literalization, value_handler.rb): strings quote
    with ``''`` doubling, temporals render ISO (timestamp literals),
    None → NULL, bools → TRUE/FALSE, ints/floats bare."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    if isinstance(value, _dt.datetime):
        # JDBC escape syntax, not ANSI TIMESTAMP '...': every JDBC
        # driver must rewrite {ts ...} into its engine's dialect
        # (Derby, for one, rejects the ANSI literal form)
        return "{ts '" + value.strftime("%Y-%m-%d %H:%M:%S") + (
            (".%06d" % value.microsecond).rstrip("0") if value.microsecond else ""
        ) + "'}"
    if isinstance(value, _dt.date):
        return "{d '" + value.isoformat() + "'}"
    if isinstance(value, str):
        return "'" + value.replace("'", "''") + "'"
    raise TypeError(f"cannot render {type(value).__name__} as a SQL literal")


def substitute_sql_params(statement: str, parameters: dict[str, Any] | None = None,
                          sql_last_value: Any = _MISSING) -> str:
    """Substitute ``:name`` markers with SQL literals, longest name
    first (so ``:sql_last_value`` never partially matches ``:sql``),
    mirroring the reference's named-bind substitution
    (statement_handler.rb:65-68). Unknown markers are left intact —
    the database reports them, same as the reference."""
    params = dict(parameters or {})
    if sql_last_value is not _MISSING:
        params["sql_last_value"] = sql_last_value
    out = statement
    for name in sorted(params, key=len, reverse=True):
        out = out.replace(f":{name}", sql_literal(params[name]))
    return out


def jdbc_reader_options(
    jdbc_connection_string: str,
    jdbc_user: str | None = None,
    jdbc_password: str | None = None,
    jdbc_driver_class: str | None = None,
    jdbc_fetch_size: int | None = None,
    statement: str | None = None,
    statement_filepath: str | None = None,
    parameters: dict[str, Any] | None = None,
    sql_last_value: Any = _MISSING,
    jdbc_paging_enabled: bool = False,
    jdbc_page_size: int = 100_000,
    tracking_column: str | None = None,
    bounds: tuple[Any, Any] | None = None,
    max_partitions: int = 256,
) -> dict[str, str]:
    """Translate the reference's option names into Spark JDBC reader
    options (auto paging mode). Pure function — unit-testable without a
    database. ``bounds`` is (min, max) of ``tracking_column``; required
    when paging is enabled (``read_jdbc`` discovers it with a one-row
    min/max query when omitted)."""
    sql = resolve_statement(statement, statement_filepath)
    sql = substitute_sql_params(sql, parameters, sql_last_value)
    opts: dict[str, str] = {"url": jdbc_connection_string}
    if jdbc_user is not None:
        opts["user"] = jdbc_user
    if jdbc_password is not None:
        opts["password"] = jdbc_password
    if jdbc_driver_class is not None:
        opts["driver"] = jdbc_driver_class
    if jdbc_fetch_size is not None:
        opts["fetchsize"] = str(int(jdbc_fetch_size))
    if not jdbc_paging_enabled:
        opts["query"] = sql
        return opts
    if not tracking_column:
        raise ValueError(
            "jdbc_paging_enabled requires tracking_column: Spark's "
            "partitioned read ranges on a column (the parallel "
            "equivalent of the reference's LIMIT/OFFSET pages)")
    if bounds is None:
        raise ValueError("paging requires bounds=(lower, upper); "
                         "read_jdbc discovers them when omitted")
    lower, upper = bounds
    span = _bound_span(lower, upper)
    n_parts = max(1, min(int(max_partitions),
                         math.ceil(span / max(1, int(jdbc_page_size)))))
    # partitioned reads need a relation: wrap the query as the same
    # derived-table alias Spark generates for its own subqueries
    opts["dbtable"] = f"({sql}) SPARK_GEN_SUBQ"
    opts["partitionColumn"] = tracking_column
    opts["lowerBound"] = _bound_str(lower)
    opts["upperBound"] = _bound_str(upper)
    opts["numPartitions"] = str(n_parts)
    return opts


def _bound_span(lower: Any, upper: Any) -> float:
    if isinstance(lower, _dt.datetime) and isinstance(upper, _dt.datetime):
        # one "row" per second is the densest sane default for a
        # timestamp tracking column; page_size then means seconds/page
        return max(0.0, (upper - lower).total_seconds())
    return max(0.0, float(upper) - float(lower))


def _bound_str(b: Any) -> str:
    if isinstance(b, _dt.datetime):
        return b.strftime("%Y-%m-%d %H:%M:%S")
    return str(b)


def explicit_page_predicates(n_pages: int, page_size: int,
                             order_column: str) -> list[str]:
    """Explicit paging mode (statement_handler.rb:105-124): the
    reference substitutes ``:size``/``:offset`` into the user's own
    paging statement, one serial query per page. Spark's equivalent is
    the ``predicates`` read form — one WHERE clause per partition —
    expressed as half-open ranges on the ordering column (OFFSET
    re-walks N rows per page on most engines; ranges seek). The page
    count is caller-provided, as in the reference where the user's
    markers imply they know their paging shape."""
    if n_pages < 1 or page_size < 1:
        raise ValueError("n_pages and page_size must be >= 1")
    return [
        f"{order_column} >= {i * page_size} AND {order_column} < {(i + 1) * page_size}"
        for i in range(n_pages)
    ]


def read_jdbc(
    spark: SparkSession,
    lowercase_column_names: bool = True,
    **config: Any,
) -> DataFrame:
    """S1/S2/S4 over a real database: build reader options from the
    reference's option names and load. When paging is enabled and no
    ``bounds`` given, discovers (min, max) of the tracking column with
    a one-row min/max query first (the reference's auto mode likewise
    issues its own count query before paging,
    statement_handler.rb:76-80)."""
    if config.get("jdbc_paging_enabled") and config.get("bounds") is None:
        probe = dict(config, jdbc_paging_enabled=False)
        probe.pop("bounds", None)
        tc = config.get("tracking_column")
        if not tc:
            raise ValueError("jdbc_paging_enabled requires tracking_column")
        inner = substitute_sql_params(
            resolve_statement(probe.get("statement"),
                              probe.get("statement_filepath")),
            probe.get("parameters"), probe.get("sql_last_value", _MISSING))
        probe["statement"] = (f"SELECT MIN({tc}) AS lo, MAX({tc}) AS hi "
                              f"FROM ({inner}) SPARK_GEN_BOUNDS")
        probe.pop("statement_filepath", None)
        row = read_jdbc(spark, lowercase_column_names=True, **probe).collect()[0]
        if row["lo"] is None and row["hi"] is None:
            # empty result: degrade to a plain single-partition read
            config = dict(config, jdbc_paging_enabled=False)
        else:
            config = dict(config, bounds=(row["lo"], row["hi"]))
    opts = jdbc_reader_options(**config)
    df = spark.read.format("jdbc").options(**opts).load()
    if lowercase_column_names:
        df = df.toDF(*[c.lower() for c in df.columns])
    return df


def read_jdbc_explicit_pages(
    spark: SparkSession,
    n_pages: int,
    order_column: str,
    lowercase_column_names: bool = True,
    **config: Any,
) -> DataFrame:
    """Explicit paging mode: one partition per caller-defined page via
    JDBC ``predicates`` (see ``explicit_page_predicates``)."""
    page_size = int(config.get("jdbc_page_size", 100_000))
    base = dict(config, jdbc_paging_enabled=False)
    opts = jdbc_reader_options(**base)
    sql = opts.pop("query")
    preds = explicit_page_predicates(n_pages, page_size, order_column)
    url = opts.pop("url")
    props = {k: v for k, v in opts.items()}
    df = spark.read.jdbc(url=url, table=f"({sql}) SPARK_GEN_SUBQ",
                         predicates=preds, properties=props)
    if lowercase_column_names:
        df = df.toDF(*[c.lower() for c in df.columns])
    return df
