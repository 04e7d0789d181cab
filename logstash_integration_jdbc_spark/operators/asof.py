"""As-of (point-in-time) join — latest right row at or before each left row.

The reference delegates every join to the remote DB (SURVEY.md §2.3
"delegated SQL surface"); an as-of join is the one join shape a
log/telemetry pipeline needs that plain Spark SQL has no operator for
(enrich each event with the most recent state/config/rate row for its
key). Implemented Spark-first as the union + ordered-window
last-value-fill composition:

    union(left tagged, right tagged)
      → window partitionBy(key) orderBy(ts, right-first)
      → last(right_payload, ignorenulls) over unbounded-preceding
      → keep left rows

One shuffle (the window exchange on the key), no join explosion, no
per-row Python; skewed keys are handled by the same salting story as
every other key exchange (a hot key's window is a single partition —
callers with pathological keys should pre-split by time range).
Semantics match DuckDB ``ASOF JOIN`` (backward, inclusive) /
pandas ``merge_asof(direction="backward")``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "key",
    direction: str = "backward",
    right_prefix: str = "",
) -> DataFrame:
    """Left as-of join: each left row gets the right row whose ``on`` is
    the closest at-or-before (``backward``) / at-or-after (``forward``)
    its own, within the same ``by`` key group. Right payload columns come
    back flattened (optionally prefixed); unmatched left rows keep nulls.

    Column name collisions between left payload and right payload must be
    resolved by ``right_prefix``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by_cols = [by] if isinstance(by, str) else list(by)
    lpay = [c for c in left.columns]
    rpay = [c for c in right.columns if c not in by_cols and c != on]
    if not rpay:
        raise ValueError("right side has no payload columns")
    out_names = {f"{right_prefix}{c}" for c in rpay}
    clash = out_names & set(lpay)
    if clash:
        raise ValueError(f"right payload collides with left columns: {sorted(clash)}")

    # Null-struct literals are built from StructType objects (not DDL
    # strings) so exotic column names / nested types never break parsing.
    r_struct = T.StructType([T.StructField(c, right.schema[c].dataType) for c in rpay])
    l_struct = T.StructType([T.StructField(c, left.schema[c].dataType) for c in lpay])

    # NULL `on` semantics match DuckDB ASOF / pandas merge_asof: a right
    # row with NULL ts never matches anything (filtered before the union);
    # a left row with NULL ts gets a null match (explicit override below).
    # __src orders right rows before left rows at equal timestamps →
    # inclusive match (right.ts == left.ts wins), DuckDB/pandas semantics.
    lrows = left.select(
        *[F.col(c) for c in by_cols],
        F.col(on).alias("__on"),
        F.lit(1).alias("__src"),
        F.struct(*[F.col(c) for c in lpay]).alias("__l"),
        F.lit(None).cast(r_struct).alias("__r"),
    )
    rrows = right.filter(F.col(on).isNotNull()).select(
        *[F.col(c) for c in by_cols],
        F.col(on).alias("__on"),
        F.lit(0).alias("__src"),
        F.lit(None).cast(l_struct).alias("__l"),
        F.struct(*[F.col(c) for c in rpay]).alias("__r"),
    )
    both = lrows.unionByName(rrows)

    order = [F.col("__on").asc(), F.col("__src").asc()] if direction == "backward" \
        else [F.col("__on").desc(), F.col("__src").asc()]
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    match = F.when(F.col("__on").isNull(), F.lit(None).cast(r_struct)).otherwise(
        F.last("__r", ignorenulls=True).over(w)
    )
    filled = both.withColumn("__match", match)
    return filled.filter(F.col("__src") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in lpay],
        *[F.col(f"__match.{c}").alias(f"{right_prefix}{c}") for c in rpay],
    )
