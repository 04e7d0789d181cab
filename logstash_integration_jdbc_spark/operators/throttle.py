"""Rate limiting and rolling-statistic anomaly flagging.

Batch re-expressions of two telemetry staples around the reference's
scheduled-scan model (logstash-filter-throttle semantics for the rate
limiter; rolling z-score is the standard ops-dashboard anomaly rule):

- ``throttle``: tag every event past the first ``max_count`` per key
  per period. The filter does this with an in-memory timeslot cache;
  columnar form is a ``row_number`` over (key, period bucket) — ONE
  shuffle on exactly the keys a 1000-executor run would need anyway,
  no state, deterministic under any partitioning given ``order_cols``.
- ``count_anomalies``: per-key per-bucket counts, then mean/stddev over
  the trailing ``lookback`` buckets (current bucket EXCLUDED, so a
  spike can't mask itself) and a z-score flag. Aggregation is partial
  (map-side combine) before its single shuffle; the window pass runs
  on the already-tiny per-bucket table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def throttle(df: DataFrame, key_cols: Sequence[str], *,
             period: str = "1 hour", max_count: int = 100,
             ts_col: str = "ts", order_cols: Sequence[str] = (),
             flag_col: str = "throttled",
             tag: str | None = "_throttled") -> DataFrame:
    """Flag (never drop — routing decides) events beyond ``max_count``
    per key per ``period`` bucket.

    ``order_cols`` break ts ties so the "first N survive" choice is
    deterministic under cluster resize; pass a unique id column.
    """
    if max_count < 1:
        raise ValueError(f"max_count must be >= 1, got {max_count}")
    bucket = F.window(F.col(ts_col), period)["start"]
    w = (Window.partitionBy(*[F.col(k) for k in key_cols], bucket)
               .orderBy(F.col(ts_col), *[F.col(c) for c in order_cols]))
    df = df.withColumn(flag_col, F.row_number().over(w) > max_count)
    if tag:
        from logstash_integration_jdbc_spark.operators.lookup import add_tags

        df = add_tags(df, F.col(flag_col), (tag,))
    return df


def count_anomalies(df: DataFrame, key_cols: Sequence[str], *,
                    ts_col: str = "ts", window: str = "1 hour",
                    lookback: int = 24, min_periods: int = 6,
                    z_thresh: float = 3.0) -> DataFrame:
    """Per-(key, time bucket) event counts with a trailing z-score.

    Output: key cols + ``bucket``, ``n``, ``mean_n``, ``sd_n``, ``z``,
    ``is_anomaly``. ``z`` is null until ``min_periods`` PRIOR buckets
    exist. Counts are Poisson-ish, so the divisor is floored at
    ``sqrt(mean)`` (else perfectly steady history → stddev 0 → the one
    spike that matters divides by zero); ``sd_n`` reports the raw
    sample stddev, ``z`` uses the floored divisor.

    Buckets with zero events produce no row and therefore don't enter
    the trailing statistics — run a gap-fill upstream if silence should
    count as 0 (at 100 TB that's usually wrong: most (key, hour) cells
    are empty and materializing them explodes the table).
    """
    if lookback < 1:
        raise ValueError(f"lookback must be >= 1, got {lookback}")
    keys = [F.col(k) for k in key_cols]
    counts = (df.groupBy(*keys, F.window(F.col(ts_col), window)["start"].alias("bucket"))
                .agg(F.count(F.lit(1)).alias("n")))
    w = (Window.partitionBy(*[F.col(k) for k in key_cols])
               .orderBy(F.col("bucket"))
               .rowsBetween(-lookback, -1))
    prior_n = F.count(F.lit(1)).over(w)
    mean_n = F.avg("n").over(w)
    sd_n = F.stddev_samp("n").over(w)
    sd_eff = F.greatest(sd_n, F.sqrt(mean_n))
    z = F.when((prior_n >= min_periods) & (sd_eff > 0),
               (F.col("n") - mean_n) / sd_eff)
    return (counts
            .withColumn("mean_n", F.when(prior_n >= min_periods, mean_n))
            .withColumn("sd_n", F.when(prior_n >= min_periods, sd_n))
            .withColumn("z", z)
            .withColumn("is_anomaly", F.coalesce(F.abs(F.col("z")) > z_thresh,
                                                 F.lit(False))))
