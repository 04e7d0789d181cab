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


def elapsed(df: DataFrame, start_cond, end_cond, id_col: str, *,
            ts_col: str = "ts", timeout: str | None = None) -> DataFrame:
    """Start/end event pairing — the logstash ``elapsed`` filter.

    The filter caches a "start" event per unique id and, when the
    matching "end" arrives, emits the elapsed seconds; a start whose
    end never arrives within ``timeout`` is reported expired. Batch
    form: ONE groupBy on the id with conditional min/max aggregates
    (no join, no second shuffle — both sides reduce in the same
    partial aggregation):

    Output: id_col, ``start_ts`` (earliest start), ``end_ts``
    (earliest end AT OR AFTER that start — an end preceding every
    start doesn't match, same as the filter ignoring an end with no
    cached start), ``elapsed_s``, and ``status`` ∈ matched /
    start_only / end_only — start_only becomes ``expired`` when
    ``timeout`` is given and the batch's max timestamp is more than
    the timeout past the start.
    """
    ts = F.col(ts_col)
    # the earliest-start each end compares against comes from an
    # unordered window over the SAME id partitioning the groupBy uses,
    # so Catalyst plans one exchange for both passes
    w = Window.partitionBy(F.col(id_col))
    src = df
    df = df.withColumn("_start_ts", F.min(F.when(start_cond, ts)).over(w))
    agg = df.groupBy(F.col(id_col)).agg(
        F.min("_start_ts").alias("start_ts"),
        F.min(F.when(end_cond & (ts >= F.col("_start_ts")), ts)).alias("_end_after"),
        F.min(F.when(end_cond, ts)).alias("_end_any"))
    end_ts = F.coalesce(F.col("_end_after"),
                        F.when(F.col("start_ts").isNull(), F.col("_end_any")))
    agg = agg.withColumn("end_ts", end_ts)
    status = (F.when(F.col("start_ts").isNull() & F.col("end_ts").isNull(),
                     F.lit(None).cast("string"))
               .when(F.col("start_ts").isNull(), F.lit("end_only"))
               .when(F.col("end_ts").isNull(), F.lit("start_only"))
               .otherwise(F.lit("matched")))
    if timeout is not None:
        # expiry is relative to batch progress: the batch-wide max ts is
        # one scalar, broadcast onto every group (never a global window,
        # which would funnel all rows through one partition)
        batch_max = src.groupBy().agg(F.max(ts).alias("_batch_max"))
        agg = agg.crossJoin(F.broadcast(batch_max))
        expired = (F.col("start_ts").isNotNull() & F.col("end_ts").isNull()
                   & (F.col("_batch_max")
                      > F.col("start_ts") + F.expr(f"INTERVAL {timeout}")))
        status = F.when(expired, F.lit("expired")).otherwise(status)
    out = (agg.withColumn("status", status)
              .filter(F.col("status").isNotNull())
              .withColumn(
                  "elapsed_s",
                  # cast handles TIMESTAMP_NTZ sources: both endpoints
                  # shift identically, so the difference is exact
                  F.when(F.col("start_ts").isNotNull(),
                         (F.unix_micros(F.col("end_ts").cast("timestamp"))
                          - F.unix_micros(F.col("start_ts").cast("timestamp")))
                         / 1_000_000.0)))
    return out.select(id_col, "start_ts", "end_ts", "elapsed_s", "status")
