"""Rate meters: the logstash-filter-metrics semantics, batch-exact.

The metrics filter counts named events and emits 1m/5m/15m EWMA rates
on a flush interval. In a batch/replay engine the decaying EWMA is an
approximation artifact of one-pass streaming; over a full table the
EXACT trailing rate is computable directly, so this operator emits
flush-bucket rows with exact trailing rates per window — strictly more
informative, and SQL-replayable for oracles. (For live streams the
structured-streaming path in ``streaming/`` covers windowed counts.)

Plan: one ``groupBy(key, bucket)`` exchange (partial-aggregated
map-side), then ONE window pass ordered by bucket per key with
``rangeBetween`` trailing frames — the frames share a single sort. No
per-event state, no Python; key cardinality bounds the window
partitions, bucket count bounds rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def meter_rates(df: DataFrame, ts_col: str, key_cols: Sequence[str],
                flush_interval: int = 60,
                windows: Sequence[int] = (60, 300, 900),
                count_col: str = "count") -> DataFrame:
    """Per (key, flush bucket): event count + exact trailing rates
    (events/sec) over each window.

    ``windows`` are seconds and must be multiples of ``flush_interval``
    (the filter's meters quantize the same way). Rate over window W at
    bucket t = events in (t−W, t] / W — the exact value the EWMA
    estimates. Empty buckets are absent (not zero rows): materializing
    silent (key, bucket) cells at 100 TB is the wrong trade, and the
    range frame handles gaps correctly because it is TIME-based, not
    row-based.
    """
    if flush_interval <= 0:
        raise ValueError("flush_interval must be positive seconds")
    for w in windows:
        if w % flush_interval:
            raise ValueError(f"window {w}s is not a multiple of the "
                             f"{flush_interval}s flush interval")
    bucket = (F.floor(F.unix_timestamp(F.col(ts_col)) / flush_interval)
              * flush_interval).alias("bucket_ts")
    counts = (df.groupBy(*[F.col(k) for k in key_cols], bucket)
                .agg(F.count(F.lit(1)).alias(count_col)))
    win = Window.partitionBy(*key_cols).orderBy("bucket_ts")
    out = counts
    for w in windows:
        # (t-W, t]: trailing W seconds ending at this bucket's CLOSE —
        # the bucket at offset exactly -W is excluded
        frame = win.rangeBetween(-(w - flush_interval), 0)
        out = out.withColumn(
            f"rate_{w}s",
            F.round(F.sum(count_col).over(frame) / F.lit(w), 6))
    return out
