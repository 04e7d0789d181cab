"""Output file sizing — the small-files problem at 100 TB.

A routed sink that writes one file per (shuffle partition × dynamic
partition) emits millions of KB-scale files at cluster scale; the
downstream scan then pays per-file open/footer costs that dwarf the
read itself. Two tools:

- ``estimate_partitions_for_size``: sample-based in-memory row-size
  estimate → the repartition count that yields ~``target_bytes`` per
  output file (compressed parquet runs ~3-5× smaller than the
  in-memory estimate; the ``compression_ratio`` knob encodes that).
- ``compact_dir``: rewrite an existing parquet directory to
  target-sized files (the maintenance pass table formats call
  "compaction" / "bin-packing rewrite" — e.g. Iceberg's
  rewrite_data_files). Reads, coalesces/repartitions to the computed
  count, writes to a temp sibling, atomically swaps.

Both favor ``coalesce`` (no shuffle — merges existing partitions) when
shrinking and fall back to ``repartition`` only when the caller asks
for balanced output (skewed inputs make coalesced files uneven).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame


def estimate_partitions_for_size(df: DataFrame, target_bytes: int = 128 * 2**20,
                                 sample_rows: int = 10_000,
                                 compression_ratio: float = 4.0) -> int:
    """Partition count so each output file lands near ``target_bytes``.

    Samples ``sample_rows`` rows (one small job), measures their
    serialized in-memory size via the schema's defaultSize plus actual
    string/binary lengths, scales to the full count, divides by the
    compression-adjusted target. Always ≥ 1.
    """
    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1, got {target_bytes}")
    total = df.count()
    if total == 0:
        return 1
    from pyspark.sql import functions as F

    sample = df.limit(sample_rows)
    # per-row byte estimate: fixed-width fields from the schema, plus
    # measured lengths for strings/binaries/arrays (the variable part)
    fixed = 0
    var_cols = []
    for f_ in df.schema.fields:
        t = f_.dataType.typeName()
        if t in ("string", "binary"):
            var_cols.append(F.coalesce(F.octet_length(F.col(f_.name)),
                                       F.lit(0)))
        elif t in ("array", "map", "struct"):
            var_cols.append(F.coalesce(
                F.octet_length(F.to_json(F.col(f_.name))), F.lit(0)))
        else:
            fixed += 8
    size_expr = F.lit(fixed)
    for c in var_cols:
        size_expr = size_expr + c
    row = sample.agg(F.avg(size_expr).alias("avg_bytes"),
                     F.count(F.lit(1)).alias("n")).collect()[0]
    avg = float(row["avg_bytes"] or fixed or 8)
    est_total = avg * total / compression_ratio
    return max(1, round(est_total / target_bytes))


def compact_df(df: DataFrame, target_bytes: int = 128 * 2**20,
               balanced: bool = False, **est_kwargs) -> DataFrame:
    """Return ``df`` re-partitioned for ~``target_bytes`` output files.

    ``balanced=False`` (default): ``coalesce`` — a narrow dependency,
    no shuffle; right when the input partitioning is roughly even.
    ``balanced=True``: round-robin ``repartition`` — pays one exchange
    to equalize skewed partitions.
    """
    n = estimate_partitions_for_size(df, target_bytes, **est_kwargs)
    if balanced:
        return df.repartition(n)
    cur = df.rdd.getNumPartitions()
    return df.coalesce(n) if n < cur else df


def compact_dir(spark, path: str, target_bytes: int = 128 * 2**20,
                balanced: bool = False, **est_kwargs) -> dict:
    """Rewrite a parquet directory to target-sized files; atomic swap.

    Returns {files_before, files_after, partitions}. The rewrite goes
    to a temp sibling on the same filesystem, then the old dir is
    replaced — a reader never sees a half-written directory (same
    recipe as the checkpoint writer's atomic replace).
    """
    def _count_files(p):
        return sum(1 for root, _d, fs in os.walk(p)
                   for f_ in fs if f_.endswith(".parquet"))

    before = _count_files(path)
    df = spark.read.parquet(path)
    out = compact_df(df, target_bytes, balanced=balanced, **est_kwargs)
    n = out.rdd.getNumPartitions()
    tmp = f"{path}.compact-{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)
    old = f"{path}.old-{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except OSError:
        os.rename(old, path)  # roll back; leave tmp for inspection
        raise
    shutil.rmtree(old, ignore_errors=True)
    return {"files_before": before, "files_after": _count_files(path),
            "partitions": n}
