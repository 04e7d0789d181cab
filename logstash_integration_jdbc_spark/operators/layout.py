"""Multi-dimensional write layout: Z-order (Morton) clustering keys.

Parquet data skipping prunes row groups by per-file min/max column
stats, and the stats are only selective for columns the file layout is
sorted on. A lexicographic sort gives that to ONE column; interleaving
the bits of several columns (the Z-order curve — what Delta/Iceberg
``OPTIMIZE ZORDER BY`` computes) bounds the per-file value RANGE of
every participating column at once, so scans filtering on any of them
prune files.

Everything here is exact integer bit arithmetic in Catalyst expressions
— no UDF, map-only, codegen'd — so the key is cheap to compute inline
during a routed write and deterministic under cluster resize.

No counterpart in the reference (its sink is a JDBC table); this is
part of the at-scale write path the engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zorder_key", "zorder_layout"]


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each integer column.

    Bit i of column j lands at position ``i * n_cols + j``, so the key
    alternates one bit from each column — the classic Z-curve. Columns
    beyond the low ``bits`` bits are masked off (callers bucketing
    wider domains should range-rank first); negative values are
    rejected at runtime (masking a sign bit would silently fold
    negatives onto large positives). ``n_cols * bits`` must fit a
    signed 64-bit key.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits < 1 or len(cols) * bits > 63:
        raise ValueError(
            f"{len(cols)} cols x {bits} bits exceeds the 63-bit key budget")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    m = len(cs)
    key = F.lit(0).cast("long")
    for j, c in enumerate(cs):
        guarded = F.when(c < 0, F.raise_error(
            F.concat(F.lit("zorder_key: negative value "), c.cast("string"))
        )).otherwise(c.cast("long"))
        for i in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftrightunsigned(guarded, i).bitwiseAND(F.lit(1)),
                    i * m + j,
                )
            )
    return key


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    n_partitions: int | None = None,
    key_col: str = "__zkey",
) -> DataFrame:
    """Arrange ``df`` for multi-column data skipping: compute the
    Z-order key, range-partition on it (contiguous key ranges per
    output file — range, not hash, or the curve's locality is
    destroyed), and sort within partitions. Writing the result to
    parquet yields files whose min/max stats are tight on EVERY
    participating column; the key column is dropped from the output.

    At 100 TB this is one extra exchange over the un-clustered write —
    the same cost class as any repartitioned sink — paid once at write
    time to make every later selective scan prune.
    """
    keyed = df.withColumn(key_col, zorder_key(cols, bits))
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        keyed.repartitionByRange(n, F.col(key_col))
        .sortWithinPartitions(key_col)
        .drop(key_col)
    )
