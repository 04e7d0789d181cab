"""Z-order layout: exact key math + the data-skipping effect it buys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logstash_integration_jdbc_spark.operators.layout import (
    zorder_key,
    zorder_layout,
)


def py_morton(vals: list[int], bits: int) -> int:
    key = 0
    m = len(vals)
    for j, v in enumerate(vals):
        for i in range(bits):
            key |= ((v >> i) & 1) << (i * m + j)
    return key


def test_key_matches_python_twin(spark):
    rows = [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 3, 1024)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {(r.a, r.b): r.z for r in df.withColumn(
        "z", zorder_key(["a", "b"], bits=16)).collect()}
    for a, b in rows:
        assert got[(a, b)] == py_morton([a, b], 16), (a, b)


def test_single_column_key_is_identity_within_mask(spark):
    df = spark.createDataFrame([(7,), (1 << 20,)], "a long")
    got = [r.z for r in df.withColumn(
        "z", zorder_key(["a"], bits=16)).orderBy("a").collect()]
    assert got == [7, 0]  # (1 << 20)'s low 16 bits are zero — masked off


def test_negative_value_raises(spark):
    df = spark.createDataFrame([(-1, 2)], "a long, b long")
    with pytest.raises(Exception, match="negative value"):
        df.withColumn("z", zorder_key(["a", "b"])).collect()


def test_bit_budget_and_empty_cols_raise(spark):
    with pytest.raises(ValueError, match="63-bit"):
        zorder_key(["a", "b", "c", "d"], bits=16)
    with pytest.raises(ValueError, match="at least one column"):
        zorder_key([])


def test_layout_tightens_file_stats_on_both_columns(spark, tmp_path):
    """The point of the curve: after zorder_layout, EVERY file's min/max
    range is a fraction of the domain on BOTH columns; a single-column
    sort leaves the second column's per-file range at ~the full domain."""
    import pyarrow.parquet as pq

    dom = 64
    df = spark.range(dom * dom).select(
        (F.col("id") % dom).alias("a"),
        (F.col("id") / dom).cast("long").alias("b"),
    )

    def file_ranges(path):
        out = []
        ds = pq.ParquetDataset(path)
        for frag in ds.fragments:
            md = frag.metadata
            lo = {c: None for c in ("a", "b")}
            hi = {c: None for c in ("a", "b")}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    st = col.statistics
                    lo[name] = st.min if lo[name] is None else min(lo[name], st.min)
                    hi[name] = st.max if hi[name] is None else max(hi[name], st.max)
            out.append({c: hi[c] - lo[c] for c in ("a", "b")})
        return out

    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    zorder_layout(df, ["a", "b"], bits=6, n_partitions=16).write.parquet(zdir)
    (df.repartitionByRange(16, "a").sortWithinPartitions("a")
       .write.parquet(sdir))

    zr, sr = file_ranges(zdir), file_ranges(sdir)
    # z-layout: both columns' per-file ranges average well under the domain
    za = sum(r["a"] for r in zr) / len(zr)
    zb = sum(r["b"] for r in zr) / len(zr)
    assert za <= dom / 2 and zb <= dom / 2, (za, zb)
    # single-column sort: 'b' is unclustered — per-file range ~ the domain
    sb = sum(r["b"] for r in sr) / len(sr)
    assert sb > dom * 0.8, sb
    assert zb < sb / 2
