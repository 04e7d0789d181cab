from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from logstash_integration_jdbc_spark.operators.compact import (
    compact_df,
    compact_dir,
    estimate_partitions_for_size,
)


def test_estimate_scales_with_target(spark):
    df = spark.range(10_000).withColumn("pad", F.repeat(F.lit("x"), 100))
    n_small = estimate_partitions_for_size(df, target_bytes=64 * 1024,
                                           compression_ratio=1.0)
    n_big = estimate_partitions_for_size(df, target_bytes=1024 * 1024,
                                         compression_ratio=1.0)
    # ~1MB of padded rows → ~17 files at 64KB, ~1 at 1MB
    assert n_small > n_big >= 1
    assert 10 <= n_small <= 30


def test_estimate_empty_and_validation(spark):
    df = spark.range(0)
    assert estimate_partitions_for_size(df) == 1
    with pytest.raises(ValueError, match="target_bytes"):
        estimate_partitions_for_size(df, target_bytes=0)


def test_compact_df_coalesce_no_shuffle(spark):
    df = spark.range(1000).repartition(32)
    out = compact_df(df, target_bytes=64 * 2**20)
    assert out.rdd.getNumPartitions() < 32
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan or "Coalesce" in plan
    # balanced form pays its one exchange
    bal = compact_df(df, target_bytes=64 * 2**20, balanced=True)
    assert "Exchange" in bal._jdf.queryExecution().executedPlan().toString()


def test_compact_dir_reduces_files(spark, tmp_path):
    path = str(tmp_path / "many")
    spark.range(5000).withColumn("pad", F.repeat(F.lit("y"), 50)) \
        .repartition(24).write.parquet(path)
    res = compact_dir(spark, path, target_bytes=32 * 2**20)
    assert res["files_before"] == 24
    assert res["files_after"] < 24
    # data survives the swap intact
    back = spark.read.parquet(path)
    assert back.count() == 5000
    assert back.agg(F.sum("id")).collect()[0][0] == 5000 * 4999 // 2
    # no leftover temp/old dirs
    names = os.listdir(tmp_path)
    assert all(".compact-" not in n and ".old-" not in n for n in names)
