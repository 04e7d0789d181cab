"""Generator determinism: identical data at any parallelism — the
property that makes the same fixture reproducible on 8 cores, 32 cores,
or a 1000-executor cluster."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_integration_jdbc_spark.sources.generator import gen_transcripts


def canon(df):
    return sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts)
        for r in df.collect()
    )


def test_same_rows_at_any_partitioning(spark):
    a = gen_transcripts(spark, n_rows=3000, seed=42, num_partitions=2)
    b = gen_transcripts(spark, n_rows=3000, seed=42, num_partitions=17)
    assert canon(a) == canon(b)


def test_seed_changes_data(spark):
    a = gen_transcripts(spark, n_rows=1000, seed=42)
    b = gen_transcripts(spark, n_rows=1000, seed=43)
    assert canon(a) != canon(b)


def test_keys_unique_and_hot_keys_skewed(spark):
    df = gen_transcripts(spark, n_rows=20000, seed=42)
    assert df.select("conv_id", "turn_idx").distinct().count() == 20000
    counts = {r.conv_id: r.n for r in
              df.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    hot = sum(v for k, v in counts.items() if k.startswith("conv_hot_"))
    cold_max = max(v for k, v in counts.items() if not k.startswith("conv_hot_"))
    assert hot / 20000 > 0.15           # hot keys carry a real share
    assert max(counts.values()) > 10 * cold_max  # and are truly skewed
