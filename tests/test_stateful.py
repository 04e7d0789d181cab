"""applyInPandasWithState conversation tracker: state survives across
availableNow invocations (per-conversation cursor resume)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from logstash_integration_jdbc_spark.streaming.stateful import run_conversation_tracker


def latest_states(spark, out):
    batches = sorted(glob.glob(f"{out}/batch=*"))
    df = spark.read.parquet(batches[-1])
    return {r.conv_id: r for r in df.collect()}


def test_state_accumulates_across_runs(spark, fixture_dir, tmp_path):
    src = str(tmp_path / "src")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    full = spark.read.parquet(f"{fixture_dir}/transcripts.parquet")
    first = full.filter(F.col("turn_idx") % 2 == 0)
    second = full.filter(F.col("turn_idx") % 2 != 0)

    first.write.mode("overwrite").parquet(src)
    run_conversation_tracker(spark, src, out, ckpt)
    s1 = latest_states(spark, out)

    second.write.mode("append").parquet(src)
    run_conversation_tracker(spark, src, out, ckpt)
    s2 = latest_states(spark, out)

    # pick a conversation present in both halves: totals must accumulate
    both = (
        full.groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.max("turn_idx").alias("mti"),
            F.max("ts").alias("mts"),
        ).collect()
    )
    updated = 0
    for r in both:
        if r.conv_id in s1 and r.conv_id in s2:
            st = s2[r.conv_id]
            assert st.n_turns == r.n, f"{r.conv_id}: {st.n_turns} != {r.n}"
            assert st.max_turn_idx == r.mti
            assert st.max_ts == r.mts
            updated += 1
    assert updated > 10  # many conversations spanned both batches
