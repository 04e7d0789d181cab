"""DSIR importance-resampling tests: python twin parity + behavior."""

from __future__ import annotations

import math

import pytest

from logstash_integration_jdbc_spark.functions.xxhash import (
    spark_ws_tokens,
    spark_xxhash64_longs,
    xxh64_str,
)
from logstash_integration_jdbc_spark.operators.dsir import (
    dsir_select,
    dsir_weights,
    hashed_ngram_features,
)

RAW = [
    (0, "spark shuffle exchange partition spark"),
    (1, "the cat sat on the mat"),
    (2, "spark partition spark partition"),
    (3, "dogs and cats and birds"),
    (4, ""),
]
TGT = [
    (100, "spark partition shuffle"),
    (101, "spark exchange spark"),
]
B = 64
ALPHA = 0.5


def _feats(text: str, n_buckets: int = B) -> list[int]:
    th = [xxh64_str(t) for t in spark_ws_tokens(text)]
    uni = [h % n_buckets for h in th]
    bi = [spark_xxhash64_longs([a, b]) % n_buckets
          for a, b in zip(th, th[1:])]
    return uni + bi


def _twin_weights() -> dict[int, tuple[int, float]]:
    from collections import Counter

    p: Counter = Counter()
    q: Counter = Counter()
    for _, t in TGT:
        p.update(_feats(t))
    raw_feats = {i: _feats(t) for i, t in RAW}
    for fs in raw_feats.values():
        q.update(fs)
    t_p = sum(p.values()) + ALPHA * B
    t_q = sum(q.values()) + ALPHA * B
    out = {}
    for i, fs in raw_feats.items():
        lw = sum(math.log((p[b] + ALPHA) / t_p)
                 - math.log((q[b] + ALPHA) / t_q) for b in fs)
        out[i] = (len(fs), lw)
    return out


def test_weights_match_python_twin(spark):
    raw = spark.createDataFrame(RAW, "doc_id int, text string")
    tgt = spark.createDataFrame(TGT, "doc_id int, text string")
    got = {r["doc_id"]: (r["n_feats"], r["log_w"])
           for r in dsir_weights(raw, tgt, n_buckets=B,
                                 alpha=ALPHA).collect()}
    want = _twin_weights()
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], f"n_feats doc {i}"
        assert got[i][1] == pytest.approx(want[i][1], rel=1e-9), f"doc {i}"


def test_target_like_docs_score_higher(spark):
    raw = spark.createDataFrame(RAW, "doc_id int, text string")
    tgt = spark.createDataFrame(TGT, "doc_id int, text string")
    w = {r["doc_id"]: r["log_w"] / max(r["n_feats"], 1)
         for r in dsir_weights(raw, tgt, n_buckets=B).collect()}
    # spark-vocabulary docs beat the cat/dog docs per-feature
    assert min(w[0], w[2]) > max(w[1], w[3])


def test_feature_counts(spark):
    raw = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    n = hashed_ngram_features(raw, n_buckets=B).count()
    assert n == 3 + 2  # unigrams + bigrams
    n_uni = hashed_ngram_features(raw, n_buckets=B, bigrams=False).count()
    assert n_uni == 3


def test_select_deterministic_topk(spark):
    raw = spark.createDataFrame(RAW, "doc_id int, text string")
    tgt = spark.createDataFrame(TGT, "doc_id int, text string")
    s1 = sorted(r["doc_id"] for r in
                dsir_select(raw, tgt, k=2, n_buckets=B).collect())
    s2 = sorted(r["doc_id"] for r in
                dsir_select(raw, tgt, k=2, n_buckets=B).collect())
    assert s1 == s2 and len(s1) == 2
    # plain top-k (no gumbel) must pick the two highest log_w
    w = {r["doc_id"]: r["log_w"]
         for r in dsir_weights(raw, tgt, n_buckets=B).collect()}
    want = sorted(w, key=lambda i: (-w[i], i))[:2]
    got = sorted(r["doc_id"] for r in
                 dsir_select(raw, tgt, k=2, n_buckets=B,
                             gumbel=False).collect())
    assert got == sorted(want)


def test_bad_buckets_raise(spark):
    raw = spark.createDataFrame(RAW, "doc_id int, text string")
    with pytest.raises(ValueError):
        hashed_ngram_features(raw, n_buckets=1)


# ------------------------------------------------------- temperature mix


def test_temperature_sample_flattens_mix(spark):
    from pyspark.sql import functions as F

    from logstash_integration_jdbc_spark.operators.sampling import (
        hash_uniform,
        temperature_sample,
    )

    rows = [(i, "big" if i < 8000 else "small") for i in range(10_000)]
    df = spark.createDataFrame(rows, "id int, src string")
    out = temperature_sample(df, "src", F.col("id"), tau=2.0)
    got = {r["src"]: r["n"] for r in
           out.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
    # smallest source keeps everything (p=1); big source thins by
    # (8000/2000)^(1/2-1) = 0.5
    assert got["small"] == 2000
    assert got["big"] == pytest.approx(4000, rel=0.05)
    # deterministic: same call, same survivors
    ids1 = sorted(r["id"] for r in out.collect())
    ids2 = sorted(r["id"] for r in
                  temperature_sample(df, "src", F.col("id"), tau=2.0).collect())
    assert ids1 == ids2


def test_temperature_tau1_noop_and_validation(spark):
    from pyspark.sql import functions as F

    from logstash_integration_jdbc_spark.operators.sampling import (
        temperature_sample,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, src string")
    assert temperature_sample(df, "src", F.col("id"), tau=1.0).count() == 2
    with pytest.raises(ValueError):
        temperature_sample(df, "src", F.col("id"), tau=0)
