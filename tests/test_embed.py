"""Hashed random-projection text embeddings."""

import pytest


def test_embed_matches_python_xxh64_twin(spark):
    from logstash_integration_jdbc_spark.functions.xxhash import xxh64
    from logstash_integration_jdbc_spark.operators.embed import embed_text

    rows = [(1, "alpha beta beta gamma"), (2, ""), (3, "alpha")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["emb"]
           for r in embed_text(df, out_col="emb").collect()}

    def twin(text):
        toks = text.strip().lower().split() if text.strip() else []
        v = [0.0] * 64
        for t in toks:
            h = xxh64(t.encode("utf-8"))
            for j in range(64):
                v[j] += 1.0 if (h >> j) & 1 else -1.0
        return v

    for did, text in rows:
        assert got[did] == twin(text), did
    # empty text → zero vector, not null
    assert got[2] == [0.0] * 64


def test_embed_similar_docs_high_cosine(spark):
    import numpy as np

    from logstash_integration_jdbc_spark.operators.embed import embed_text

    rows = [
        (1, "spark shuffle join partition broadcast executor stage task"),
        (2, "spark shuffle join partition broadcast executor stage driver"),
        (3, "violet meadow chirp umbrella xylophone quark dune ember"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    e = {r["doc_id"]: np.array(r["embedding"])
         for r in embed_text(df).collect()}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert cos(e[1], e[2]) > 0.7
    assert abs(cos(e[1], e[3])) < 0.5


def test_embed_dim_validation_and_truncation(spark):
    from logstash_integration_jdbc_spark.operators.embed import embed_text

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert len(embed_text(df, dim=16).collect()[0]["embedding"]) == 16
    with pytest.raises(ValueError, match="dim"):
        embed_text(df, dim=65)


def test_embed_composes_with_semantic_dedup(spark):
    from logstash_integration_jdbc_spark.operators.dedup import semantic_dedup
    from logstash_integration_jdbc_spark.operators.embed import embed_text

    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river"),
        (2, "the quick brown fox jumps over the lazy dog near the creek"),
        (3, "completely unrelated legal boilerplate about cookie consent"),
    ]
    df = spark.createDataFrame(rows, "vec_id long, text string")
    emb = embed_text(df)
    kept = {r["vec_id"]
            for r in semantic_dedup(emb, n_clusters=1, threshold=0.9).collect()}
    assert kept == {1, 3}
