"""Relevance scoring + chunking: TF-IDF, BM25, top terms, token-window
chunks — each checked against a small hand-computable corpus and a
pure-Python replay of the same math."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from logstash_integration_jdbc_spark.operators.relevance import (
    add_rank,
    bm25_topk,
    chunk_documents,
    postings,
    rrf_fuse,
    tf_idf,
    top_terms,
)

CORPUS = [
    (0, "spark join spark window agg"),
    (1, "join window window filter"),
    (2, "scan scan scan scan"),
    (3, "spark"),
    (4, ""),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id bigint, text string")


def _py_tokens(text):
    t = text.strip().lower()
    return t.split() if t else []


def test_postings_tf_and_dl(docs):
    rows = {(r.doc_id, r.term): (r.tf, r.dl) for r in postings(docs).collect()}
    assert rows[(0, "spark")] == (2, 5)
    assert rows[(2, "scan")] == (4, 4)
    assert (4, "") not in rows  # empty doc emits no postings
    assert not any(d == 4 for d, _ in rows)


def test_tf_idf_matches_python_replay(docs):
    got = {(r.doc_id, r.term): r for r in tf_idf(docs).collect()}
    n_docs = len(CORPUS)
    # python replay
    toks = {d: _py_tokens(t) for d, t in CORPUS}
    df_counts: dict[str, int] = {}
    for d, ts in toks.items():
        for term in set(ts):
            df_counts[term] = df_counts.get(term, 0) + 1
    for d, ts in toks.items():
        for term in set(ts):
            tf = ts.count(term)
            idf = math.log((1.0 + n_docs) / (1.0 + df_counts[term])) + 1.0
            r = got[(d, term)]
            assert r.tf == tf and r.df == df_counts[term]
            assert r.weight == pytest.approx(tf * idf, rel=1e-12)
    assert len(got) == sum(len(set(ts)) for ts in toks.values())


def _py_bm25(query, k1=1.2, b=0.75):
    toks = {d: _py_tokens(t) for d, t in CORPUS}
    n = len(CORPUS)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    dfc = {t: sum(1 for ts in toks.values() if t in ts) for t in query}
    scores = {}
    for d, ts in toks.items():
        s = 0.0
        for t in query:
            tf = ts.count(t)
            if not tf:
                continue
            idf = math.log(1.0 + (n - dfc[t] + 0.5) / (dfc[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ts) / avgdl))
        if s:
            scores[d] = s
    return scores


def test_bm25_topk_matches_python_replay(docs):
    got = bm25_topk(docs, ["spark", "window"], k=10).collect()
    exp = _py_bm25(["spark", "window"])
    assert {r.doc_id for r in got} == set(exp)
    for r in got:
        assert r.score == pytest.approx(round(exp[r.doc_id], 6), abs=1e-6)
    # ranking: rounded score desc, doc_id asc
    keys = [(-r.score, r.doc_id) for r in got]
    assert keys == sorted(keys)


def test_bm25_prunes_to_query_terms(docs):
    # a query term absent from the corpus contributes nothing
    got = bm25_topk(docs, ["scan", "nosuchterm"], k=10).collect()
    assert [r.doc_id for r in got] == [2]


def test_bm25_rejects_empty_query(docs):
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(docs, [])


def test_top_terms_order_and_ties(docs):
    got = [(r.term, r.n) for r in top_terms(docs, k=4).collect()]
    # counts: scan 4, spark 3, window 3, join 2 — spark before window (tie→lex)
    assert got == [("scan", 4), ("spark", 3), ("window", 3), ("join", 2)]


def test_chunk_documents_windows(spark):
    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    rows = sorted(
        chunk_documents(df, chunk_size=4, overlap=2).collect(),
        key=lambda r: r.chunk_idx)
    # starts 0,2,4,6 (last start ≤ n-overlap-1 = 7); windows of 4
    assert [(r.chunk_idx, r.chunk_tokens, r.chunk_text) for r in rows] == [
        (0, 4, "t0 t1 t2 t3"),
        (1, 4, "t2 t3 t4 t5"),
        (2, 4, "t4 t5 t6 t7"),
        (3, 4, "t6 t7 t8 t9"),
    ]


def test_chunk_documents_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    rows = chunk_documents(df, chunk_size=8, overlap=4).collect()
    assert [(r.chunk_idx, r.chunk_tokens, r.chunk_text) for r in rows] == [
        (0, 2, "a b")]


def test_chunk_documents_no_overlap_trailing_partial(spark):
    text = " ".join(f"t{i}" for i in range(7))
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    rows = sorted(chunk_documents(df, chunk_size=3, overlap=0).collect(),
                  key=lambda r: r.chunk_idx)
    assert [(r.chunk_idx, r.chunk_tokens) for r in rows] == [
        (0, 3), (1, 3), (2, 1)]
    assert rows[-1].chunk_text == "t6"


def test_chunk_documents_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="chunk_size"):
        chunk_documents(df, chunk_size=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_size=4, overlap=4)


def test_chunk_coverage_reconstructs_doc(spark):
    # non-overlap portions concatenated == original token stream
    text = " ".join(f"w{i}" for i in range(23))
    df = spark.createDataFrame([(7, text)], "doc_id bigint, text string")
    rows = sorted(chunk_documents(df, chunk_size=6, overlap=2).collect(),
                  key=lambda r: r.chunk_idx)
    step = 4
    rebuilt: list[str] = []
    for r in rows:
        toks = r.chunk_text.split()
        rebuilt.extend(toks if not rebuilt else toks[2:])
    assert rebuilt == text.split()


def test_add_rank_orders_and_breaks_ties(spark):
    df = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.5), (4, 0.1)], "doc_id int, score double")
    got = {r["doc_id"]: r["rank"]
           for r in add_rank(df).collect()}
    assert got == {2: 1, 1: 2, 3: 3, 4: 4}  # tie 0.5 → lower id first


def test_rrf_fuse_math(spark):
    # hand-checkable: doc 7 in both lists beats doc 1 ranked 1st in one
    a = spark.createDataFrame([(7, 2), (1, 1), (3, 3)], "doc_id int, rank int")
    b = spark.createDataFrame([(7, 3), (9, 1), (3, 2)], "doc_id int, rank int")
    rows = rrf_fuse([a, b], k=10, c=60).collect()
    exp = {
        7: 1 / 62 + 1 / 63,
        1: 1 / 61,
        3: 1 / 63 + 1 / 62,
        9: 1 / 61,
    }
    got = {r["doc_id"]: r["rrf_score"] for r in rows}
    for d, s in exp.items():
        assert got[d] == pytest.approx(round(s, 6), abs=1e-9)
    n_lists = {r["doc_id"]: r["n_lists"] for r in rows}
    assert n_lists == {7: 2, 3: 2, 1: 1, 9: 1}
    # ordering: 7 and 3 tie exactly (same reciprocal sum) → id order
    order = [r["doc_id"] for r in rows]
    assert order[:2] == [3, 7] or order[:2] == [7, 3]
    assert set(order[2:]) == {1, 9}


def test_rrf_fuse_k_bound_and_empty(spark):
    a = spark.createDataFrame([(i, i + 1) for i in range(20)],
                              "doc_id int, rank int")
    assert rrf_fuse([a], k=5).count() == 5
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
