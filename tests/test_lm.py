"""Bigram-LM perplexity scoring — checked against a pure-Python replay
of the add-alpha model on a hand-checkable corpus."""

from __future__ import annotations

import math

import pytest

from logstash_integration_jdbc_spark.operators.lm import (
    bigram_model,
    doc_bigrams,
    perplexity,
    perplexity_filter,
)

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ran"),
    (2, "dogs bark"),
    (3, "single"),
    (4, ""),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id bigint, text string")


def _py_model(corpus):
    toks = {d: t.lower().split() for d, t in corpus}
    bg: dict[tuple[str, str], int] = {}
    ctx: dict[str, int] = {}
    vocab = set()
    for ts in toks.values():
        vocab.update(ts)
        for a, b in zip(ts, ts[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    return toks, bg, ctx, len(vocab)


def test_doc_bigrams(docs):
    rows = {(r.doc_id, r.w1, r.w2) for r in doc_bigrams(docs).collect()}
    assert (0, "the", "cat") in rows and (0, "on", "the") in rows
    assert (1, "cat", "ran") in rows
    assert not any(d in (3, 4) for d, _, _ in rows)
    assert len(rows) == 5 + 2 + 1  # doc0 five, doc1 two, doc2 one


def test_bigram_model_counts(docs):
    bc, cc, v = bigram_model(docs)
    _, bg, ctx, vs = _py_model(CORPUS)
    assert {(r.w1, r.w2): r.n_bg for r in bc.collect()} == bg
    assert {r.w1: r.n_ctx for r in cc.collect()} == ctx
    assert v.first().vocab_size == vs


def test_perplexity_matches_python_replay(docs):
    alpha = 0.5
    got = {r.doc_id: r for r in perplexity(docs, alpha=alpha).collect()}
    toks, bg, ctx, vs = _py_model(CORPUS)
    for d, ts in toks.items():
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            assert got[d].ppl is None and got[d].n_bigrams == 0
            continue
        nll = sum(
            -math.log((bg[(a, b)] + alpha) / (ctx[a] + alpha * vs))
            for a, b in pairs) / len(pairs)
        assert got[d].n_bigrams == len(pairs)
        assert got[d].ppl == pytest.approx(round(math.exp(nll), 6), abs=1e-6)
    assert set(got) == set(toks)


def test_repeated_bigrams_score_lower(spark):
    # a doc made of the corpus's most frequent bigram must sit below a
    # doc of unseen-combination words under the same model
    fit = spark.createDataFrame(
        [(i, "a b a b a b") for i in range(10)] + [(10, "x y z w q r")],
        "doc_id bigint, text string")
    score = spark.createDataFrame(
        [(100, "a b a b"), (101, "q z w x")], "doc_id bigint, text string")
    rows = {r.doc_id: r.ppl for r in perplexity(score, fit_df=fit).collect()}
    assert rows[100] < rows[101]


def test_perplexity_filter_keeps_low_band(docs):
    scores = {r.doc_id: r.ppl for r in perplexity(docs).collect()
              if r.ppl is not None}
    cut = sorted(scores.values())[1]  # keep the two best-scoring docs
    kept = perplexity_filter(docs, max_ppl=cut).collect()
    assert {r.doc_id for r in kept} == {
        d for d, p in scores.items() if p <= cut}
    assert all(r.ppl is not None for r in kept)
    # keep_short retains the no-bigram docs too
    kept2 = perplexity_filter(docs, max_ppl=cut, keep_short=True).collect()
    assert {r.doc_id for r in kept2} == (
        {d for d, p in scores.items() if p <= cut} | {3, 4})
