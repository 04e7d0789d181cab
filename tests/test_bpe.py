"""BPE tokenizer: classic-textbook merge behavior, an independent
brute-force twin for the incremental trainer, and encode semantics."""

from __future__ import annotations

import pytest

from logstash_integration_jdbc_spark.operators import bpe


# The Sennrich paper's worked example shape: {low, lower, newest, widest}
SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def brute_train(counts, num_merges):
    """Independent O(vocab) re-count-per-round trainer (no incremental
    maintenance) — the oracle for the fast path."""
    vocab = {tuple(w) + (bpe.EOW,): n for w, n in counts if w}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def test_sennrich_first_merges():
    merges = bpe.train_bpe_from_counts(SENNRICH, 4)
    # (e,s)/(s,t)/(t,</w>) all count 9; lexicographic tie-break picks
    # ('e','s') first — the paper's own first merge — then chains
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", "</w>")]
    assert merges[3] == ("l", "o")  # next-highest count (7)


def test_incremental_equals_brute():
    for k in (1, 3, 8, 20):
        assert bpe.train_bpe_from_counts(SENNRICH, k) == brute_train(SENNRICH, k)


def test_incremental_equals_brute_messy():
    counts = [("aaab", 4), ("abab", 3), ("ba", 7), ("a", 2), ("", 9),
              ("zzz", 1), ("az", 1)]
    for k in (2, 5, 15):
        assert bpe.train_bpe_from_counts(counts, k) == brute_train(counts, k)


def test_merge_exhaustion_stops_early():
    merges = bpe.train_bpe_from_counts([("ab", 1)], 100)
    # ab</w> fully merges in 2 steps; no further pairs exist
    assert len(merges) == 2


def test_encode_word_applies_rank_order():
    merges = bpe.train_bpe_from_counts(SENNRICH, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    # training words should round-trip to few symbols
    assert len(bpe.encode_word("newest", ranks)) <= 2
    # unseen word falls back to chars (+ EOW), possibly partially merged
    assert "".join(bpe.encode_word("xyzzy", ranks)) == "xyzzy" + bpe.EOW


def test_encode_text_lossless_concat():
    merges = bpe.train_bpe_from_counts(SENNRICH, 6)
    ranks = {p: i for i, p in enumerate(merges)}
    text = "Lower  newest\tlow"
    toks = bpe.encode_text(text, ranks)
    assert "".join(toks) == "lower" + bpe.EOW + "newest" + bpe.EOW + "low" + bpe.EOW
    assert bpe.encode_text("", ranks) == []
    assert bpe.encode_text(None, ranks) == []


def test_train_and_encode_spark(spark):
    rows = [(i, w) for i, (w, n) in enumerate(
        [(w, n) for w, n in SENNRICH for _ in range(1)])]
    # replicate words by count so Spark counts match the paper table
    data = []
    i = 0
    for w, n in SENNRICH:
        for _ in range(n):
            data.append((i, w)); i += 1
    df = spark.createDataFrame(data, "doc_id int, text string")
    merges = bpe.train_bpe(df, 4)
    assert merges == bpe.train_bpe_from_counts(SENNRICH, 4)

    enc = bpe.bpe_encode(df, merges).orderBy("doc_id").collect()
    ranks = {p: i for i, p in enumerate(merges)}
    for r in enc:
        assert r["bpe_tokens"] == bpe.encode_text(r["text"], ranks)

    counted = bpe.bpe_token_count(df, merges).orderBy("doc_id").collect()
    for r, e in zip(counted, enc):
        assert r["bpe_len"] == len(e["bpe_tokens"])


def test_max_vocab_guard(spark):
    df = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i}") for i in range(50)], "doc_id int, text string")
    with pytest.raises(ValueError, match="max_vocab_rows"):
        bpe.train_bpe(df, 5, max_vocab_rows=10)
    # min_word_count floors the table under the cap (all hapaxes drop)
    assert bpe.train_bpe(df, 5, min_word_count=2, max_vocab_rows=10) == []


def test_merges_round_trip(spark):
    merges = bpe.train_bpe_from_counts(SENNRICH, 5)
    df = bpe.merges_df(spark, merges)
    assert bpe.load_merges(df) == merges


def test_token_count_equals_encode_size(spark):
    # r6: bpe_token_count uses a count-only kernel (no token arrays over
    # Arrow); it must stay exactly size(bpe_encode(...)) per row.
    from pyspark.sql import functions as F

    from logstash_integration_jdbc_spark.operators import bpe

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["low lower lowest", "newer new news", "", None,
             "low low low newer", "a b a b a b"])],
        "doc_id long, text string")
    merges = bpe.train_bpe(docs, 20)
    counted = {r["doc_id"]: r["bpe_len"]
               for r in bpe.bpe_token_count(docs, merges).collect()}
    sized = {r["doc_id"]: r["n"]
             for r in bpe.bpe_encode(docs, merges).select(
                 "doc_id", F.size("bpe_tokens").cast("bigint").alias("n")).collect()}
    # size() of a null-input row is -1 under non-ANSI; the count kernel
    # returns 0 for null text — normalize nulls for the comparison
    sized = {k: max(v, 0) for k, v in sized.items()}
    assert counted == sized
