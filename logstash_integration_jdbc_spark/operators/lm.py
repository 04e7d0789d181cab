"""Corpus-trained n-gram language-model scoring — the CCNet/KenLM-style
quality filter: score each document's perplexity under an add-alpha
bigram model fit on the corpus itself (or a reference corpus), then
keep the low-perplexity band.

All Catalyst: tokenize/slice/explode for bigram emission (map-side),
one bigram-key aggregation for the model counts, one bigram-key join to
score, one doc-key aggregation to reduce. No Python anywhere.

Scale shape: the model table is vocab²-bounded but Zipf-small in
practice; it is NOT broadcast — scoring joins postings to model on the
bigram key (shuffled hash join, both sides partial-aggregated
map-side). Fitting on a reference corpus instead of the scored corpus
is the same plan with ``fit_df`` ≠ ``score_df``. At 100 TB the
dominant cost is the two bigram-key exchanges, each carrying
(bigram, count) / (doc, bigram) pairs — never raw text.

The reference (a JDBC ingest plugin) has no LM surface; this is the
standard corpus-quality filter a training-data pipeline runs between
ingest and dedup (CCNet: Wenzek et al. 2020 — filter web text by LM
perplexity against a clean reference corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_expr

__all__ = ["doc_bigrams", "bigram_model", "perplexity", "perplexity_filter"]


def doc_bigrams(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, w1, w2) adjacent-token pairs per document (map-only).

    Documents with fewer than two tokens emit no rows.
    """
    toks = tokens_expr(F.col(text_col))
    with_toks = df.select(F.col(id_col), toks.alias("_toks"))
    pairs = F.transform(
        F.slice(F.col("_toks"), 1,
                F.greatest(F.size("_toks") - 1, F.lit(0))),
        lambda x, i: F.struct(
            x.alias("w1"),
            F.element_at(F.col("_toks"), i + F.lit(2)).alias("w2")))
    return (with_toks
            .select(F.col(id_col), F.explode(pairs).alias("_bg"))
            .select(F.col(id_col), F.col("_bg.w1").alias("w1"),
                    F.col("_bg.w2").alias("w2")))


def bigram_model(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> tuple[DataFrame, DataFrame,
                                                  DataFrame]:
    """Fit bigram/context counts + vocab size on a corpus.

    Returns ``(bigram_counts, context_counts, vocab)`` — all lazy:
    (w1, w2, n_bg), (w1, n_ctx), and a one-row (vocab_size).
    ``n_ctx`` counts bigram left-contexts (= sum of ``n_bg`` over w2);
    ``vocab_size`` counts distinct tokens over ALL positions.
    """
    bg = doc_bigrams(df, id_col, text_col)
    bigram_counts = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("n_bg"))
    # n_ctx (bigrams with left-context w1) == Σ_w2 n_bg, so derive it
    # from the bigram table instead of re-tokenizing the corpus: this
    # removes one full scan+tokenize+explode pass AND its corpus-sized
    # exchange — the derivation aggregates the (vocab²-bounded) bigram
    # counts, whose exchange the scoring join reuses (guide §2.4).
    # Values are identical (integer counts, order-independent).
    context_counts = bigram_counts.groupBy("w1").agg(
        F.sum("n_bg").alias("n_ctx"))
    toks = tokens_expr(F.col(text_col))
    vocab = (df.select(F.explode(toks).alias("term"))
             .agg(F.countDistinct("term").alias("vocab_size")))
    return bigram_counts, context_counts, vocab


def perplexity(score_df: DataFrame, fit_df: DataFrame | None = None,
               alpha: float = 0.5, id_col: str = "doc_id",
               text_col: str = "text", round_to: int | None = 6,
               ) -> DataFrame:
    """Per-document bigram perplexity under an add-alpha model.

    ``P(w2|w1) = (C(w1,w2) + α) / (C(w1) + α·V)``;
    ``ppl(doc) = exp(mean(-ln P))`` over the doc's bigrams. Unseen
    bigrams/contexts are handled by the smoothing (the outer join
    coalesces their counts to 0). Documents with < 2 tokens get NULL.

    ``fit_df`` defaults to ``score_df`` (self-scoring); pass a clean
    reference corpus for CCNet-style filtering.
    """
    fit = score_df if fit_df is None else fit_df
    bigram_counts, context_counts, vocab = bigram_model(
        fit, id_col, text_col)
    bg = doc_bigrams(score_df, id_col, text_col)
    p = ((F.coalesce(F.col("n_bg"), F.lit(0)) + alpha)
         / (F.coalesce(F.col("n_ctx"), F.lit(0))
            + alpha * F.col("vocab_size")))
    scored = (bg
              .join(bigram_counts, ["w1", "w2"], "left")
              .join(context_counts, ["w1"], "left")
              .crossJoin(F.broadcast(vocab))
              .groupBy(id_col)
              .agg(F.avg(-F.log(p)).alias("_nll"),
                   F.count(F.lit(1)).alias("n_bigrams")))
    ppl = F.exp(F.col("_nll"))
    if round_to is not None:
        ppl = F.round(ppl, round_to)
    out = scored.select(F.col(id_col), F.col("n_bigrams"),
                        ppl.alias("ppl"))
    # docs with no bigrams (0- or 1-token): re-attach with NULL ppl so
    # the filter can make an explicit keep/drop decision on them
    short = (score_df
             .where(F.size(tokens_expr(F.col(text_col))) < 2)
             .select(F.col(id_col), F.lit(0).cast("bigint").alias("n_bigrams"),
                     F.lit(None).cast("double").alias("ppl")))
    return out.unionByName(short)


def perplexity_filter(score_df: DataFrame, max_ppl: float,
                      fit_df: DataFrame | None = None, alpha: float = 0.5,
                      id_col: str = "doc_id", text_col: str = "text",
                      keep_short: bool = False) -> DataFrame:
    """Keep documents whose bigram perplexity is ≤ ``max_ppl``.

    ``keep_short`` decides NULL-ppl (sub-2-token) documents. Returns
    ``score_df``'s rows + a ``ppl`` column, filtered.
    """
    scores = perplexity(score_df, fit_df, alpha, id_col, text_col)
    joined = score_df.join(
        scores.select(id_col, "ppl"), [id_col], "left")
    cond = F.col("ppl") <= max_ppl
    if keep_short:
        cond = cond | F.col("ppl").isNull()
    return joined.where(cond)
