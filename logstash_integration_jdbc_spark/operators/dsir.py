"""DSIR: Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) — select raw-corpus documents that look like a
target corpus, by importance weights over hashed n-gram features.

The published method: featurize every document as a bag of hashed
unigrams+bigrams in ``n_buckets`` buckets, fit bag-of-words
distributions ``p`` (target) and ``q`` (raw), weight each raw doc by
``log w(x) = Σ_b c_b(x)·(log p_b − log q_b)``, then Gumbel-top-k
resample ∝ w. This is the standard pretraining-corpus targeting step
(used for domain selection in the paper and its descendants).

Spark-first plan (no Python in the row path):

- featurize: token xxhash64 array (shared ``functions.xxhash.token_hashes``
  staging), bigram hash = ``xxhash64(h_i, h_{i+1})`` via ``zip_with``
  over the MATERIALIZED token-hash column, bucket = ``pmod(h, B)``,
  one ``explode`` — map-only.
- fit: ``groupBy(bucket).count`` — partial aggregation map-side, ONE
  exchange bounded by B rows out, add-α smoothing over all B buckets
  closed-form (absent buckets contribute the α floor analytically —
  never materialized).
- score: the two B-row distributions collapse into ONE log-ratio table
  (B rows, broadcast), raw features join it map-side, one
  ``groupBy(doc)`` exchange sums the ratios.
- select: deterministic Gumbel-top-k — noise from ``xxhash64(id, seed)``
  so reruns/retries pick the SAME sample; top-k via sort+limit
  (TakeOrdered — never a full global sort materialization).

At 100 TB: everything shuffles ids/buckets/counts (never text); the
only broadcast is B rows (≤ a few hundred thousand); both corpus scans
are single-pass.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logstash_integration_jdbc_spark.operators.dedup import token_hashes


def hashed_ngram_features(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          n_buckets: int = 10_000,
                          bigrams: bool = True) -> DataFrame:
    """One row per feature occurrence: (id, __bucket). Unigram bucket =
    ``pmod(xxhash64(token), B)``; bigram bucket hashes the two adjacent
    token hashes (hash-of-hashes, the staged form the dedup operators
    share). The token-hash array is materialized in its own select —
    inlining it into the higher-order exprs re-evaluates the whole
    array per element (the measured O(n²) trap, see gram_hashes)."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    src = df.select(
        F.col(id_col),
        token_hashes(F.coalesce(F.col(text_col), F.lit(""))).alias("__th"))
    feats = F.transform(F.col("__th"), lambda t: F.pmod(t, F.lit(n_buckets)))
    if bigrams:
        n = F.size("__th")
        bi = F.zip_with(
            F.slice(F.col("__th"), 1, F.greatest(n - 1, F.lit(0))),
            F.slice(F.col("__th"), 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.pmod(F.xxhash64(a, b), F.lit(n_buckets)))
        feats = F.concat(feats, bi)
    return (src.select(F.col(id_col), F.explode(feats).alias("__bucket"))
               .filter(F.col("__bucket").isNotNull()))


def _bucket_counts(feats: DataFrame) -> DataFrame:
    """(bucket, count) — partial aggregation map-side, ONE exchange,
    output bounded by the observed-bucket count ≤ B."""
    return feats.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__c"))


def dsir_weights(raw_df: DataFrame, target_df: DataFrame,
                 id_col: str = "doc_id", text_col: str = "text",
                 n_buckets: int = 10_000, alpha: float = 1.0,
                 bigrams: bool = True) -> DataFrame:
    """Per-raw-document importance log-weight
    ``Σ_b c_b(x)·(log p_b − log q_b)`` plus ``n_feats``.

    The smoothed totals ``N_p + αB`` / ``N_q + αB`` are two scalars
    (collected from 1-row aggregates — driver-side scalars, not data);
    observed-bucket log-ratios live in ONE broadcast table, and buckets
    unseen in BOTH corpora contribute ``log(α/T_p) − log(α/T_q)`` —
    folded in analytically via a per-doc count of unmatched features,
    so the B-row table never densifies."""
    raw_f = hashed_ngram_features(raw_df, id_col, text_col, n_buckets,
                                  bigrams)
    tgt_f = hashed_ngram_features(target_df, id_col, text_col, n_buckets,
                                  bigrams)
    p = _bucket_counts(tgt_f)
    q = _bucket_counts(raw_f)
    n_p = p.agg(F.sum("__c")).collect()[0][0] or 0
    n_q = q.agg(F.sum("__c")).collect()[0][0] or 0
    t_p = n_p + alpha * n_buckets
    t_q = n_q + alpha * n_buckets
    floor = math.log(alpha / t_p) - math.log(alpha / t_q)
    ratio = (
        p.alias("p").join(q.alias("q"), "__bucket", "full")
        .select(
            "__bucket",
            (F.log((F.coalesce(F.col("p.__c"), F.lit(0)) + alpha) / t_p)
             - F.log((F.coalesce(F.col("q.__c"), F.lit(0)) + alpha) / t_q)
             ).alias("__lr"))
    )
    return (
        raw_f.join(F.broadcast(ratio), "__bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            (F.sum(F.coalesce(F.col("__lr"), F.lit(floor)))).alias("log_w"))
    )


def dsir_select(raw_df: DataFrame, target_df: DataFrame, k: int,
                id_col: str = "doc_id", text_col: str = "text",
                n_buckets: int = 10_000, alpha: float = 1.0,
                bigrams: bool = True, seed: int = 42,
                gumbel: bool = True) -> DataFrame:
    """Top-k raw docs by Gumbel-perturbed importance weight — the
    paper's importance RESAMPLING (k draws without replacement ∝ w),
    made deterministic: gumbel noise ``−ln(−ln(u))`` with
    ``u = (pmod(xxhash64(id, seed), M)+0.5)/M`` — same input, same
    sample, across runs/retries/engines. ``gumbel=False`` degrades to
    plain top-k by weight (the paper's "top-k heuristic" baseline)."""
    w = dsir_weights(raw_df, target_df, id_col, text_col, n_buckets,
                     alpha, bigrams)
    score: Column = F.col("log_w")
    if gumbel:
        m = 1 << 24
        u = (F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(m))
             + 0.5) / m
        score = score + (-F.log(-F.log(u)))
    return (w.withColumn("__score", score)
             .orderBy(F.col("__score").desc(), F.col(id_col))
             .limit(k)
             .drop("__score"))
