"""Trainable text classification for corpus curation.

Not in the reference (no ML there); a first-class LLM-pipeline
component: the standard cheap quality/domain classifier used to filter
web corpora (the CCNet / GPT-3 / LLaMA "quality classifier" role) is a
linear bag-of-words model — here a multinomial Naive Bayes scored as a
per-token log-likelihood-ratio sum, which trains in ONE aggregation
pass and scores with one broadcast join. Everything is Catalyst
expressions; no Python in either path.

Scale design:
- train: one map-side explode + ONE groupBy(token) exchange carrying
  (token, 1/0) partial counts; the totals fold in as a crossJoin of a
  one-row aggregate, so the whole model is a single lazy plan;
- score: the model (vocab-sized — millions of rows at most, and
  boundable with ``min_count``) broadcasts to the token stream; the
  only corpus-sized exchange is the per-doc sum, keyed on the doc id;
- determinism: counts are exact integers, the LLR is a pure expression
  of them — independent of partitioning and cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_expr


def train_nb_llr(df: DataFrame, label_col: str, text_col: str = "text",
                 alpha: float = 1.0, min_count: int = 1) -> DataFrame:
    """Train the token log-likelihood-ratio table of a multinomial
    Naive Bayes classifier.

    ``label_col`` must be boolean (True = positive/quality class).
    Returns (token, llr) where
    ``llr = ln((c1+a)/(N1+a*V)) - ln((c0+a)/(N0+a*V))`` with c1/c0 the
    token's occurrence counts in each class, N1/N0 the class totals,
    V the vocabulary size, and ``alpha`` the Laplace smoothing.
    ``min_count`` drops tokens rarer than the floor AFTER the totals
    are taken (bounds the broadcast at scale without biasing the
    smoothing denominators).
    """
    y = F.col(label_col).cast("boolean")
    toks = df.select(
        y.alias("__y"), F.explode(tokens_expr(F.col(text_col))).alias("token"))
    counts = (
        toks.groupBy("token")
        .agg(
            F.sum(F.when(F.col("__y"), 1).otherwise(0)).alias("__c1"),
            F.sum(F.when(F.col("__y"), 0).otherwise(1)).alias("__c0"),
        )
    )
    totals = counts.agg(
        F.sum("__c1").alias("__n1"), F.sum("__c0").alias("__n0"),
        F.count(F.lit(1)).alias("__v"))
    a = F.lit(float(alpha))
    llr = (
        F.log((F.col("__c1") + a) / (F.col("__n1") + a * F.col("__v")))
        - F.log((F.col("__c0") + a) / (F.col("__n0") + a * F.col("__v")))
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .where((F.col("__c1") + F.col("__c0")) >= min_count)
        .select("token", llr.alias("llr"))
    )


def nb_prior_llr(df: DataFrame, label_col: str) -> DataFrame:
    """One-row prior log-odds ``ln(n_pos/n_neg)`` (Laplace +1 so a
    single-class corpus stays finite)."""
    y = F.col(label_col).cast("boolean")
    return df.agg(
        F.log(
            (F.sum(F.when(y, 1).otherwise(0)) + F.lit(1.0))
            / (F.sum(F.when(y, 0).otherwise(1)) + F.lit(1.0))
        ).alias("prior_llr"))


def nb_score(df: DataFrame, llr: DataFrame, prior: DataFrame,
             id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Score documents with a trained model: ``nb_score = prior +
    sum(llr of each token occurrence)`` (unseen tokens contribute 0),
    ``nb_pred = nb_score > 0``.

    The model side broadcasts; the corpus shuffles once on ``id_col``
    for the per-doc sum, then semi-joins back so all original columns
    survive.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens_expr(F.col(text_col))).alias("token"))
    per_doc = (
        toks.join(F.broadcast(llr), "token", "left")
        .groupBy(id_col)
        .agg(F.sum(F.coalesce("llr", F.lit(0.0))).alias("__s"))
    )
    return (
        df.join(per_doc, [id_col], "left")
        .crossJoin(F.broadcast(prior))
        .withColumn(
            "nb_score",
            F.col("prior_llr") + F.coalesce(F.col("__s"), F.lit(0.0)))
        .withColumn("nb_pred", F.col("nb_score") > 0)
        .drop("__s", "prior_llr")
    )


def train_and_score(df: DataFrame, label_col: str, id_col: str = "doc_id",
                    text_col: str = "text", alpha: float = 1.0,
                    min_count: int = 1) -> DataFrame:
    """Self-train convenience: fit on ``df``'s labels, score ``df``."""
    llr = train_nb_llr(df, label_col, text_col, alpha, min_count)
    prior = nb_prior_llr(df, label_col)
    return nb_score(df, llr, prior, id_col, text_col)
