"""End-to-end document curation: the canonical composition of the
engine's training-data operators into one declarative pipeline.

Order matters and is the industry-standard one: redact FIRST (quality,
language, and dedup must judge the text that actually ships), then the
cheap map-only gates (quality, language) prune before anything that
shuffles, then normalized exact dedup (one digest shuffle over the
survivors), then the leakage-safe split (map-only). Every stage is an
independently oracle-verified operator; this module only composes them,
so the whole pipeline stays a single lazy Catalyst plan — gates fuse
into one scan pass, and the only exchanges are the dedup digest
group-by and (optionally) the caller's writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logstash_integration_jdbc_spark.operators.dedup import (
    exact_dedup_normalized,
)
from logstash_integration_jdbc_spark.operators.sampling import split_by_hash
from logstash_integration_jdbc_spark.operators.textstats import (
    lang_id,
    quality_score,
    redact_pii,
)

DEFAULT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}


def curate_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    languages: tuple[str, ...] = ("en",),
    fractions: dict[str, float] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Curated corpus: redact → quality ≥ min_quality → language gate →
    normalized exact dedup (min-id survivor) → split assignment.

    Returns the surviving rows with ``text_redacted``, ``quality``,
    ``lang_pred``, and ``split`` columns added (original columns kept).
    """
    red = redact_pii(df, text_col=text_col)
    q = quality_score(red, text_col="text_redacted")
    q = q.filter(F.col("quality") >= min_quality)
    lg = lang_id(q, text_col="text_redacted")
    lg = lg.filter(F.col("lang_pred").isin(*languages))
    dd = exact_dedup_normalized(lg, text_col="text_redacted", id_col=id_col)
    return split_by_hash(dd, F.col(id_col),
                         fractions or DEFAULT_FRACTIONS, seed=seed)


def curation_funnel(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    languages: tuple[str, ...] = ("en",),
) -> DataFrame:
    """One-row funnel report (n_input, n_quality, n_lang, n_dedup) —
    the per-stage survivor counts a curation run should always log.
    Four scalar aggregates over shared lineage, cross-joined into one
    row; cheap relative to the pipeline itself."""
    red = redact_pii(df, text_col=text_col)
    q = quality_score(red, text_col="text_redacted").filter(
        F.col("quality") >= min_quality)
    lg = lang_id(q, text_col="text_redacted").filter(
        F.col("lang_pred").isin(*languages))
    dd = exact_dedup_normalized(lg, text_col="text_redacted", id_col=id_col)
    return (
        red.agg(F.count(F.lit(1)).alias("n_input"))
        .crossJoin(q.agg(F.count(F.lit(1)).alias("n_quality")))
        .crossJoin(lg.agg(F.count(F.lit(1)).alias("n_lang")))
        .crossJoin(dd.agg(F.count(F.lit(1)).alias("n_dedup")))
    )
