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
    normalize_text_expr,
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

    ONE corpus scan (vs the naive four-branches-over-shared-lineage
    form, which recomputes redact/quality/langid per branch — a 4×
    scan-cost diagnostic at 100 TB): the stage gates become boolean
    FLAG columns in a single pass, the stage counts conditional sums of
    those flags, and ``n_dedup`` a count-distinct of the normalization
    digest over rows passing both gates (≡ ``exact_dedup_normalized``
    survivor count — one representative per digest group). Catalyst
    plans the mixed distinct/non-distinct aggregate as one scan + the
    digest expand-exchange — the only shuffle, exactly the one the
    dedup stage itself needs."""
    red = redact_pii(df, text_col=text_col)
    flags = lang_id(quality_score(red, text_col="text_redacted"),
                    text_col="text_redacted").select(
        (F.col("quality") >= min_quality).alias("__q_ok"),
        F.col("lang_pred").isin(*languages).alias("__l_ok"),
        F.sha2(normalize_text_expr(F.col("text_redacted")), 256).alias("__h"),
    )
    both = F.col("__q_ok") & F.col("__l_ok")
    return flags.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.count(F.when(F.col("__q_ok"), F.lit(1))).alias("n_quality"),
        F.count(F.when(both, F.lit(1))).alias("n_lang"),
        F.count_distinct(F.when(both, F.col("__h"))).alias("n_dedup"),
    )
