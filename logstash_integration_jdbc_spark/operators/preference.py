"""Preference-pair assembly — the RLHF/DPO data-prep step: from a set
of scored candidates per group (responses per prompt, documents per
query), emit one (chosen, rejected) pair per group — the
highest-scoring candidate against the lowest — for preference-tuning a
model.

Spark-first shape: ONE aggregate over the group key (a single
exchange), with chosen/rejected picked by ``max``/``min`` over a
comparison struct whose lexicographic order encodes the tie-break, so
the pair is deterministic and engine-replayable:

- chosen: highest score, ties → LOWEST id (``max`` over
  ``struct(score, -id, …)``)
- rejected: lowest score, ties → LOWEST id (``min`` over
  ``struct(score, id, …)``)

Groups whose best-minus-worst score gap is ≤ ``margin`` are dropped —
no learnable preference signal (and single-candidate groups fall out
the same way: chosen == rejected ⇒ gap 0).

At 100 TB this is the right plan: no window (the two argmax aggregates
fuse into one partial+final hash aggregate with map-side combine), no
per-group row explosion, payload columns ride inside the comparison
structs so the shuffle carries each group's rows once.

The top-k-vs-bottom-k generalization (k pairs per group) is a
``row_number`` window over the same exchange; this module ships the
1-pair form because that is what DPO training consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def preference_pairs(df: DataFrame, group_col: str, id_col: str,
                     score_col: str, payload_cols: tuple[str, ...] = (),
                     margin: float = 0.0) -> DataFrame:
    """One (chosen, rejected) pair per group, deterministic tie-breaks.

    Output columns: ``group_col``, ``chosen_id``, ``rejected_id``,
    ``chosen_score``, ``rejected_score``, ``score_gap``, plus
    ``chosen_<c>`` / ``rejected_<c>`` for every payload column.
    """
    if margin < 0:
        raise ValueError(f"margin must be >= 0, got {margin}")
    payload = [F.col(c).alias(c) for c in payload_cols]
    best = F.max(F.struct(
        F.col(score_col).alias("s"), (-F.col(id_col)).alias("nid"),
        F.col(id_col).alias("id"), *payload)).alias("_c")
    worst = F.min(F.struct(
        F.col(score_col).alias("s"), F.col(id_col).alias("id"),
        *payload)).alias("_r")
    agg = df.where(F.col(score_col).isNotNull()).groupBy(group_col).agg(
        best, worst)
    out = agg.select(
        group_col,
        F.col("_c.id").alias("chosen_id"),
        F.col("_r.id").alias("rejected_id"),
        F.col("_c.s").alias("chosen_score"),
        F.col("_r.s").alias("rejected_score"),
        (F.col("_c.s") - F.col("_r.s")).alias("score_gap"),
        *[F.col(f"_c.{c}").alias(f"chosen_{c}") for c in payload_cols],
        *[F.col(f"_r.{c}").alias(f"rejected_{c}") for c in payload_cols],
    )
    return out.where(F.col("score_gap") > margin)
