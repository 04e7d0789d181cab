"""Event-shaping filters: split, clone, drop.

The last of the everyday logstash event filters (public
logstash-filter-{split,clone,drop} semantics), each a one-line
Catalyst mapping — kept as named operators so a migrating config has
a 1:1 target:

- ``split``: one event per element of an array field (the filter's
  field/target options) → ``explode``; map-only.
- ``clone``: duplicate each event once per clone label, the label in
  ``type`` and added to tags (the filter's ``clones`` list) →
  explode over a literal array; map-only (NOT a self-union, which
  would scan the source N times).
- ``drop``: remove matching events, optionally only a deterministic
  percentage of them (the filter's ``percentage`` option — hash-based
  here, so a rerun drops the SAME rows; the filter's rand() would not
  survive a retry).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_events(df: DataFrame, field: str, target: str | None = None,
                 keep_position: bool = False) -> DataFrame:
    """One output row per element of ``field`` (array column). Rows
    with null/empty arrays are dropped, matching the filter. With
    ``keep_position`` the element ordinal lands in ``<target>_pos``."""
    tgt = target or field
    if keep_position:
        df = df.select("*", F.posexplode(F.col(field)).alias(f"{tgt}_pos", "_elt"))
    else:
        df = df.select("*", F.explode(F.col(field)).alias("_elt"))
    if tgt == field:
        df = df.drop(field)
    return df.withColumnRenamed("_elt", tgt)


def clone_events(df: DataFrame, clones: Sequence[str],
                 keep_original: bool = True,
                 type_col: str = "type") -> DataFrame:
    """Original (type null) plus one copy per clone label, the label in
    ``type_col`` and appended to tags — a single explode over a literal
    array, so the source is scanned ONCE however many clones exist."""
    if not clones:
        raise ValueError("clone_events needs at least one clone label")
    labels = [F.lit(None).cast("string")] if keep_original else []
    labels += [F.lit(c) for c in clones]
    df = df.withColumn(type_col, F.explode(F.array(*labels)))
    from logstash_integration_jdbc_spark.operators.lookup import TAGS_COL, _ensure_tags

    df = _ensure_tags(df)
    tagged = F.array_union(
        F.coalesce(F.col(TAGS_COL), F.array().cast("array<string>")),
        F.array(F.col(type_col)))
    return df.withColumn(
        TAGS_COL,
        F.when(F.col(type_col).isNotNull(), tagged).otherwise(F.col(TAGS_COL)))


def drop_events(df: DataFrame, cond: Column, percentage: float = 100.0,
                id_col: str | None = None) -> DataFrame:
    """Remove rows where ``cond`` holds; ``percentage < 100`` keeps a
    deterministic hash-based complement (requires ``id_col``), so
    reruns and retried tasks drop the SAME rows."""
    if percentage >= 100.0:
        return df.filter(~cond | cond.isNull())
    if id_col is None:
        raise ValueError("percentage < 100 needs id_col for deterministic "
                         "row selection")
    bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(10_000))
    selected = cond & (bucket < int(percentage * 100))
    return df.filter(~selected | selected.isNull())
