"""Dictionary translation: the logstash-filter-translate semantics.

The translate filter maps a field's value through a dictionary
(inline YAML/CSV or a dictionary file) with exact or regex matching
and an optional fallback. Three Spark-first forms, chosen by
dictionary size — all keep the row path JVM-side:

- ``translate_field``: inline dict → one ``element_at(create_map(...))``
  projection (codegen; the dict rides the plan as literals). Right for
  the filter's common use — O(100) entries.
- ``translate_regex``: ordered regex dict → a first-match CASE chain of
  ``rlike`` (the filter's ``regex => true``); entry order is match
  priority, exactly the filter's iteration order.
- ``translate_with_table``: dictionary as a DataFrame → broadcast left
  join (the 100 TB path for big dictionaries; ≡ jdbc_static with a
  1-column value payload, reference jdbc_static docs lookup semantics).

``override=False`` (the filter's default for an existing destination)
keeps a pre-existing non-null destination column value.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _apply_dest(df: DataFrame, dest: str, translated: Column,
                fallback: str | None, override: bool) -> DataFrame:
    if fallback is not None:
        translated = F.coalesce(translated, F.lit(fallback))
    if dest in df.columns and not override:
        translated = F.coalesce(F.col(dest), translated)
    return df.withColumn(dest, translated)


def translate_field(df: DataFrame, source: str,
                    dictionary: Mapping[str, str],
                    dest: str = "translation",
                    fallback: str | None = None,
                    override: bool = True) -> DataFrame:
    """Exact-match translation through an inline dictionary.

    The map is embedded in the plan as literals — no shuffle, no join,
    whole-stage codegen. For dictionaries too large to inline (> a few
    thousand entries) use :func:`translate_with_table`.
    """
    if not dictionary:
        raise ValueError("translate_field needs a non-empty dictionary")
    entries: list[Column] = []
    for k, v in dictionary.items():
        entries += [F.lit(k), F.lit(v)]
    translated = F.element_at(F.create_map(*entries), F.col(source))
    return _apply_dest(df, dest, translated, fallback, override)


def translate_regex(df: DataFrame, source: str,
                    dictionary: Mapping[str, str],
                    dest: str = "translation",
                    fallback: str | None = None,
                    override: bool = True) -> DataFrame:
    """First-matching-regex translation (``regex => true``): an ordered
    CASE chain of ``rlike`` — dict order is priority order, as the
    filter iterates its dictionary."""
    if not dictionary:
        raise ValueError("translate_regex needs a non-empty dictionary")
    translated = F.lit(None).cast("string")
    expr = None
    for pat, v in dictionary.items():
        branch = F.when(F.col(source).rlike(pat), F.lit(v))
        expr = branch if expr is None else expr.when(
            F.col(source).rlike(pat), F.lit(v))
    translated = expr.otherwise(F.lit(None).cast("string"))
    return _apply_dest(df, dest, translated, fallback, override)


def translate_with_table(df: DataFrame, source: str, dim: DataFrame,
                         key_col: str, value_col: str,
                         dest: str = "translation",
                         fallback: str | None = None,
                         override: bool = True) -> DataFrame:
    """Dictionary as a table: broadcast left join — the scale path when
    the dictionary outgrows plan literals. The dim side must be
    dimension-sized (broadcastable); duplicate keys keep the smallest
    value deterministically (the filter's dict can't have dup keys, so
    a dup here is a data bug — made deterministic, not silent)."""
    d = (dim.groupBy(F.col(key_col).alias("__tr_key"))
            .agg(F.min(F.col(value_col)).alias("__tr_val")))
    joined = df.join(F.broadcast(d), df[source] == F.col("__tr_key"), "left")
    out = _apply_dest(joined, dest, F.col("__tr_val"), fallback, override)
    return out.drop("__tr_key", "__tr_val")
