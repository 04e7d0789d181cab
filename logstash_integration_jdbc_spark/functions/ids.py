"""Event IDs: deterministic UUID stamping (logstash-filter-uuid).

The uuid filter stamps each event with a UUID. Its random UUIDs are
retry-hostile at scale — a recomputed task would mint DIFFERENT ids,
breaking exactly-once sinks — so the primary form here is the
name-based RFC 4122 **version-3** UUID (MD5 of the event's natural
key): same input → same id across runs, retries, and engines, which is
what an idempotent 100 TB pipeline actually needs. A ``random=True``
escape hatch gives the filter's literal behavior (Spark ``uuid()``,
seeded per-plan) for callers who accept non-determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def uuid3_expr(*cols: Column | str) -> Column:
    """RFC 4122 v3 (MD5 name-based) UUID from the given columns:
    md5 hex reshaped to 8-4-4-4-12 with the version nibble forced to 3
    and the variant nibble to ``(d & 3) | 8`` — pure string/arith
    codegen, replayable in any SQL engine with md5()."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    h = F.md5(F.concat_ws("\x1f", *[c.cast("string") for c in cs]))
    d = F.conv(F.substring(h, 17, 1), 16, 10).cast("int")
    variant = F.element_at(F.array(*[F.lit(x) for x in "89ab"]), d % 4 + 1)
    return F.concat(
        F.substring(h, 1, 8), F.lit("-"),
        F.substring(h, 9, 4), F.lit("-3"),
        F.substring(h, 14, 3), F.lit("-"),
        variant, F.substring(h, 18, 3), F.lit("-"),
        F.substring(h, 21, 12))


def stamp_uuid(df: DataFrame, *key_cols: str, target: str = "uuid",
               overwrite: bool = True, random: bool = False) -> DataFrame:
    """Add ``target`` (the filter's ``target`` option). Deterministic
    v3 from ``key_cols`` by default; ``overwrite=False`` keeps an
    existing non-null id (the filter's ``overwrite => false``)."""
    if random:
        new = F.expr("uuid()")
    else:
        if not key_cols:
            raise ValueError("deterministic uuid needs at least one key "
                             "column (or pass random=True)")
        new = uuid3_expr(*key_cols)
    if target in df.columns and not overwrite:
        new = F.coalesce(F.col(target), new)
    return df.withColumn(target, new)
