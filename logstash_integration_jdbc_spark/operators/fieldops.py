"""Small field-shaping filters: truncate, de_dot, json_encode,
environment, range — the remaining everyday logstash field filters,
each a pure-Catalyst projection (public logstash-filter-* semantics).
"""

from __future__ import annotations

import os
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def truncate_bytes(col: Column, length_bytes: int) -> Column:
    """logstash-filter-truncate: cap a string at ``length_bytes`` of
    UTF-8, never splitting a multi-byte character (the filter truncates
    the byte representation; a naive byte cut would emit malformed
    UTF-8 into every downstream consumer).

    Pure codegen: encode once, test the byte AFTER each of the four
    candidate cut points (a UTF-8 character starts at any byte outside
    0x80–0xBF, and characters are ≤4 bytes, so one of N..N−3 is always
    a clean boundary), take the longest clean cut, decode. Single-byte
    binary comparisons against X'80'/X'C0' are lexicographic byte
    compares — no UDF, no regex.
    """
    if length_bytes < 4:
        raise ValueError("length_bytes must be >= 4 (a UTF-8 character "
                         "may need 4 bytes)")
    b = F.encode(col, "UTF-8")
    blen = F.length(b)

    def clean(k: int) -> Column:
        nxt = F.substring(b, k + 1, 1)
        return (nxt < F.lit(bytes([0x80]))) | (nxt >= F.lit(bytes([0xC0])))

    expr = None
    for k in range(length_bytes, length_bytes - 4, -1):
        cut = F.decode(F.substring(b, 1, k), "UTF-8")
        expr = F.when(clean(k), cut) if expr is None else expr.when(clean(k), cut)
    # unreachable fallback (one of the four cuts is always clean)
    truncated = expr.otherwise(F.decode(F.substring(b, 1, length_bytes - 3),
                                        "UTF-8"))
    return F.when(col.isNull() | (blen <= length_bytes), col) \
            .otherwise(truncated)


def truncate_fields(df: DataFrame, fields: Sequence[str],
                    length_bytes: int) -> DataFrame:
    for f_ in fields:
        df = df.withColumn(f_, truncate_bytes(F.col(f_), length_bytes))
    return df


def de_dot(df: DataFrame, nested: bool = False,
           separator: str = "_") -> DataFrame:
    """logstash-filter-de_dot: dots in field names break downstream
    path syntax — rename ``a.b`` → ``a_b``. Schema-only (zero-cost
    projection). ``nested=True`` (the filter's option that RE-PARENTS
    ``a.b`` into a struct ``a.{b}``) is intentionally unsupported: in a
    static schema that is a different column type, not a rename —
    build the struct explicitly instead."""
    if nested:
        raise ValueError("nested re-parenting changes the schema type; "
                         "construct the struct column explicitly")
    out = df
    for c in df.columns:
        if "." in c:
            out = out.withColumnRenamed(c, c.replace(".", separator))
    return out


def json_encode(df: DataFrame, fields: Sequence[str],
                target: str = "json") -> DataFrame:
    """logstash-filter-json_encode: serialize the named columns as one
    JSON object column (``to_json`` — JVM Jackson, key order = field
    order, compact)."""
    if not fields:
        raise ValueError("json_encode needs at least one field")
    return df.withColumn(target, F.to_json(F.struct(*[F.col(f_)
                                                      for f_ in fields])))


def add_environment(df: DataFrame, fields: Mapping[str, str],
                    default: str | None = None) -> DataFrame:
    """logstash-filter-environment: stamp env-var values as columns.
    Read ONCE driver-side and embedded as literals — the executors'
    environments are not the pipeline's configuration surface."""
    for col_name, var in fields.items():
        df = df.withColumn(col_name, F.lit(os.environ.get(var, default)))
    return df


def range_check(df: DataFrame,
                checks: Sequence[tuple[str, float | int, float | int]],
                flag_col: str = "range_ok",
                tag_on_violation: str | None = "_rangeviolation") -> DataFrame:
    """logstash-filter-range: validate numeric fields (or string
    lengths) against [min, max]; out-of-band rows flag false and take
    the violation tag. String columns check ``length()`` — the
    filter's behavior for string fields. One projection."""
    if not checks:
        raise ValueError("range_check needs at least one (col, min, max)")
    ok = F.lit(True)
    for name, lo, hi in checks:
        dt = dict(df.dtypes).get(name)
        if dt is None:
            raise ValueError(f"unknown column {name!r}")
        val = F.length(F.col(name)) if dt == "string" else F.col(name)
        ok = ok & F.coalesce(val.between(lo, hi), F.lit(False))
    df = df.withColumn(flag_col, ok)
    if tag_on_violation:
        from logstash_integration_jdbc_spark.operators.lookup import add_tags

        df = add_tags(df, ~F.col(flag_col), (tag_on_violation,))
    return df
