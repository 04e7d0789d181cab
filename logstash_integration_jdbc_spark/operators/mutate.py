"""Declarative field mutation — the logstash ``mutate`` filter surface.

The mutate filter (public logstash-filter-mutate docs) is the workhorse
of log pipelines: rename / convert / gsub / case / strip / split / join
/ merge / replace / copy / remove, applied in a documented fixed order
(coerce→rename→update→replace→convert→gsub→uppercase→capitalize→
lowercase→strip→split→join→merge→copy) unless the user orders them
explicitly. Here each operation compiles to a Catalyst expression and
the whole list is applied IN THE ORDER GIVEN (explicit beats implicit
— the filter's own docs recommend separate mutate blocks to control
order); the result is one codegen'd projection, no Python, no shuffle.

``replace`` / ``update`` / ``add_field`` values go through the same
``%{field}`` sprintf interpolation as the reference's parameter scheme
(functions/interpolate.py; reference
lib/logstash/plugin_mixins/jdbc/statement_handler.rb uses the
identical event.sprintf convention).
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logstash_integration_jdbc_spark.functions.interpolate import sprintf_expr

# convert targets: logstash type name → spark cast type
_CONVERT = {
    "integer": "long", "integer_eu": "long", "float": "double",
    "float_eu": "double", "string": "string", "boolean": "boolean",
}


def _conv(col: Column, typ: str) -> Column:
    if typ not in _CONVERT:
        raise ValueError(f"mutate convert: unknown type {typ!r} "
                         f"(one of {sorted(_CONVERT)})")
    if typ.endswith("_eu"):
        # "1.234,56" decimal-comma form (the filter's *_eu variants):
        # drop thousands dots, then comma → decimal point
        col = F.regexp_replace(
            F.regexp_replace(col.cast("string"), r"\.", ""), ",", ".")
    if typ == "boolean":
        s = F.lower(F.trim(col.cast("string")))
        return (F.when(s.isin("true", "t", "yes", "y", "1"), F.lit(True))
                 .when(s.isin("false", "f", "no", "n", "0"), F.lit(False)))
    return col.cast(_CONVERT[typ])


class Mutate:
    """``Mutate([("rename", "a", "b"), ("convert", "n", "integer"), ...])``.

    Ops (name, *args) — applied in list order:

    - ``("rename", src, dst)``       — move a column.
    - ``("copy", src, dst)``         — duplicate a column.
    - ``("remove", field, ...)``     — drop columns.
    - ``("convert", field, type)``   — cast (logstash type names;
      unparseable values → null, like the filter leaving the original
      on failure is NOT mirrored — nulls are the columnar analogue).
    - ``("gsub", field, pattern, replacement)`` — regex replace-all.
    - ``("lowercase"|"uppercase"|"capitalize"|"strip", field, ...)``.
    - ``("split", field, sep)``      — string → array<string>.
    - ``("join", field, sep)``       — array → string.
    - ``("merge", dst, src)``        — array/scalar concat into dst.
    - ``("replace"|"update"|"add_field", field, template)`` — set from a
      ``%{ref}`` sprintf template; ``update`` only touches existing
      non-null values, ``add_field`` only fills where currently null or
      missing.
    """

    def __init__(self, ops: Sequence[tuple]) -> None:
        self.ops = list(ops)
        for op in self.ops:
            if not op or op[0] not in {
                "rename", "copy", "remove", "convert", "gsub", "lowercase",
                "uppercase", "capitalize", "strip", "split", "join",
                "merge", "replace", "update", "add_field", "prune",
                "urldecode",
            }:
                raise ValueError(f"unknown mutate op: {op!r}")

    def apply(self, df: DataFrame) -> DataFrame:
        for op in self.ops:
            name, args = op[0], op[1:]
            if name == "rename":
                src, dst = args
                df = df.withColumnRenamed(src, dst)
            elif name == "copy":
                src, dst = args
                df = df.withColumn(dst, F.col(src))
            elif name == "remove":
                df = df.drop(*args)
            elif name == "prune":
                # logstash-filter-prune blacklist_names: drop every
                # column whose NAME matches the regex (schema-level,
                # resolved driver-side — no row work at all)
                pat = re.compile(args[0])
                df = df.drop(*[c for c in df.columns if pat.search(c)])
            elif name == "urldecode":
                for f_ in args:
                    df = df.withColumn(f_, F.try_url_decode(F.col(f_)))
            elif name == "convert":
                f_, typ = args
                df = df.withColumn(f_, _conv(F.col(f_), typ))
            elif name == "gsub":
                f_, pat, rep = args
                df = df.withColumn(f_, F.regexp_replace(F.col(f_), pat, rep))
            elif name == "lowercase":
                for f_ in args:
                    df = df.withColumn(f_, F.lower(F.col(f_)))
            elif name == "uppercase":
                for f_ in args:
                    df = df.withColumn(f_, F.upper(F.col(f_)))
            elif name == "capitalize":
                for f_ in args:
                    df = df.withColumn(f_, F.initcap(F.col(f_)))
            elif name == "strip":
                for f_ in args:
                    df = df.withColumn(f_, F.trim(F.col(f_)))
            elif name == "split":
                f_, sep = args
                df = df.withColumn(f_, F.split(F.col(f_), re.escape(sep)))
            elif name == "join":
                f_, sep = args
                df = df.withColumn(f_, F.array_join(F.col(f_), sep))
            elif name == "merge":
                dst, src = args
                df = df.withColumn(dst, F.concat(_as_array(df, dst), _as_array(df, src)))
            elif name in ("replace", "update", "add_field"):
                f_, template = args
                val = sprintf_expr(template)
                if name == "replace" or f_ not in df.columns:
                    df = df.withColumn(f_, val)
                elif name == "update":
                    df = df.withColumn(
                        f_, F.when(F.col(f_).isNotNull(), val).otherwise(F.col(f_)))
                else:  # add_field on an existing column: fill nulls only
                    df = df.withColumn(
                        f_, F.when(F.col(f_).isNull(), val).otherwise(F.col(f_)))
        return df


def _as_array(df: DataFrame, name: str) -> Column:
    c = F.col(name)
    if name in df.columns and df.schema[name].dataType.typeName() == "array":
        return F.coalesce(c, F.array().cast("array<string>"))
    return F.when(c.isNull(), F.array().cast("array<string>")) \
            .otherwise(F.array(c.cast("string")))
