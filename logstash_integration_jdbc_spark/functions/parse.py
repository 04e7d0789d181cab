"""Vectorized grok/regex parsing of turn text.

The reference relies on upstream Logstash for parsing (SURVEY.md §2.5);
the north_star requires a vectorized extractor of tool-call/event fields
from ``text`` with no per-row Python. Two tiers:

1. ``GrokParser`` — a mini grok compiler: ``%{WORD:name}``-style
   patterns compile to a single Java regex evaluated with
   ``regexp_extract`` per capture, entirely JVM-side inside whole-stage
   codegen. This is the default and the fast path (zero Python).
2. ``parse_text_pandas`` — an Arrow pandas UDF using precompiled regex +
   ``pd.Series.str.extract`` for patterns Java regex can't express;
   batch-vectorized, never row-at-a-time.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "UUID": r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
}

_GROK_REF = re.compile(r"%\{(\w+):(\w+)\}")


class GrokParser:
    """Compile a grok pattern into Catalyst extraction expressions."""

    def __init__(self, pattern: str, types: dict[str, str] | None = None) -> None:
        self.pattern = pattern
        self.types = types or {}
        self.fields: list[str] = []
        regex = ""
        pos = 0
        for m in _GROK_REF.finditer(pattern):
            regex += re.escape(pattern[pos : m.start()])
            gname, fname = m.group(1), m.group(2)
            if gname not in GROK_PATTERNS:
                raise ValueError(f"unknown grok pattern %{{{gname}}}")
            regex += f"({GROK_PATTERNS[gname]})"
            self.fields.append(fname)
            pos = m.end()
        regex += re.escape(pattern[pos:])
        self.regex = regex

    def extract(self, col: Column) -> dict[str, Column]:
        """field name → typed extracted Column (null when no match)."""
        out: dict[str, Column] = {}
        for i, fname in enumerate(self.fields, start=1):
            c = F.regexp_extract(col, self.regex, i)
            # regexp_extract returns '' on miss; normalize to null like a
            # grok miss leaves the field unset.
            c = F.when(c == "", F.lit(None)).otherwise(c)
            t = self.types.get(fname)
            if t:
                c = c.cast(t)
            out[fname] = c
        return out

    def apply(self, df: DataFrame, text_col: str = "text",
              matched_col: str = "parse_ok") -> DataFrame:
        cols = self.extract(F.col(text_col))
        for name, c in cols.items():
            df = df.withColumn(name, c)
        first = self.fields[0]
        return df.withColumn(matched_col, F.col(first).isNotNull())


# The transcript payload pattern baked into the generator/fixtures.
TOOL_CALL_GROK = "tool_call=%{NOTSPACE:tool_call} status=%{WORD:status} dur_ms=%{INT:dur_ms}"


def parse_tool_calls(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Extract (tool_call, status, dur_ms, parse_ok) from turn text."""
    parser = GrokParser(TOOL_CALL_GROK, types={"dur_ms": "int"})
    return parser.apply(df, text_col=text_col)


class GrokPipeline:
    """Logstash-grok `match` semantics over several patterns.

    Logstash grok takes a LIST of patterns per field; with the default
    ``break_on_match => true`` the first matching pattern wins and later
    ones are skipped; if none match the event is tagged
    ``_grokparsefailure``. Compiled Spark-side as a chain of
    ``coalesce``-per-field over the per-pattern extractions — one
    codegen'd projection, no Python, no per-row loop.
    """

    def __init__(self, patterns: list[str], types: dict[str, str] | None = None,
                 tag_on_failure: tuple[str, ...] = ("_grokparsefailure",),
                 break_on_match: bool = True) -> None:
        self.parsers = [GrokParser(p, types) for p in patterns]
        self.tag_on_failure = list(tag_on_failure)
        self.break_on_match = break_on_match
        self.fields: list[str] = []
        for p in self.parsers:
            for f_ in p.fields:
                if f_ not in self.fields:
                    self.fields.append(f_)

    def apply(self, df: DataFrame, text_col: str = "text",
              matched_col: str = "parse_ok", tags_col: str = "tags") -> DataFrame:
        text = F.col(text_col)
        per_parser = [p.extract(text) for p in self.parsers]
        matches = [
            # a parser "matched" when its first capture is non-null
            cols[p.fields[0]].isNotNull()
            for p, cols in zip(self.parsers, per_parser)
        ]
        if self.break_on_match:
            # first matching pattern wins for ALL its fields
            for f_ in self.fields:
                expr = None
                for m, p, cols in zip(matches, self.parsers, per_parser):
                    if f_ not in cols:
                        continue
                    branch = F.when(m, cols[f_])
                    expr = branch if expr is None else expr.when(m, cols[f_])
                df = df.withColumn(f_, expr.otherwise(F.lit(None)))
        else:
            # every pattern contributes; later patterns fill gaps
            for f_ in self.fields:
                cands = [cols[f_] for cols in per_parser if f_ in cols]
                df = df.withColumn(f_, F.coalesce(*cands) if len(cands) > 1 else cands[0])
        any_match = matches[0]
        for m in matches[1:]:
            any_match = any_match | m
        df = df.withColumn(matched_col, any_match)
        if self.tag_on_failure:
            from logstash_integration_jdbc_spark.operators.lookup import add_tags

            df = add_tags(df, ~any_match, self.tag_on_failure)
        return df


def parse_text_pandas(pattern: str, fields: list[str]):
    """Arrow pandas-UDF fallback extractor → map<string,string>.

    Returns a pandas_udf usable as
    ``df.withColumn("parsed", udf(col("text")))``. Batch-vectorized
    (`str.extract` over the whole Arrow batch); for Java-regex-expressible
    patterns prefer GrokParser (stays in codegen, no Python at all).
    """
    compiled = re.compile(pattern)

    @pandas_udf("map<string,string>")
    def _extract(s: pd.Series) -> pd.Series:
        frame = s.str.extract(compiled)
        frame.columns = fields[: len(frame.columns)]
        return pd.Series(
            [None if row.isna().all() else {k: v for k, v in row.items() if pd.notna(v)}
             for _, row in frame.iterrows()]
        )

    return _extract
