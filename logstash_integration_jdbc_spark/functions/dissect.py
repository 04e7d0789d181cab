"""Dissect-style delimiter parsing, compiled to one JVM regex.

Dissect (logstash-filter-dissect / the Elasticsearch dissect ingest
processor — both public) is the fast sibling of grok: instead of a
user-supplied regex, the pattern is literal delimiter text interleaved
with ``%{field}`` tokens, and extraction is pure positional splitting.
The reference integration delegates parsing to upstream Logstash
filters (SURVEY.md §2.5); this module re-expresses the dissect surface
Spark-first: the pattern compiles ONCE (driver-side) to a single
anchored Java regex whose groups are evaluated with ``regexp_extract``
inside whole-stage codegen — no per-row Python, no UDF.

Supported token forms (dissect's public grammar):

- ``%{name}``      — normal field.
- ``%{}``          — skip: matched, not emitted.
- ``%{?name}``     — named skip (documentation-only name).
- ``%{+name}``     — append to ``name`` in appearance order.
- ``%{+name/2}``   — append with explicit order; ``/n`` sorts ascending,
                     un-suffixed parts keep order 0.
- ``%{name->}``    — right padding: the delimiter that follows may
                     repeat (e.g. aligned columns padded with spaces).

Parts of an append group are joined with ``append_separator`` (default
``""``, matching the ES dissect processor's default). ``%{&name}``
indirect fields would need per-row dynamic column names — out of scope
for a columnar engine; a clear error is raised.

Failure semantics mirror the filter: a non-matching row leaves every
field null, ``parse_ok`` false, and gets ``tag_on_failure`` tags
(default ``_dissectfailure``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(r"%\{([^{}]*)\}")


@dataclass(frozen=True)
class _Part:
    """One %{...} token: output field (or None for skip), capture-group
    index, append order (None = not an append part)."""

    field: str | None
    group: int
    order: int | None


def _parse_token(tok: str) -> tuple[str | None, int | None]:
    """token body → (field_or_None, append_order_or_None)."""
    if tok.endswith("->"):
        tok = tok[:-2]
    if tok == "" or tok.startswith("?"):
        return None, None
    if tok.startswith("&"):
        raise NotImplementedError(
            "dissect indirect fields (%{&name}) need per-row dynamic "
            "column names; not expressible as a static Spark schema — "
            "extract to a map with kv/grok instead")
    if tok.startswith("+"):
        body = tok[1:]
        order = 0
        m = re.fullmatch(r"(.*)/(\d+)", body)
        if m:
            body, order = m.group(1), int(m.group(2))
        if not body:
            raise ValueError("dissect append token with empty name: %{+}")
        return body, order
    return tok, None


def compile_dissect(pattern: str) -> tuple[str, list[_Part]]:
    """Compile a dissect pattern to (anchored_java_regex, parts).

    The regex uses only constructs shared by Java regex and Python
    ``re`` so oracle tests can replay it bit-identically. ``(?s)`` makes
    ``.`` span newlines — dissect operates on the whole event text.
    """
    tokens = list(_TOKEN_RE.finditer(pattern))
    if not tokens:
        raise ValueError(f"dissect pattern has no %{{}} tokens: {pattern!r}")
    parts: list[_Part] = []
    rx: list[str] = ["(?s)^", re.escape(pattern[: tokens[0].start()])]
    for i, tok in enumerate(tokens):
        body = tok.group(1)
        padded = body.endswith("->") or body == "->"
        field, order = _parse_token(body)
        nxt = tokens[i + 1].start() if i + 1 < len(tokens) else len(pattern)
        delim = pattern[tok.end(): nxt]
        last = i + 1 == len(tokens) and delim == ""
        if not last and delim == "":
            raise ValueError(
                f"dissect needs a delimiter between consecutive fields "
                f"(position {tok.end()} in {pattern!r})")
        rx.append("(.*)" if last else "(.*?)")
        parts.append(_Part(field, i + 1, order))
        if delim:
            d = re.escape(delim)
            rx.append(f"(?:{d})+" if padded else d)
    rx.append("$")
    return "".join(rx), parts


class DissectParser:
    """Logstash-dissect `mapping` semantics as Catalyst expressions.

    ``types`` mirrors the filter's ``convert_datatype`` option (field →
    Spark cast type). One ``rlike`` pass decides the match; each output
    field is a ``regexp_extract`` guarded by it, so a non-match yields
    null (not ``''``) while a genuinely empty capture on a matching row
    stays ``''`` — the filter's exact behavior.
    """

    def __init__(self, pattern: str, types: dict[str, str] | None = None,
                 append_separator: str = "",
                 tag_on_failure: tuple[str, ...] = ("_dissectfailure",)) -> None:
        self.pattern = pattern
        self.regex, self._parts = compile_dissect(pattern)
        self.types = dict(types or {})
        self.append_separator = append_separator
        self.tag_on_failure = list(tag_on_failure)
        # output order: first appearance of each emitted field
        self.fields: list[str] = []
        for p in self._parts:
            if p.field is not None and p.field not in self.fields:
                self.fields.append(p.field)
        unknown = set(self.types) - set(self.fields)
        if unknown:
            raise ValueError(f"types for unknown dissect fields: {sorted(unknown)}")

    def extract_all(self, col: Column) -> tuple[Column, dict[str, Column]]:
        matched = col.rlike(self.regex)
        out: dict[str, Column] = {}
        for f_ in self.fields:
            grp = [p for p in self._parts if p.field == f_]
            if len(grp) == 1 and grp[0].order is None:
                c = F.regexp_extract(col, self.regex, grp[0].group)
            else:
                # append group: stable sort by explicit order, then
                # appearance — dissect's documented ordering
                grp = sorted(grp, key=lambda p: (p.order or 0, p.group))
                c = F.concat_ws(
                    self.append_separator,
                    *[F.regexp_extract(col, self.regex, p.group) for p in grp])
            c = F.when(matched, c).otherwise(F.lit(None))
            t = self.types.get(f_)
            if t:
                c = c.cast(t)
            out[f_] = c
        return matched, out

    def apply(self, df: DataFrame, text_col: str = "text",
              matched_col: str = "parse_ok", tags_col: str = "tags") -> DataFrame:
        matched, cols = self.extract_all(F.col(text_col))
        for name, c in cols.items():
            df = df.withColumn(name, c)
        df = df.withColumn(matched_col, matched)
        if self.tag_on_failure:
            from logstash_integration_jdbc_spark.operators.lookup import add_tags

            df = add_tags(df, ~matched, self.tag_on_failure)
        return df
