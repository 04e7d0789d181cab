"""Structured-text parsing: kv, JSON, and CSV field extraction.

Logstash pipelines around the reference integration lean on three more
parse filters besides grok/dissect — ``kv`` (key=value splitting),
``json``, and ``csv`` (public logstash-filter-{kv,json,csv} semantics).
Each is re-expressed here as pure Catalyst expressions over Spark
built-ins (``str_to_map``, ``from_json``, ``from_csv``) — JVM-side,
whole-stage codegen, no Python in the row path.

Shared failure convention (matching the filters): a row whose payload
fails to parse keeps nulls for the extracted fields and is tagged
``_kvfailure`` / ``_jsonparsefailure`` / ``_csvparsefailure``.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _strip_chars(c: Column, chars: str) -> Column:
    cls = "[" + re.escape(chars) + "]+"
    return F.regexp_replace(F.regexp_replace(c, f"^{cls}", ""), f"{cls}$", "")


def kv_expr(col: Column, field_split: str = " ", value_split: str = "=",
            include_keys: Sequence[str] | None = None,
            exclude_keys: Sequence[str] | None = None,
            prefix: str = "",
            trim_key: str | None = None,
            trim_value: str | None = None) -> Column:
    """``k=v`` text → ``map<string,string>`` (logstash kv filter core).

    Built from ``split``/``transform``/``map_from_entries`` higher-order
    functions rather than ``str_to_map``: the delimiters are literal
    strings (str_to_map would treat them as regexes), tokens without a
    value separator are dropped (kv's behavior for stray words), and a
    repeated key deterministically keeps its LAST value regardless of
    the session's ``spark.sql.mapKeyDedupPolicy`` (str_to_map throws
    under the default EXCEPTION policy). The last-wins scan is O(n²)
    over the per-row pair count — pairs per event are small by
    construction, and everything stays codegen'd, no Python, no
    shuffle. Multi-valued keys (kv ``allow_duplicate_values`` array
    mode) are out of scope — use grok for multi-capture extraction.
    """
    vs_len = len(value_split)
    pairs = F.filter(F.split(col, re.escape(field_split)),
                     lambda p: F.instr(p, value_split) > 0)
    entries = F.transform(
        pairs,
        lambda p: F.struct(
            F.substring(p, F.lit(1), F.instr(p, value_split) - 1).alias("key"),
            F.substring(p, F.instr(p, value_split) + vs_len,
                        F.length(p)).alias("value"),
        ),
    )
    if trim_key:
        entries = F.transform(
            entries, lambda e: F.struct(
                _strip_chars(e["key"], trim_key).alias("key"),
                e["value"].alias("value")))
    if trim_value:
        entries = F.transform(
            entries, lambda e: F.struct(
                e["key"].alias("key"),
                _strip_chars(e["value"], trim_value).alias("value")))
    # last occurrence of each key wins: keep entry i only if no later
    # entry shares its key
    n = F.size(entries)
    entries = F.filter(
        entries,
        lambda e, i: ~F.exists(F.slice(entries, i + 2, n),
                               lambda e2: e2["key"] == e["key"]))
    m = F.map_from_entries(entries)
    if include_keys is not None:
        keys = F.array(*[F.lit(k) for k in include_keys])
        m = F.map_filter(m, lambda k, _v: F.array_contains(keys, k))
    if exclude_keys:
        keys = F.array(*[F.lit(k) for k in exclude_keys])
        m = F.map_filter(m, lambda k, _v: ~F.array_contains(keys, k))
    if prefix:
        m = F.transform_keys(m, lambda k, _v: F.concat(F.lit(prefix), k))
    return m


def kv_parse(df: DataFrame, text_col: str, target: str = "kv",
             fields: Sequence[str] | None = None, **kv_opts) -> DataFrame:
    """Attach the kv map as ``target``; optionally project ``fields``
    out as top-level string columns (null when absent, like kv leaving
    the field unset)."""
    df = df.withColumn(target, kv_expr(F.col(text_col), **kv_opts))
    for f_ in fields or ():
        df = df.withColumn(f_, F.col(target).getItem(f_))
    return df


def json_parse(df: DataFrame, text_col: str, schema: str,
               target: str | None = None,
               tag_on_failure: tuple[str, ...] = ("_jsonparsefailure",)) -> DataFrame:
    """logstash-filter-json: parse a JSON string column against a
    schema (DDL string). ``target=None`` merges the parsed fields to
    the top level (the filter's default); a name nests them as one
    struct column (its ``target`` option ≡ the reference's
    P2 target nesting).

    Malformed input is detected with a corrupt-record probe column
    (PERMISSIVE mode fills the parsed fields with nulls, so a null
    struct test alone can't distinguish "bad JSON" from "valid JSON
    without these keys") — failing rows null their fields and take
    ``tag_on_failure``, exactly the filter's behavior.
    """
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"}
    tmp = "_json_parsed"
    df = df.withColumn(tmp, F.from_json(F.col(text_col), schema + ", _corrupt string", opts))
    failed = F.col(text_col).isNotNull() & F.col(f"{tmp}._corrupt").isNotNull()
    names = [n for n in df.schema[tmp].dataType.fieldNames() if n != "_corrupt"]
    return _emit_parsed(df, tmp, names, failed, target, tag_on_failure)


def csv_parse(df: DataFrame, text_col: str, schema: str,
              sep: str = ",", quote: str = '"',
              target: str | None = None,
              tag_on_failure: tuple[str, ...] = ("_csvparsefailure",)) -> DataFrame:
    """logstash-filter-csv: split a delimited line into typed columns
    via ``from_csv`` (quote-aware, JVM CSV parser — not a naive split).

    FAILFAST would throw per-row; PERMISSIVE + a corrupt-record probe
    keeps the pipeline total: malformed rows null their fields and take
    ``tag_on_failure``.
    """
    opts = {"sep": sep, "quote": quote, "mode": "PERMISSIVE",
            "columnNameOfCorruptRecord": "_corrupt"}
    probe_schema = schema + ", _corrupt string"
    tmp = "_csv_parsed"
    df = df.withColumn(tmp, F.from_csv(F.col(text_col), probe_schema, opts))
    failed = F.col(text_col).isNotNull() & F.col(f"{tmp}._corrupt").isNotNull()
    names = [n for n in df.schema[tmp].dataType.fieldNames() if n != "_corrupt"]
    return _emit_parsed(df, tmp, names, failed, target, tag_on_failure)


def xml_parse(df: DataFrame, text_col: str, schema: str,
              target: str | None = None,
              tag_on_failure: tuple[str, ...] = ("_xmlparsefailure",)) -> DataFrame:
    """logstash-filter-xml: parse an XML string column against a schema
    (DDL string) via Spark 4's native ``from_xml`` — JVM StAX parser,
    no Python. Attribute fields use the XML source's ``_``-prefix
    convention (attribute ``type`` → field ``_type``); ``target``
    nests like :func:`json_parse`.

    Failure detection uses the same corrupt-record probe as
    json/csv_parse (PERMISSIVE null-fills the parsed fields, so a null
    test alone can't tell bad XML from valid XML missing these keys) —
    failing rows null their fields and take ``tag_on_failure``.
    """
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"}
    tmp = "_xml_parsed"
    df = df.withColumn(tmp, F.from_xml(F.col(text_col),
                                       schema + ", _corrupt string", opts))
    failed = F.col(text_col).isNotNull() & F.col(f"{tmp}._corrupt").isNotNull()
    names = [n for n in df.schema[tmp].dataType.fieldNames()
             if n != "_corrupt"]
    return _emit_parsed(df, tmp, names, failed, target, tag_on_failure)


def _emit_parsed(df: DataFrame, tmp: str, names: list[str], failed: Column,
                 target: str | None,
                 tag_on_failure: tuple[str, ...]) -> DataFrame:
    """Project the probe struct out (top-level or nested), tag failures
    BEFORE dropping the probe column the ``failed`` expression reads."""
    if target is None:
        for n in names:
            df = df.withColumn(n, F.when(~failed, F.col(f"{tmp}.{n}")))
    else:
        df = df.withColumn(
            target,
            F.when(~failed & F.col(tmp).isNotNull(),
                   F.struct(*[F.col(f"{tmp}.{n}").alias(n) for n in names])))
    if tag_on_failure:
        from logstash_integration_jdbc_spark.operators.lookup import add_tags

        df = add_tags(df, failed, tag_on_failure)
    return df.drop(tmp)
