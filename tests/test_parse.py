"""Grok compiler + vectorized extraction (north_star parse stage)."""

from __future__ import annotations

import pytest

from logstash_integration_jdbc_spark.functions.parse import (
    GrokParser,
    parse_text_pandas,
    parse_tool_calls,
)


def test_grok_compiles_named_captures():
    p = GrokParser("tool_call=%{NOTSPACE:tool_call} dur_ms=%{INT:dur_ms}")
    assert p.fields == ["tool_call", "dur_ms"]
    assert "(\\S+)" in p.regex and "([+-]?\\d+)" in p.regex


def test_unknown_grok_pattern_rejected():
    with pytest.raises(ValueError, match="unknown grok pattern"):
        GrokParser("%{NOPE:x}")


def test_extract_types_and_misses(spark):
    df = spark.createDataFrame(
        [("invoking tool_call=search status=ok dur_ms=123 tail",),
         ("no structured payload",)],
        "text string",
    )
    out = parse_tool_calls(df).collect()
    hit = next(r for r in out if r.parse_ok)
    miss = next(r for r in out if not r.parse_ok)
    assert hit.tool_call == "search" and hit.status == "ok" and hit.dur_ms == 123
    assert isinstance(hit.dur_ms, int)
    assert miss.tool_call is None and miss.dur_ms is None


def test_parse_stays_jvm_side(spark, transcripts):
    # The fast path must not contain Python evaluation: no BatchEvalPython
    # / ArrowEvalPython in the plan — the whole point of the grok compiler.
    plan = parse_tool_calls(transcripts)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_pandas_udf_fallback_extracts_map(spark):
    udf = parse_text_pandas(r"status=(\w+) dur_ms=(\d+)", ["status", "dur_ms"])
    df = spark.createDataFrame(
        [("x status=ok dur_ms=5",), ("nothing",)], "text string"
    )
    rows = df.select(udf("text").alias("m")).collect()
    assert rows[0].m == {"status": "ok", "dur_ms": "5"}
    assert rows[1].m is None
