from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from logstash_integration_jdbc_spark.functions.dissect import (
    DissectParser,
    compile_dissect,
)


def _parse_one(parser: DissectParser, spark, text: str) -> dict:
    df = spark.createDataFrame([(text,)], "text string")
    return parser.apply(df).collect()[0].asDict()


def test_basic_split(spark):
    p = DissectParser("%{ts} %{level} %{msg}")
    row = _parse_one(p, spark, "2024-01-01T00:00:00 INFO all good here")
    assert row["ts"] == "2024-01-01T00:00:00"
    assert row["level"] == "INFO"
    # last field is greedy: takes the rest including spaces
    assert row["msg"] == "all good here"
    assert row["parse_ok"] is True
    assert row["tags"] == []


def test_literal_prefix_suffix_delims(spark):
    p = DissectParser("[%{level}] %{code}!")
    row = _parse_one(p, spark, "[WARN] E42!")
    assert row["level"] == "WARN" and row["code"] == "E42"
    bad = _parse_one(p, spark, "WARN E42")
    assert bad["parse_ok"] is False
    assert bad["level"] is None and bad["code"] is None
    assert "_dissectfailure" in bad["tags"]


def test_skip_fields(spark):
    p = DissectParser("%{} %{?junk} %{keep}")
    row = _parse_one(p, spark, "a b c")
    assert row["keep"] == "c"
    assert "junk" not in row and "" not in row
    assert p.fields == ["keep"]


def test_append_default_order_and_separator(spark):
    p = DissectParser("%{+name} %{+name} %{rest}", append_separator=" ")
    row = _parse_one(p, spark, "john doe admin")
    assert row["name"] == "john doe"
    assert row["rest"] == "admin"


def test_append_explicit_order(spark):
    # /2 part sorts after /1 regardless of appearance order
    p = DissectParser("%{+ts/2} %{+ts/1} %{msg}", append_separator="-")
    row = _parse_one(p, spark, "PM 10:30 ok")
    assert row["ts"] == "10:30-PM"


def test_right_padding(spark):
    p = DissectParser("%{col1->} %{col2}")
    row = _parse_one(p, spark, "alpha      beta")
    assert row["col1"] == "alpha"
    assert row["col2"] == "beta"
    # without the -> modifier the repeated spaces land in a field
    q = DissectParser("%{col1} %{col2}")
    row2 = _parse_one(q, spark, "alpha  beta")
    assert row2["col2"] == " beta"


def test_types_cast(spark):
    p = DissectParser("%{host}:%{port}", types={"port": "int"})
    row = _parse_one(p, spark, "web01:8443")
    assert row["port"] == 8443 and isinstance(row["port"], int)


def test_empty_capture_on_match_is_empty_string(spark):
    p = DissectParser("%{a},%{b}")
    row = _parse_one(p, spark, "x,")
    assert row["parse_ok"] is True
    assert row["a"] == "x" and row["b"] == ""


def test_newlines_in_greedy_tail(spark):
    p = DissectParser("%{head} %{tail}")
    row = _parse_one(p, spark, "one two\nthree")
    assert row["tail"] == "two\nthree"


def test_compile_errors():
    with pytest.raises(ValueError, match="no %"):
        compile_dissect("plain text")
    with pytest.raises(ValueError, match="delimiter"):
        compile_dissect("%{a}%{b}")
    with pytest.raises(NotImplementedError, match="indirect"):
        DissectParser("%{?k} %{&k}")
    with pytest.raises(ValueError, match="unknown dissect fields"):
        DissectParser("%{a} %{b}", types={"nope": "int"})


def test_regex_is_python_compatible_twin():
    # the compiled regex must behave identically under Python re — the
    # oracle replays it with duckdb regexp_extract (RE2) / python
    rx, parts = compile_dissect("[%{level}] %{src->} %{msg}")
    m = re.match(rx, "[INFO] gateway     started ok")
    assert m
    assert m.group(1) == "INFO" and m.group(2) == "gateway"
    assert m.group(3) == "started ok"


def test_batch_over_transcripts(spark, transcripts):
    # the structured-payload turns match the full dissect mapping; the
    # free-form turns take the failure path with nulls + tag
    p = DissectParser(
        "turn %{turn}: invoking tool_call=%{tc} status=%{st}"
        " dur_ms=%{dur_ms} session=%{session}",
        types={"turn": "long", "dur_ms": "int"},
    )
    out = p.apply(transcripts).cache()
    ok = out.filter(F.col("parse_ok"))
    bad = out.filter(~F.col("parse_ok"))
    assert ok.count() > 0 and bad.count() > 0
    assert ok.filter(F.col("dur_ms").isNull() | F.col("tc").isNull()).count() == 0
    assert bad.filter(~F.array_contains("tags", "_dissectfailure")).count() == 0
    out.unpersist()


def test_no_python_udf_in_plan(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    out = DissectParser("%{x} %{y}").apply(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
