from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logstash_integration_jdbc_spark.operators.multiline import multiline_assemble


def _lines(spark, rows):
    return spark.createDataFrame(rows, "source string, line_no int, line string")


def test_stack_trace_folding(spark):
    # what=previous, negate=false: continuation lines (leading space)
    # match the pattern → start = NOT match
    rows = [
        ("a", 0, "ERROR boom"),
        ("a", 1, "  at Foo.bar"),
        ("a", 2, "  at Baz.qux"),
        ("a", 3, "INFO fine"),
        ("a", 4, "ERROR again"),
        ("a", 5, "  at X.y"),
    ]
    out = multiline_assemble(
        _lines(spark, rows), ~F.col("line").startswith("  ")).collect()
    msgs = {r["event_no"]: r for r in out}
    assert len(msgs) == 3
    assert msgs[1]["message"] == "ERROR boom\n  at Foo.bar\n  at Baz.qux"
    assert msgs[1]["n_lines"] == 3 and msgs[1]["first_line"] == 0
    assert msgs[2]["message"] == "INFO fine"
    assert msgs[3]["message"] == "ERROR again\n  at X.y"
    assert not any(r["orphaned"] for r in out)


def test_orphaned_leading_lines(spark):
    rows = [("a", 0, "  dangling"), ("a", 1, "START one"), ("a", 2, "  cont")]
    out = {r["event_no"]: r for r in multiline_assemble(
        _lines(spark, rows), F.col("line").startswith("START")).collect()}
    assert out[0]["orphaned"] is True and out[0]["message"] == "  dangling"
    assert out[1]["message"] == "START one\n  cont"


def test_what_next_attaches_forward(spark):
    # lines ending with '\' continue onto the next line (what=next)
    rows = [("a", 0, "cmd one \\"), ("a", 1, "arg two"), ("a", 2, "solo")]
    out = {r["event_no"]: r["message"] for r in multiline_assemble(
        _lines(spark, rows), F.col("line").endswith("\\"),
        what="next").collect()}
    assert out == {1: "cmd one \\\narg two", 2: "solo"}


def test_groups_isolated_and_ordered(spark):
    rows = [("b", 1, "S b2"), ("a", 0, "S a1"), ("b", 0, "S b1"),
            ("a", 1, "  tail")]
    out = multiline_assemble(
        _lines(spark, rows), F.col("line").startswith("S")).collect()
    per = {(r["source"], r["event_no"]): r["message"] for r in out}
    assert per == {("a", 1): "S a1\n  tail", ("b", 1): "S b1", ("b", 2): "S b2"}


def test_validates_what():
    with pytest.raises(ValueError, match="what must be"):
        multiline_assemble(None, F.lit(True), what="sideways")


def test_single_exchange_plan(spark):
    df = _lines(spark, [("a", 0, "x")])
    plan = multiline_assemble(df, F.lit(True))._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1
