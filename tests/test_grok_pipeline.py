"""GrokPipeline: multi-pattern match, break_on_match, _grokparsefailure."""

from __future__ import annotations

from logstash_integration_jdbc_spark.functions.parse import GrokPipeline


def rows(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_first_match_wins_and_failure_tagged(spark):
    gp = GrokPipeline(
        patterns=[
            "tool_call=%{NOTSPACE:tool_call} status=%{WORD:status}",
            "TOOL:%{WORD:tool_call}",
        ],
        tag_on_failure=("_grokparsefailure",),
    )
    df = rows(spark, [
        "x tool_call=search status=ok y",   # pattern 1
        "z TOOL:bash w",                     # pattern 2 (no status)
        "nothing to see",                    # miss
    ])
    out = {r.text.split()[0]: r for r in gp.apply(df).collect()}
    assert out["x"].tool_call == "search" and out["x"].status == "ok"
    assert out["x"].parse_ok and out["x"].tags == []
    assert out["z"].tool_call == "bash" and out["z"].status is None
    assert out["z"].parse_ok
    assert not out["nothing"].parse_ok
    assert out["nothing"].tags == ["_grokparsefailure"]
    assert out["nothing"].tool_call is None


def test_break_on_match_prefers_earlier_pattern(spark):
    # both patterns match; break_on_match=True → pattern 1's capture wins
    gp = GrokPipeline(
        patterns=["id=%{INT:val}", "val %{WORD:val}"],
        tag_on_failure=(),
    )
    df = rows(spark, ["val id=42 here"])
    assert gp.apply(df).first().val == "42"


def test_no_break_fills_fields_from_all_patterns(spark):
    gp = GrokPipeline(
        patterns=["id=%{INT:id}", "name=%{WORD:name}"],
        break_on_match=False, tag_on_failure=(),
    )
    r = gp.apply(rows(spark, ["id=7 name=alpha"])).first()
    assert r.id == "7" and r.name == "alpha"


def test_stays_jvm_side(spark):
    gp = GrokPipeline(patterns=["a=%{INT:a}", "b=%{WORD:b}"])
    plan = gp.apply(rows(spark, ["a=1"]))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
