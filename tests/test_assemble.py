"""Conversation assembly: ordering, token budgets, max_turns cap."""

from __future__ import annotations

import datetime

from logstash_integration_jdbc_spark.operators.assemble import assemble_conversations


def df_of(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("c1", 2, "assistant", "three words here", t0 + datetime.timedelta(minutes=2)),
        ("c1", 0, "user", "hello", t0),
        ("c1", 1, "assistant", "hi there", t0 + datetime.timedelta(minutes=1)),
        ("c2", 0, "user", "solo", t0),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    )


def test_document_ordered_by_turn_idx(spark):
    out = {r.conv_id: r for r in assemble_conversations(df_of(spark)).collect()}
    assert out["c1"].document == "user: hello\nassistant: hi there\nassistant: three words here"
    assert out["c1"].n_turns == 3
    assert out["c1"].n_tokens == 1 + 2 + 3
    assert out["c1"].first_ts < out["c1"].last_ts
    assert out["c2"].document == "user: solo"


def test_max_turns_caps_document(spark):
    out = {r.conv_id: r for r in
           assemble_conversations(df_of(spark), max_turns=2).collect()}
    assert out["c1"].document == "user: hello\nassistant: hi there"
    assert out["c1"].n_tokens == 3  # tokens follow the cap
    assert out["c1"].n_turns == 3   # raw turn count still reported


def test_jvm_only(spark):
    plan = assemble_conversations(df_of(spark))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
