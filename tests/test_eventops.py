from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logstash_integration_jdbc_spark.operators.eventops import (
    clone_events,
    drop_events,
    split_events,
)


def test_split_events_basic(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, []), (3, None), (4, ["c"])],
        "id int, items array<string>")
    out = split_events(df, "items").orderBy("id", "items").collect()
    assert [(r["id"], r["items"]) for r in out] == [(1, "a"), (1, "b"), (4, "c")]


def test_split_events_target_and_position(spark):
    df = spark.createDataFrame([(1, ["x", "y"])], "id int, items array<string>")
    out = split_events(df, "items", target="item", keep_position=True) \
        .orderBy("item_pos").collect()
    assert [(r["item_pos"], r["item"]) for r in out] == [(0, "x"), (1, "y")]
    assert "items" in out[0].asDict()  # original kept when target differs


def test_clone_events_single_scan(spark):
    df = spark.createDataFrame([(1,), (2,)], "id int")
    out = clone_events(df, ["audit", "archive"]).collect()
    assert len(out) == 6
    by_type = {}
    for r in out:
        by_type.setdefault(r["type"], []).append(r)
    assert set(by_type) == {None, "audit", "archive"}
    assert all(r["tags"] == [] for r in by_type[None])
    assert all(r["tags"] == ["audit"] for r in by_type["audit"])
    # one scan: no Union in the plan
    plan = clone_events(df, ["a", "b"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Union" not in plan
    with pytest.raises(ValueError, match="at least one"):
        clone_events(df, [])


def test_clone_events_without_original(spark):
    df = spark.createDataFrame([(1,)], "id int")
    out = clone_events(df, ["only"], keep_original=False).collect()
    assert len(out) == 1 and out[0]["type"] == "only"


def test_drop_events(spark):
    df = spark.createDataFrame(
        [(i, "err" if i % 2 else "ok") for i in range(10)], "id int, kind string")
    kept = drop_events(df, F.col("kind") == "err").collect()
    assert all(r["kind"] == "ok" for r in kept) and len(kept) == 5
    # null condition rows are kept (logstash: condition false-ish)
    dfn = spark.createDataFrame([(1, None), (2, "err")], "id int, kind string")
    assert {r["id"] for r in drop_events(dfn, F.col("kind") == "err").collect()} == {1}


def test_drop_events_percentage_deterministic(spark):
    df = spark.createDataFrame([(i, "err") for i in range(1000)], "id int, kind string")
    a = {r["id"] for r in drop_events(df, F.col("kind") == "err",
                                      percentage=40.0, id_col="id").collect()}
    b = {r["id"] for r in drop_events(df, F.col("kind") == "err",
                                      percentage=40.0, id_col="id").collect()}
    assert a == b                       # rerun drops the same rows
    assert 500 < len(a) < 700           # ~60% kept
    with pytest.raises(ValueError, match="id_col"):
        drop_events(df, F.col("kind") == "err", percentage=50.0)
