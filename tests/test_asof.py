"""As-of join: backward/forward, inclusive ties, null fill, collisions."""

from __future__ import annotations

import datetime as dt

import pytest

from logstash_integration_jdbc_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T00:00:00"), 1.0),
            ("A", _ts("2024-01-01T00:10:00"), 2.0),
            ("B", _ts("2024-01-01T00:05:00"), 9.0),
        ],
        "key string, ts timestamp, price double",
    )


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01T00:00:00")),   # tie → inclusive match 1.0
            (2, "A", _ts("2024-01-01T00:09:59")),   # before 2nd quote → 1.0
            (3, "A", _ts("2024-01-01T00:20:00")),   # after all → 2.0
            (4, "B", _ts("2024-01-01T00:00:00")),   # before B's only quote → null
            (5, "C", _ts("2024-01-01T00:00:00")),   # key with no quotes → null
        ],
        "trade_id bigint, key string, ts timestamp",
    )


def test_backward_inclusive(trades, quotes):
    out = {r.trade_id: r.price for r in
           asof_join(trades, quotes, on="ts", by="key").collect()}
    assert out == {1: 1.0, 2: 1.0, 3: 2.0, 4: None, 5: None}


def test_forward(trades, quotes):
    out = {r.trade_id: r.price for r in
           asof_join(trades, quotes, on="ts", by="key", direction="forward").collect()}
    # forward: earliest quote at-or-after the trade
    assert out == {1: 1.0, 2: 2.0, 3: None, 4: 9.0, 5: None}


def test_left_columns_preserved_and_prefix(trades, quotes):
    out = asof_join(trades, quotes, on="ts", by="key", right_prefix="q_")
    assert set(out.columns) == {"trade_id", "key", "ts", "q_price"}
    assert out.count() == 5


def test_collision_raises(trades, quotes):
    with pytest.raises(ValueError, match="collides"):
        asof_join(trades, quotes.withColumnRenamed("price", "trade_id"),
                  on="ts", by="key")


def test_bad_direction(trades, quotes):
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, direction="nearest", on="ts", by="key")


def test_multi_key_by(spark, trades, quotes):
    q2 = quotes.withColumn("venue", quotes.key.substr(1, 1))
    t2 = trades.withColumn("venue", trades.key.substr(1, 1))
    out = {r.trade_id: r.price for r in
           asof_join(t2, q2, on="ts", by=["key", "venue"]).collect()}
    assert out[1] == 1.0 and out[5] is None


def test_null_timestamps_never_match(spark):
    """NULL `on` semantics = DuckDB ASOF / pandas merge_asof: a right row
    with NULL ts matches nothing; a left row with NULL ts gets nulls."""
    left = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01T01:00:00")), (2, "A", None)],
        "trade_id bigint, key string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("A", None, 99.0), ("A", _ts("2024-01-01T00:30:00"), 1.0)],
        "key string, ts timestamp, price double",
    )
    back = {r.trade_id: r.price for r in
            asof_join(left, right, on="ts", by="key").collect()}
    assert back == {1: 1.0, 2: None}
    fwd_right = spark.createDataFrame(
        [("A", None, 99.0), ("A", _ts("2024-01-01T02:00:00"), 2.0)],
        "key string, ts timestamp, price double",
    )
    fwd = {r.trade_id: r.price for r in
           asof_join(left, fwd_right, on="ts", by="key", direction="forward").collect()}
    assert fwd == {1: 2.0, 2: None}


def test_exotic_column_names(spark):
    """Null-struct literals come from StructType objects, so spaces/commas
    in column names survive."""
    left = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01T01:00:00"))],
        ["my col, odd:name", "key", "ts"],
    )
    right = spark.createDataFrame(
        [("A", _ts("2024-01-01T00:00:00"), 5.0)],
        ["key", "ts", "weird value"],
    )
    out = asof_join(left, right, on="ts", by="key").collect()
    assert out[0]["weird value"] == 5.0 and out[0]["my col, odd:name"] == 1
