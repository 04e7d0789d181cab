"""truncate / de_dot / json_encode / environment / range filter tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from logstash_integration_jdbc_spark.operators.fieldops import (
    add_environment,
    de_dot,
    json_encode,
    range_check,
    truncate_bytes,
    truncate_fields,
)


def test_truncate_utf8_boundary_safety(spark):
    rows = [
        (1, "abcdefgh"),          # pure ASCII: cut at exactly 5 bytes
        (2, "aé€😀x"),            # 1+2+3+4+1 bytes = 11
        (3, "éééé"),              # 2-byte chars: odd cut must step back
        (4, None),
        (5, "ab"),                # shorter than limit: unchanged
    ]
    df = spark.createDataFrame(rows, "id int, s string")
    out = {r["id"]: r["s"]
           for r in truncate_fields(df, ["s"], 5).collect()}
    assert out[1] == "abcde"
    assert out[2] == "aé"        # 5 bytes would split '€' (starts at byte 4)
    assert out[3] == "éé"        # 5th byte is mid-char → back to 4
    assert out[4] is None
    assert out[5] == "ab"
    # every result re-encodes within the budget and round-trips losslessly
    for v in out.values():
        if v is not None:
            assert len(v.encode("utf-8")) <= 5


def test_truncate_validation(spark):
    with pytest.raises(ValueError):
        truncate_bytes(F.col("x"), 3)


def test_de_dot(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["a.b", "c", "d.e.f"])
    out = de_dot(df)
    assert out.columns == ["a_b", "c", "d_e_f"]
    with pytest.raises(ValueError):
        de_dot(df, nested=True)


def test_json_encode(spark):
    df = spark.createDataFrame([(1, "x")], "id int, name string")
    row = json_encode(df, ["id", "name"]).collect()[0]
    assert row["json"] == '{"id":1,"name":"x"}'
    with pytest.raises(ValueError):
        json_encode(df, [])


def test_add_environment(spark):
    os.environ["LJSPARK_TEST_VAR"] = "hello"
    try:
        df = spark.createDataFrame([(1,)], "id int")
        out = add_environment(
            df, {"greeting": "LJSPARK_TEST_VAR", "missing": "LJSPARK_NOPE"},
            default="dflt").collect()[0]
        assert out["greeting"] == "hello"
        assert out["missing"] == "dflt"
    finally:
        del os.environ["LJSPARK_TEST_VAR"]


def test_range_check_numeric_and_string_length(spark):
    df = spark.createDataFrame(
        [(1, 50, "abc"), (2, 500, "abc"), (3, 50, "toolongvalue"), (4, None, "ab")],
        "id int, v int, s string")
    out = {r["id"]: (r["range_ok"], r["tags"])
           for r in range_check(df, [("v", 0, 100), ("s", 1, 5)]).collect()}
    assert out[1] == (True, [])
    assert out[2][0] is False and "_rangeviolation" in out[2][1]
    assert out[3][0] is False
    assert out[4][0] is False    # null fails the band, like a missing field
    with pytest.raises(ValueError):
        range_check(df, [])
    with pytest.raises(ValueError):
        range_check(df, [("nope", 0, 1)])
