from __future__ import annotations

import pytest

from logstash_integration_jdbc_spark.operators.mutate import Mutate


def _one(df):
    return df.collect()[0].asDict()


def test_rename_copy_remove(spark):
    df = spark.createDataFrame([(1, "x")], "a int, b string")
    out = Mutate([("rename", "a", "n"), ("copy", "b", "b2"),
                  ("remove", "b")]).apply(df)
    assert out.columns == ["n", "b2"]
    assert _one(out) == {"n": 1, "b2": "x"}


def test_convert_types(spark):
    df = spark.createDataFrame(
        [("42", "2,5", "1.234,56", "yes", "junk")],
        "i string, f string, feu string, b string, bad string")
    row = _one(Mutate([
        ("convert", "i", "integer"),
        ("convert", "f", "float"),   # plain float: dot-less comma form stays null
        ("convert", "feu", "float_eu"),
        ("convert", "b", "boolean"),
        ("convert", "bad", "integer"),
    ]).apply(df))
    assert row["i"] == 42
    assert row["f"] is None          # "2,5" is not a dot-decimal
    assert row["feu"] == pytest.approx(1234.56)
    assert row["b"] is True
    assert row["bad"] is None


def test_convert_unknown_type_raises(spark):
    df = spark.createDataFrame([("1",)], "a string")
    with pytest.raises(ValueError, match="unknown type"):
        Mutate([("convert", "a", "short")]).apply(df)
    with pytest.raises(ValueError, match="unknown mutate op"):
        Mutate([("frobnicate", "a")])


def test_gsub_case_strip(spark):
    df = spark.createDataFrame([("  Hello-World  ",)], "s string")
    row = _one(Mutate([
        ("strip", "s"),
        ("gsub", "s", "-", " "),
        ("lowercase", "s"),
    ]).apply(df))
    assert row["s"] == "hello world"
    row2 = _one(Mutate([("capitalize", "s"), ("uppercase", "s")]).apply(df))
    assert row2["s"] == "  HELLO-WORLD  "


def test_split_join_merge(spark):
    df = spark.createDataFrame([("a.b.c", "z")], "parts string, extra string")
    out = Mutate([("split", "parts", ".")]).apply(df)
    assert _one(out)["parts"] == ["a", "b", "c"]
    row = _one(Mutate([
        ("split", "parts", "."),
        ("merge", "parts", "extra"),
        ("join", "parts", "|"),
    ]).apply(df))
    assert row["parts"] == "a|b|c|z"


def test_replace_update_add_field_interpolation(spark):
    df = spark.createDataFrame([(1, "alice", None), (2, None, "keep")],
                               "id int, user string, note string")
    out = Mutate([
        ("replace", "greeting", "hi %{user}"),
        ("update", "user", "u-%{id}"),
        ("add_field", "note", "auto-%{id}"),
    ]).apply(df).orderBy("id").collect()
    assert out[0]["greeting"] == "hi alice"
    assert out[0]["user"] == "u-1"          # update touches non-null
    assert out[0]["note"] == "auto-1"       # add_field fills null
    assert out[1]["user"] is None           # update skips null
    assert out[1]["note"] == "keep"         # add_field keeps existing


def test_order_is_list_order(spark):
    df = spark.createDataFrame([("ab",)], "s string")
    # uppercase-then-gsub differs from gsub-then-uppercase
    assert _one(Mutate([("uppercase", "s"), ("gsub", "s", "AB", "x")]).apply(df))["s"] == "x"
    assert _one(Mutate([("gsub", "s", "AB", "x"), ("uppercase", "s")]).apply(df))["s"] == "AB"


def test_no_python_in_plan(spark):
    df = spark.createDataFrame([("a", "1")], "s string, n string")
    out = Mutate([("convert", "n", "integer"), ("uppercase", "s"),
                  ("replace", "t", "%{s}-%{n}")]).apply(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
