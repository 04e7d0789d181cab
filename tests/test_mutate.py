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


def test_prune_and_urldecode(spark):
    df = spark.createDataFrame(
        [("a%20b%2Fc", "x", "y", "z")],
        "url string, tmp_a string, tmp_b string, keep string")
    out = Mutate([("prune", r"^tmp_"), ("urldecode", "url")]).apply(df)
    assert out.columns == ["url", "keep"]
    assert _one(out)["url"] == "a b/c"
    # malformed percent-escape → null, not an exception
    bad = spark.createDataFrame([("%zz",)], "url string")
    assert _one(Mutate([("urldecode", "url")]).apply(bad))["url"] is None


def test_parse_date_first_match_wins(spark):
    from logstash_integration_jdbc_spark.functions.timezone import parse_date

    df = spark.createDataFrame(
        [(1, "2024-01-02 03:04:05"), (2, "02/Jan/2024 03:04:05"),
         (3, "1704164645"), (4, "not a date"), (5, None)],
        "id int, raw string")
    out = {r["id"]: r for r in parse_date(
        df, "raw",
        ["yyyy-MM-dd HH:mm:ss", "dd/MMM/yyyy HH:mm:ss", "UNIX"]).collect()}
    assert out[1]["parsed_ts"].year == 2024 and out[1]["parsed_ts"].day == 2
    assert out[2]["parsed_ts"].month == 1 and out[2]["parsed_ts"].hour == 3
    assert out[3]["parsed_ts"].year == 2024          # epoch seconds
    assert out[4]["parsed_ts"] is None
    assert "_dateparsefailure" in out[4]["tags"]
    assert out[5]["parsed_ts"] is None and out[5]["tags"] == []


def test_parse_date_unix_ms_and_validation(spark):
    import pytest as pt

    from logstash_integration_jdbc_spark.functions.timezone import parse_date

    df = spark.createDataFrame([("1704164645123",)], "raw string")
    r = parse_date(df, "raw", ["UNIX_MS"]).collect()[0]
    assert r["parsed_ts"].year == 2024 and r["parsed_ts"].microsecond == 123000
    with pt.raises(ValueError, match="at least one format"):
        parse_date(df, "raw", [])
