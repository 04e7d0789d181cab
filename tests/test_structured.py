from __future__ import annotations

from pyspark.sql import functions as F

from logstash_integration_jdbc_spark.functions.structured import (
    csv_parse,
    json_parse,
    kv_parse,
)


def _one(df):
    return df.collect()[0].asDict()


# ---------------------------------------------------------------- kv


def test_kv_basic(spark):
    df = spark.createDataFrame([("a=1 b=two c=3",)], "text string")
    row = _one(kv_parse(df, "text", fields=["a", "c", "missing"]))
    assert row["kv"] == {"a": "1", "b": "two", "c": "3"}
    assert row["a"] == "1" and row["c"] == "3" and row["missing"] is None


def test_kv_options(spark):
    df = spark.createDataFrame([("[k1]='v1' [k2]='v2' junk=x",)], "text string")
    row = _one(kv_parse(
        df, "text", trim_key="[]", trim_value="'",
        include_keys=["k1", "k2"], prefix="p_"))
    assert row["kv"] == {"p_k1": "v1", "p_k2": "v2"}


def test_kv_exclude_and_custom_splits(spark):
    df = spark.createDataFrame([("a:1|b:2|c:3",)], "text string")
    row = _one(kv_parse(df, "text", field_split="|", value_split=":",
                        exclude_keys=["b"]))
    assert row["kv"] == {"a": "1", "c": "3"}


def test_kv_repeated_key_last_wins(spark):
    df = spark.createDataFrame([("a=1 a=2",)], "text string")
    assert _one(kv_parse(df, "text"))["kv"] == {"a": "2"}


def test_kv_no_python_in_plan(spark):
    df = spark.createDataFrame([("a=1",)], "text string")
    plan = kv_parse(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


# -------------------------------------------------------------- json


def test_json_merge_top_level(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 7, "name": "x"}'), (2, "not json"), (3, None)],
        "id int, props string")
    out = json_parse(df, "props", "k int, name string").orderBy("id").collect()
    assert out[0]["k"] == 7 and out[0]["name"] == "x" and out[0]["tags"] == []
    assert out[1]["k"] is None and "_jsonparsefailure" in out[1]["tags"]
    # null input is not a parse failure
    assert out[2]["tags"] == []


def test_json_target_nesting(spark):
    df = spark.createDataFrame([('{"k": 7}',)], "props string")
    row = _one(json_parse(df, "props", "k int", target="parsed"))
    assert row["parsed"].asDict() == {"k": 7}


# --------------------------------------------------------------- csv


def test_csv_typed_with_quotes(spark):
    df = spark.createDataFrame(
        [(1, '5,"hello, world",2.5'), (2, "bad,row")],
        "id int, line string")
    out = csv_parse(df, "line", "n int, s string, x double").orderBy("id").collect()
    assert out[0]["n"] == 5 and out[0]["s"] == "hello, world" and out[0]["x"] == 2.5
    assert out[0]["tags"] == []
    # type mismatch on a 2-field row against a 3-field schema → failure
    assert out[1]["n"] is None and "_csvparsefailure" in out[1]["tags"]


def test_csv_custom_sep_and_target(spark):
    df = spark.createDataFrame([("a|1",)], "line string")
    row = _one(csv_parse(df, "line", "s string, n int", sep="|", target="row"))
    assert row["row"].asDict() == {"s": "a", "n": 1}


# --------------------------------------------------------------- xml


def test_xml_elements_and_attributes(spark):
    from logstash_integration_jdbc_spark.functions.structured import xml_parse

    df = spark.createDataFrame(
        [(1, '<e type="click"><n>5</n><msg>hi</msg></e>'),
         (2, '<e type="view"><n>7</n></e>'),
         (3, "<e><broken")],
        "id int, payload string")
    out = xml_parse(df, "payload", "_type string, n int, msg string") \
        .orderBy("id").collect()
    assert (out[0]["_type"], out[0]["n"], out[0]["msg"]) == ("click", 5, "hi")
    assert out[0]["tags"] == []
    assert (out[1]["_type"], out[1]["msg"]) == ("view", None)  # absent key ≠ failure
    assert "_xmlparsefailure" not in out[1]["tags"]
    assert out[2]["n"] is None and "_xmlparsefailure" in out[2]["tags"]


def test_xml_target_nesting(spark):
    from logstash_integration_jdbc_spark.functions.structured import xml_parse

    df = spark.createDataFrame([("<e><n>3</n></e>",)], "payload string")
    row = _one(xml_parse(df, "payload", "n int", target="doc"))
    assert row["doc"]["n"] == 3
