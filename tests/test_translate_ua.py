"""translate / useragent / syslog_pri / uuid filter parity tests."""

from __future__ import annotations

import uuid as pyuuid

import pytest
from pyspark.sql import functions as F

from logstash_integration_jdbc_spark.functions.ids import stamp_uuid, uuid3_expr
from logstash_integration_jdbc_spark.functions.syslog import (
    FACILITY_LABELS,
    SEVERITY_LABELS,
    parse_syslog_line,
    syslog_pri,
)
from logstash_integration_jdbc_spark.functions.useragent import parse_useragent
from logstash_integration_jdbc_spark.operators.translate import (
    translate_field,
    translate_regex,
    translate_with_table,
)


# ---------------------------------------------------------------- translate

def test_translate_exact_and_fallback(spark):
    df = spark.createDataFrame(
        [(1, "error"), (2, "click"), (3, None), (4, "weird")],
        "id int, et string")
    out = translate_field(df, "et", {"error": "E", "click": "C"},
                          dest="label", fallback="UNK").orderBy("id").collect()
    assert [r["label"] for r in out] == ["E", "C", "UNK", "UNK"]


def test_translate_no_fallback_leaves_null(spark):
    df = spark.createDataFrame([(1, "x")], "id int, et string")
    out = translate_field(df, "et", {"error": "E"}, dest="label").collect()
    assert out[0]["label"] is None


def test_translate_override_false_keeps_existing(spark):
    df = spark.createDataFrame(
        [(1, "error", "KEEP"), (2, "error", None)],
        "id int, et string, label string")
    out = translate_field(df, "et", {"error": "E"}, dest="label",
                          override=False).orderBy("id").collect()
    assert [r["label"] for r in out] == ["KEEP", "E"]


def test_translate_regex_first_match_wins(spark):
    df = spark.createDataFrame(
        [(1, "GET /api/users"), (2, "GET /static/app.css"), (3, "POST /api/x")],
        "id int, path string")
    out = translate_regex(
        df, "path",
        {r"^GET /api/": "api-read", r"/api/": "api", r"\.css$": "asset"},
        dest="kind", fallback="other").orderBy("id").collect()
    assert [r["kind"] for r in out] == ["api-read", "asset", "api"]


def test_translate_with_table_broadcast(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "z")],
                               "id int, k string")
    dim = spark.createDataFrame([("a", "A"), ("b", "B"), ("b", "B2")],
                                "k string, v string")
    out = translate_with_table(df, "k", dim, "k", "v", dest="t",
                               fallback="?").orderBy("id")
    assert [r["t"] for r in out.collect()] == ["A", "B", "?"]
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()
    assert translate_with_table(df, "k", dim, "k", "v").columns == \
        ["id", "k", "translation"]


def test_translate_empty_dict_raises(spark):
    df = spark.createDataFrame([(1, "a")], "id int, k string")
    with pytest.raises(ValueError):
        translate_field(df, "k", {})
    with pytest.raises(ValueError):
        translate_regex(df, "k", {})


# ---------------------------------------------------------------- useragent

_UAS = [
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
     "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
     "Chrome", "120", "Windows", "Other"),
    ("Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 (KHTML, like Gecko) "
     "Chrome/119.0.0.0 Safari/537.36 Edge/119.0.2151.97",
     "Edge", "119", "Windows", "Other"),
    ("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) "
     "Chrome/108.0.0.0 Safari/537.36 OPR/94.0.0.0",
     "Opera", "94", "Linux", "Other"),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) "
     "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Mobile/15E148 "
     "Safari/604.1",
     "Mobile Safari", "17", "iOS", "iPhone"),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
     "(KHTML, like Gecko) Version/16.6 Safari/605.1.15",
     "Mobile Safari", "16", "Mac OS X", "Other"),
    ("Mozilla/5.0 (Linux; Android 13; Pixel 7) AppleWebKit/537.36 "
     "(KHTML, like Gecko) Chrome/118.0.0.0 Mobile Safari/537.36",
     "Chrome Mobile", "118", "Android", "Android Mobile"),
    ("Mozilla/5.0 (Windows NT 6.1; Trident/7.0; rv:11.0) like Gecko",
     "IE", "11", "Windows", "Other"),
    ("Mozilla/5.0 (X11; Ubuntu; Linux x86_64; rv:109.0) Gecko/20100101 "
     "Firefox/119.0",
     "Firefox", "119", "Linux", "Other"),
    ("Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
     "Spider", None, "Other", "Spider"),
    ("curl/8.4.0", "Other", None, "Other", "Other"),
]


def test_useragent_families(spark):
    df = spark.createDataFrame(
        [(i, ua) for i, (ua, *_ ) in enumerate(_UAS)], "id int, ua string")
    out = parse_useragent(df, "ua", target=None).orderBy("id").collect()
    for row, (_, fam, major, osn, dev) in zip(out, _UAS):
        assert row["name"] == fam, row["ua"]
        assert row["major"] == major, row["ua"]
        assert row["os_name"] == osn, row["ua"]
        assert row["device"] == dev, row["ua"]


def test_useragent_nested_target(spark):
    df = spark.createDataFrame([(1, _UAS[0][0])], "id int, ua string")
    out = parse_useragent(df, "ua").collect()[0]
    assert out["user_agent"]["name"] == "Chrome"
    assert out["user_agent"]["major"] == "120"


# ---------------------------------------------------------------- syslog

def test_syslog_pri_decode(spark):
    df = spark.createDataFrame([(0,), (13,), (165,), (191,), (200,), (None,)],
                               "pri int")
    out = syslog_pri(df, "pri").collect()
    got = {r["pri"]: (r["syslog_facility_code"], r["syslog_severity_code"],
                      r["syslog_facility"], r["syslog_severity"]) for r in out}
    assert got[0] == (0, 0, "kernel", "emergency")
    assert got[13] == (1, 5, "user-level", "notice")
    assert got[165] == (20, 5, "local4", "notice")
    assert got[191] == (23, 7, "local7", "debug")
    assert got[200] == (None, None, None, None)  # out of range
    assert got[None] == (None, None, None, None)
    assert len(FACILITY_LABELS) == 24 and len(SEVERITY_LABELS) == 8


def test_parse_syslog_line(spark):
    lines = [
        (1, "<13>Oct 11 22:14:15 host1 sshd[4123]: Accepted publickey"),
        (2, "<165>Jan  3 07:02:09 web-02 nginx: GET /health 200"),
        (3, "not syslog at all"),
    ]
    df = spark.createDataFrame(lines, "id int, line string")
    out = {r["id"]: r for r in parse_syslog_line(df, "line").collect()}
    r = out[1]
    assert (r["syslog_pri_raw"], r["syslog_hostname"], r["syslog_program"],
            r["syslog_pid"]) == (13, "host1", "sshd", 4123)
    assert r["syslog_message"] == "Accepted publickey"
    assert r["syslog_severity"] == "notice"
    r2 = out[2]
    assert (r2["syslog_program"], r2["syslog_pid"]) == ("nginx", None)
    assert r2["syslog_facility"] == "local4"
    assert out[3]["syslog_hostname"] is None
    assert "_syslogfailure" in out[3]["tags"]
    assert "_syslogfailure" not in (out[1]["tags"] or [])


# ---------------------------------------------------------------- uuid

def test_uuid3_matches_rfc4122_shape_and_is_deterministic(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "id int")
    out = stamp_uuid(df, "id").collect()
    seen = set()
    for r in out:
        u = pyuuid.UUID(r["uuid"])  # parses → well-formed
        assert u.version == 3
        assert u.variant == pyuuid.RFC_4122
        seen.add(r["uuid"])
    assert len(seen) == 50
    again = {r["id"]: r["uuid"] for r in stamp_uuid(df, "id").collect()}
    assert all(again[r["id"]] == r["uuid"] for r in out)


def test_uuid_overwrite_false_and_random(spark):
    df = spark.createDataFrame([(1, "keep-me"), (2, None)],
                               "id int, uuid string")
    out = {r["id"]: r["uuid"]
           for r in stamp_uuid(df, "id", overwrite=False).collect()}
    assert out[1] == "keep-me" and out[2] is not None
    rnd = stamp_uuid(df.drop("uuid"), random=True).collect()
    assert all(pyuuid.UUID(r["uuid"]).version == 4 for r in rnd)
    with pytest.raises(ValueError):
        stamp_uuid(df.drop("uuid"))


def test_uuid3_multi_column_key(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b")], "id int, k string")
    out = {(r["id"], r["k"]): r["uuid"]
           for r in stamp_uuid(df, "id", "k").collect()}
    assert out[(1, "a")] != out[(1, "b")]
