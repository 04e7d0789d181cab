from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from logstash_integration_jdbc_spark.operators.network import cidr_enrich, ip_to_long
from logstash_integration_jdbc_spark.operators.throttle import (
    count_anomalies,
    throttle,
)


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


# ----------------------------------------------------------- throttle


def _mk_events(spark, rows):
    return spark.createDataFrame(rows, "id int, key string, ts timestamp")


def test_throttle_flags_beyond_max(spark):
    rows = [(i, "a", _ts(0, i)) for i in range(5)] + [(9, "b", _ts(0))]
    out = throttle(_mk_events(spark, rows), ["key"], period="1 hour",
                   max_count=3, order_cols=["id"]).orderBy("id").collect()
    flags = {r["id"]: r["throttled"] for r in out}
    assert flags == {0: False, 1: False, 2: False, 3: True, 4: True, 9: False}
    tagged = [r["id"] for r in out if "_throttled" in r["tags"]]
    assert tagged == [3, 4]


def test_throttle_resets_per_period(spark):
    rows = [(0, "a", _ts(0, 10)), (1, "a", _ts(0, 20)),
            (2, "a", _ts(1, 5)), (3, "a", _ts(1, 6))]
    out = throttle(_mk_events(spark, rows), ["key"], period="1 hour",
                   max_count=1, order_cols=["id"], tag=None)
    assert [r["throttled"] for r in out.orderBy("id").collect()] == \
        [False, True, False, True]


def test_throttle_tie_break_deterministic(spark):
    rows = [(5, "a", _ts(0)), (1, "a", _ts(0)), (3, "a", _ts(0))]
    out = throttle(_mk_events(spark, rows), ["key"], max_count=1,
                   order_cols=["id"], tag=None).orderBy("id").collect()
    assert [r["throttled"] for r in out] == [False, True, True]


def test_throttle_validates():
    with pytest.raises(ValueError, match="max_count"):
        throttle(None, ["k"], max_count=0)


# ----------------------------------------------- count_anomalies


def test_anomaly_flags_spike(spark):
    rows, rid = [], 0
    # key "a": 10 quiet hours of 5 events, then an hour with 50
    for h in range(10):
        for _ in range(5):
            rows.append((rid, "a", _ts(h))); rid += 1
    for _ in range(50):
        rows.append((rid, "a", _ts(10))); rid += 1
    out = count_anomalies(_mk_events(spark, rows), ["key"],
                          lookback=24, min_periods=6, z_thresh=3.0)
    got = {r["bucket"].hour: r for r in out.collect()}
    assert got[10]["is_anomaly"] is True and got[10]["z"] > 3
    assert all(not got[h]["is_anomaly"] for h in range(10))
    # warm-up: fewer than min_periods prior buckets → z null
    assert got[3]["z"] is None


def test_anomaly_constant_traffic_no_flag(spark):
    rows = [(h * 10 + i, "a", _ts(h)) for h in range(12) for i in range(4)]
    out = count_anomalies(_mk_events(spark, rows), ["key"],
                          min_periods=3).collect()
    # steady traffic: z = 0 via the sqrt(mean) floor, never flagged
    assert all(r["is_anomaly"] is False for r in out)
    assert all(r["z"] == 0.0 for r in out if r["z"] is not None)


def test_anomaly_current_bucket_excluded(spark):
    # 8 hours of 10, then a 100-spike: trailing mean must still be 10
    rows, rid = [], 0
    for h in range(8):
        for _ in range(10):
            rows.append((rid, "a", _ts(h))); rid += 1
    for _ in range(100):
        rows.append((rid, "a", _ts(8))); rid += 1
    got = {r["bucket"].hour: r for r in count_anomalies(
        _mk_events(spark, rows), ["key"], min_periods=4).collect()}
    assert got[8]["mean_n"] == pytest.approx(10.0)


# ----------------------------------------------------------- network


def test_ip_to_long(spark):
    df = spark.createDataFrame(
        [("1.2.3.4",), ("255.255.255.255",), ("0.0.0.0",),
         ("256.1.1.1",), ("1.2.3",), ("junk",), (None,)], "ip string")
    vals = [r[0] for r in df.select(ip_to_long(F.col("ip"))).collect()]
    assert vals == [16909060, 4294967295, 0, None, None, None, None]


NETS = [("10.0.0.0/8", "corp"), ("10.1.0.0/16", "corp-dc1"),
        ("192.168.0.0/16", "home")]


@pytest.mark.parametrize("method", ["case", "join"])
def test_cidr_most_specific_wins(spark, method):
    df = spark.createDataFrame(
        [(1, "10.1.2.3"), (2, "10.9.9.9"), (3, "192.168.5.1"),
         (4, "8.8.8.8"), (5, "bad-ip")], "id int, ip string")
    out = cidr_enrich(df, "ip", NETS, method=method, id_col="id")
    got = {r["id"]: r["network"] for r in out.collect()}
    assert got == {1: "corp-dc1", 2: "corp", 3: "home", 4: None, 5: None}


def test_cidr_join_preserves_rows_and_columns(spark):
    df = spark.createDataFrame([(1, "10.1.2.3", "x")], "id int, ip string, extra string")
    out = cidr_enrich(df, "ip", NETS, method="join", id_col="id")
    assert out.columns == ["id", "ip", "extra", "network"]
    assert out.count() == 1


def test_cidr_validation():
    with pytest.raises(ValueError, match="IPv4"):
        cidr_enrich(None, "ip", [("::1/128", "v6")])
    with pytest.raises(ValueError, match="id_col"):
        cidr_enrich(None, "ip", NETS, method="join")
    with pytest.raises(ValueError, match="host bits"):
        cidr_enrich(None, "ip", [("10.0.0.1/8", "bad")])


def test_cidr_case_is_map_only(spark):
    df = spark.createDataFrame([(1, "10.0.0.1")], "id int, ip string")
    plan = cidr_enrich(df, "ip", NETS)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


# ------------------------------------------------------------ elapsed


def _mk_tasks(spark, rows):
    return spark.createDataFrame(rows, "id int, task string, kind string, ts timestamp")


def test_elapsed_matched_pair(spark):
    from logstash_integration_jdbc_spark.operators.throttle import elapsed

    rows = [(0, "t1", "start", _ts(0)), (1, "t1", "end", _ts(0, 5)),
            (2, "t2", "start", _ts(1)), (3, "t3", "end", _ts(2))]
    out = {r["task"]: r for r in elapsed(
        _mk_tasks(spark, rows), F.col("kind") == "start",
        F.col("kind") == "end", "task").collect()}
    assert out["t1"]["status"] == "matched"
    assert out["t1"]["elapsed_s"] == 300.0
    assert out["t2"]["status"] == "start_only"
    assert out["t3"]["status"] == "end_only" and out["t3"]["elapsed_s"] is None


def test_elapsed_end_before_start_ignored(spark):
    from logstash_integration_jdbc_spark.operators.throttle import elapsed

    # end precedes every start → no cached start → not a match
    rows = [(0, "t", "end", _ts(0)), (1, "t", "start", _ts(1)),
            (2, "t", "end", _ts(3))]
    r = elapsed(_mk_tasks(spark, rows), F.col("kind") == "start",
                F.col("kind") == "end", "task").collect()[0]
    assert r["status"] == "matched"
    assert r["end_ts"].hour == 3 and r["elapsed_s"] == 7200.0


def test_elapsed_timeout_expiry(spark):
    from logstash_integration_jdbc_spark.operators.throttle import elapsed

    rows = [(0, "old", "start", _ts(0)), (1, "new", "start", _ts(9)),
            (2, "x", "other", _ts(10))]
    out = {r["task"]: r["status"] for r in elapsed(
        _mk_tasks(spark, rows), F.col("kind") == "start",
        F.col("kind") == "end", "task", timeout="2 hours").collect()}
    # batch max ts = 10:00; "old" started 10h ago → expired; "new" 1h ago
    assert out == {"old": "expired", "new": "start_only"}
    # the no-start-no-end id ("x") produced no row
    assert "x" not in out


def test_elapsed_single_exchange_plan(spark):
    from logstash_integration_jdbc_spark.operators.throttle import elapsed

    df = _mk_tasks(spark, [(0, "t", "start", _ts(0))])
    plan = elapsed(df, F.col("kind") == "start", F.col("kind") == "end",
                   "task")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


# ------------------------------------------------------------------ geoip


def test_geoip_lookup_basic_and_bucket_spanning(spark):
    from logstash_integration_jdbc_spark.operators.network import geoip_lookup

    # range B spans multiple /16 buckets; C is outside every range
    geo = spark.createDataFrame(
        [(0, 255, "US", "nyc"),                      # tiny range in bucket 0
         (100_000, 400_000, "DE", "ber"),            # spans buckets 1..6
         (4_000_000_000, 4_000_100_000, "JP", "tok")],
        "lo long, hi long, country string, city string")
    df = spark.createDataFrame(
        [(1, "0.0.0.10"),        # 10 → US/nyc
         (2, "0.3.13.64"),       # 200000 → DE/ber (mid-range, bucket 3)
         (3, "0.6.26.128"),      # 400000 → DE/ber (inclusive hi)
         (4, "0.6.26.129"),      # 400001 → no match
         (5, "238.107.40.0"),    # 4000000000 → JP/tok
         (6, "999.1.2.3"),       # malformed → null ip → no match
         (7, None)],
        "id int, ip string")
    out = {r["id"]: (r["country"], r["city"])
           for r in geoip_lookup(df, "ip", geo).collect()}
    assert out[1] == ("US", "nyc")
    assert out[2] == ("DE", "ber")
    assert out[3] == ("DE", "ber")
    assert out[4] == (None, None)
    assert out[5] == ("JP", "tok")
    assert out[6] == (None, None)
    assert out[7] == (None, None)
    assert len(out) == 7  # left semantics: every row survives


def test_geoip_lookup_plan_is_equi_join(spark):
    from logstash_integration_jdbc_spark.operators.network import geoip_lookup

    geo = spark.createDataFrame([(0, 65535, "US", "x")],
                                "lo long, hi long, country string, city string")
    df = spark.createDataFrame([(1, "0.0.0.1")], "id int, ip string")
    plan = geoip_lookup(df, "ip", geo)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan          # equi-join on the bucket
    assert "BroadcastNestedLoopJoin" not in plan  # NOT a range nested loop


def test_geoip_lookup_needs_attrs(spark):
    from logstash_integration_jdbc_spark.operators.network import geoip_lookup

    geo = spark.createDataFrame([(0, 1, "US")], "lo long, hi long, c string")
    df = spark.createDataFrame([(1, "0.0.0.1")], "id int, ip string")
    import pytest as _pt
    with _pt.raises(ValueError):
        geoip_lookup(df, "ip", geo, attrs=())
