"""meter_rates (logstash-filter-metrics) tests."""

from __future__ import annotations

from datetime import datetime

import pytest

from logstash_integration_jdbc_spark.operators.metrics import meter_rates


def _ts(m, s=0):
    return datetime(2024, 1, 1, 0, m, s)


def test_meter_rates_exact_trailing(spark):
    rows = (
        [("a", _ts(0, i)) for i in range(6)]      # 6 events in minute 0
        + [("a", _ts(1, 30))]                     # 1 event in minute 1
        + [("a", _ts(4, 0))]                      # gap, then minute 4
        + [("b", _ts(0, 1))]
    )
    df = spark.createDataFrame(rows, "name string, ts timestamp")
    out = {(r["name"], r["bucket_ts"]): r
           for r in meter_rates(df, "ts", ["name"], flush_interval=60,
                                windows=(60, 300)).collect()}
    base = int(_ts(0).timestamp())
    a0 = out[("a", base)]
    assert a0["count"] == 6
    assert a0["rate_60s"] == round(6 / 60, 6)
    assert a0["rate_300s"] == round(6 / 300, 6)
    a1 = out[("a", base + 60)]
    assert a1["rate_60s"] == round(1 / 60, 6)   # only its own bucket
    assert a1["rate_300s"] == round(7 / 300, 6)
    a4 = out[("a", base + 240)]
    # trailing 300s at minute 4 covers minutes 0..4 inclusive → 8 events
    assert a4["rate_300s"] == round(8 / 300, 6)
    # trailing 60s at minute 4: the gap minutes contribute nothing
    assert a4["rate_60s"] == round(1 / 60, 6)
    assert out[("b", base)]["count"] == 1
    # empty buckets are absent, not zero rows
    assert ("a", base + 120) not in out


def test_meter_rates_validation(spark):
    df = spark.createDataFrame([("a", _ts(0))], "name string, ts timestamp")
    with pytest.raises(ValueError):
        meter_rates(df, "ts", ["name"], flush_interval=0)
    with pytest.raises(ValueError):
        meter_rates(df, "ts", ["name"], flush_interval=60, windows=(90,))


def test_meter_rates_single_window_pass(spark):
    df = spark.createDataFrame([("a", _ts(0))], "name string, ts timestamp")
    plan = meter_rates(df, "ts", ["name"])._jdf.queryExecution() \
        .executedPlan().toString()
    # all three range frames share one sort: exactly one Window node chain
    assert plan.count("Sort ") <= 2  # groupBy partial sort + one window sort
