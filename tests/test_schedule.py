"""S8 scheduled re-execution: cron subset + the three rufus timing modes.

Reference semantics under test (spec analog: jdbc input `schedule`
config, /root/reference/lib/logstash/inputs/jdbc.rb:176-195, :339-352,
exclusivity :258-259; scheduling spec
/root/reference/spec/inputs/jdbc_spec.rb "should properly schedule").
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from logstash_integration_jdbc_spark.streaming.schedule import (
    CronLine,
    Scheduler,
    parse_duration,
)

UTC = timezone.utc


def dt(*a):
    return datetime(*a, tzinfo=UTC)


# -- durations ---------------------------------------------------------------

@pytest.mark.parametrize("spec,sec", [
    ("1m", 60.0), ("90s", 90.0), ("1h30m", 5400.0), ("2d", 172800.0),
    ("45", 45.0), (45, 45.0), (1.5, 1.5), ("0.5m", 30.0),
])
def test_parse_duration(spec, sec):
    assert parse_duration(spec) == sec


@pytest.mark.parametrize("bad", ["", "abc", "1x", "m1"])
def test_parse_duration_rejects(bad):
    with pytest.raises(ValueError):
        parse_duration(bad)


# -- cron parsing / next_time ------------------------------------------------

def test_every_minute():
    c = CronLine.parse("* * * * *")
    assert c.next_time(dt(2024, 3, 1, 12, 0, 30)) == dt(2024, 3, 1, 12, 1)
    # strictly-after: an exact boundary advances to the next slot
    assert c.next_time(dt(2024, 3, 1, 12, 1)) == dt(2024, 3, 1, 12, 2)


def test_steps_ranges_lists():
    c = CronLine.parse("*/15 9-17 * * *")
    assert c.next_time(dt(2024, 3, 1, 8, 50)) == dt(2024, 3, 1, 9, 0)
    assert c.next_time(dt(2024, 3, 1, 9, 1)) == dt(2024, 3, 1, 9, 15)
    assert c.next_time(dt(2024, 3, 1, 17, 46)) == dt(2024, 3, 2, 9, 0)
    c2 = CronLine.parse("5,35 0 1 * *")
    assert c2.next_time(dt(2024, 2, 1, 0, 6)) == dt(2024, 2, 1, 0, 35)
    assert c2.next_time(dt(2024, 2, 2, 0, 0)) == dt(2024, 3, 1, 0, 5)


def test_month_and_leap_day():
    c = CronLine.parse("0 0 29 2 *")
    assert c.next_time(dt(2023, 3, 1)) == dt(2024, 2, 29)
    # next one after 2024 is 2028
    assert c.next_time(dt(2024, 3, 1)) == dt(2028, 2, 29)


def test_dow_and_sunday_alias():
    mon = CronLine.parse("0 9 * * 1")
    assert mon.next_time(dt(2024, 3, 1, 10)) == dt(2024, 3, 4, 9)  # Fri→Mon
    sun7 = CronLine.parse("0 9 * * 7")
    sun0 = CronLine.parse("0 9 * * 0")
    assert sun7.next_time(dt(2024, 3, 1)) == sun0.next_time(dt(2024, 3, 1)) \
        == dt(2024, 3, 3, 9)


def test_vixie_dom_dow_or_rule():
    # both restricted → fires on the 13th OR any Friday
    c = CronLine.parse("0 0 13 * 5")
    assert c.next_time(dt(2024, 9, 9)) == dt(2024, 9, 13)       # Fri the 13th
    assert c.next_time(dt(2024, 9, 13)) == dt(2024, 9, 20)      # next Friday
    assert c.next_time(dt(2024, 10, 5)) == dt(2024, 10, 11)     # Fri before 13th


def test_six_field_seconds():
    c = CronLine.parse("*/20 * * * * *")
    assert c.has_seconds
    assert c.next_time(dt(2024, 3, 1, 0, 0, 0)) == dt(2024, 3, 1, 0, 0, 20)
    assert c.next_time(dt(2024, 3, 1, 0, 0, 41)) == dt(2024, 3, 1, 0, 1, 0)


@pytest.mark.parametrize("bad", ["* * * *", "61 * * * *", "* * 0 * *",
                                 "* * * 13 *", "x * * * *", "1-0 * * * *"])
def test_cron_rejects(bad):
    with pytest.raises(ValueError):
        CronLine.parse(bad)


def test_impossible_date_raises():
    with pytest.raises(ValueError, match="never fires"):
        CronLine.parse("0 0 30 2 *").next_time(dt(2024, 1, 1))


# -- scheduler loop (simulated clock) ---------------------------------------

class FakeClock:
    def __init__(self, t0: float = 1_700_000_000.0):
        self.t = t0

    def __call__(self) -> float:
        return self.t

    def sleep(self, s: float) -> None:
        assert s >= 0
        self.t += s


def test_exclusivity_error():
    with pytest.raises(ValueError, match="only one of"):
        Scheduler(lambda: None, schedule="* * * * *", interval="1m")


def test_no_mode_runs_once():
    calls = []
    s = Scheduler(calls.append and (lambda: calls.append(1)))
    assert s.run() == 1 and calls == [1]


def test_period_fixed_grid_skips_missed_slots():
    clk = FakeClock(t0=1000.0)

    def job():
        # first run overruns 2.5 periods; later runs are instant
        if sched.runs == 1:
            clk.t += 25.0

    sched = Scheduler(job, period=10, clock=clk, sleep=clk.sleep)
    sched.run(max_runs=3)
    # grid anchored at 1000: fire@1010 (ends 1035), slot 1020/1030 missed
    # → next grid point 1040, then 1050
    assert sched.fire_times == [1010.0, 1040.0, 1050.0]


def test_interval_measures_from_completion():
    clk = FakeClock(t0=0.0)

    def job():
        clk.t += 7.0  # each run takes 7 s

    sched = Scheduler(job, interval="10s", clock=clk, sleep=clk.sleep)
    sched.run(max_runs=3)
    # start-to-start = run time + gap = 17 s
    assert sched.fire_times == [10.0, 27.0, 44.0]


def test_cron_mode_fires_on_calendar_minutes():
    t0 = datetime(2024, 3, 1, 12, 0, 30, tzinfo=UTC).timestamp()
    clk = FakeClock(t0=t0)
    sched = Scheduler(lambda: None, schedule="*/2 * * * *",
                      clock=clk, sleep=clk.sleep)
    sched.run(max_runs=2)
    fired = [datetime.fromtimestamp(t, UTC) for t in sched.fire_times]
    assert fired == [dt(2024, 3, 1, 12, 2), dt(2024, 3, 1, 12, 4)]


def test_stop_from_job():
    sched = Scheduler(lambda: sched.stop(), period=1,
                      clock=FakeClock(), sleep=FakeClock().sleep)
    # stop() after the first fire exits despite no max_runs
    sched2_clk = FakeClock()
    sched = Scheduler(lambda: sched.stop(), period=1,
                      clock=sched2_clk, sleep=sched2_clk.sleep)
    assert sched.run() == 1


# -- integration: scheduler drives incremental pipeline runs ----------------

def test_scheduled_incremental_runs(spark, tmp_path):
    """Two scheduled fires ≡ two cron re-runs of the incremental scan:
    the second picks up only rows past the persisted watermark."""
    import pyspark.sql.functions as F

    from logstash_integration_jdbc_spark.sources.scan import (
        incremental_scan,
        max_watermark,
    )
    from logstash_integration_jdbc_spark.sources.value_tracking import ValueTracker

    data = tmp_path / "events"
    ckpt = tmp_path / "ckpt.json"
    spark.range(10).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
    ).write.mode("overwrite").parquet(str(data))

    seen: list[int] = []

    def job():
        tracker = ValueTracker(path=str(ckpt), tracking_type="timestamp")
        df = incremental_scan(
            spark.read.parquet(str(data)), "ts", tracker.value)
        seen.append(df.count())
        tracker.set_value(max_watermark(df, "ts"))
        tracker.write()
        # between fires: 5 new rows land
        if len(seen) == 1:
            spark.range(10, 15).select(
                F.col("id").alias("event_id"),
                F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
            ).write.mode("append").parquet(str(data))

    clk = FakeClock()
    sched = Scheduler(job, schedule="* * * * *", clock=clk, sleep=clk.sleep)
    sched.run(max_runs=3)
    assert seen == [10, 5, 0]


class TestCronTimezone:
    def test_trailing_tz_parsed(self):
        from zoneinfo import ZoneInfo

        cl = CronLine.parse("0 9 * * * America/Chicago")
        assert cl.tz == ZoneInfo("America/Chicago")
        assert cl.hours == frozenset({9}) and not cl.has_seconds
        # 6-field (seconds) + tz also parses
        cl6 = CronLine.parse("30 0 9 * * * Europe/Paris")
        assert cl6.has_seconds and cl6.tz == ZoneInfo("Europe/Paris")

    def test_unknown_tz_rejected(self):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="Not/AZone"):
            CronLine.parse("0 9 * * * Not/AZone")

    def test_named_dow_and_month_tokens(self):
        # standard cron name tokens are cron FIELDS, not timezones
        cl = CronLine.parse("0 9 * * MON")
        assert cl.tz is None and cl.weekdays == frozenset({1})
        cl = CronLine.parse("0 9 * JAN,jul SUN-TUE")
        assert cl.months == frozenset({1, 7})
        assert cl.weekdays == frozenset({0, 1, 2})
        # a name token AND a trailing tz coexist
        from zoneinfo import ZoneInfo

        cl = CronLine.parse("0 9 * * FRI America/Chicago")
        assert cl.tz == ZoneInfo("America/Chicago")
        assert cl.weekdays == frozenset({5})

    def test_bad_name_token_is_field_error(self):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="cron"):
            CronLine.parse("0 9 * * XYZ")

    def test_next_time_across_spring_forward(self):
        """2026-03-08 02:00 CST does not exist in America/Chicago; the
        9 AM firing is 8 wall-free hours after local midnight."""
        from datetime import datetime
        from zoneinfo import ZoneInfo

        cl = CronLine.parse("0 9 * * * America/Chicago")
        now = datetime(2026, 3, 8, 0, 0, tzinfo=ZoneInfo("America/Chicago"))
        nxt = cl.next_time(now)
        assert (nxt.hour, nxt.minute) == (9, 0)
        # absolute gap is 8 h (the 02:00 hour does not exist); note
        # same-tzinfo subtraction would report the 9 h WALL difference
        assert nxt.timestamp() - now.timestamp() == 8 * 3600

    def test_scheduler_uses_cron_line_tz(self):
        """Simulated clock: the delay to the next 9 AM Chicago firing
        reflects the line's tz, not the scheduler default (UTC)."""
        from datetime import datetime, timezone
        from zoneinfo import ZoneInfo

        # 2026-03-08 06:00 UTC == 2026-03-08 00:00 America/Chicago
        start = datetime(2026, 3, 8, 6, 0, tzinfo=timezone.utc).timestamp()
        t = [start]
        slept = []

        def clock():
            return t[0]

        def sleep(d):
            slept.append(d)
            t[0] += d

        sch = Scheduler(fn=lambda: None, schedule="0 9 * * * America/Chicago",
                        clock=clock, sleep=sleep)
        sch.run(max_runs=1)
        # spring-forward: 9 AM CDT is 8 real hours after local midnight
        assert slept and abs(slept[0] - 8 * 3600) < 61
        fired = datetime.fromtimestamp(sch.fire_times[0],
                                       ZoneInfo("America/Chicago"))
        assert (fired.hour, fired.minute) == (9, 0)
