"""Checkpoint tracker semantics vs the reference's ValueTracking
(/root/reference/lib/logstash/plugin_mixins/jdbc/value_tracking.rb,
spec/plugin_mixins/jdbc/value_tracking_spec.rb)."""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

import pytest

from logstash_integration_jdbc_spark.sources.value_tracking import EPOCH, ValueTracker


def test_numeric_initial_and_roundtrip(tmp_path):
    p = str(tmp_path / "ckpt.json")
    t = ValueTracker(path=p, tracking_type="numeric")
    assert t.value == 0  # NumericValueTracker initial (value_tracking.rb:77-79)
    t.set_value(42)
    t.write()
    t2 = ValueTracker(path=p, tracking_type="numeric")
    assert t2.value == 42


def test_timestamp_initial_is_epoch(tmp_path):
    t = ValueTracker(path=str(tmp_path / "c.json"), tracking_type="timestamp")
    assert t.value == EPOCH  # TimeValueTracker initial (value_tracking.rb:94-96)


def test_timestamp_roundtrip(tmp_path):
    p = str(tmp_path / "c.json")
    t = ValueTracker(path=p, tracking_type="timestamp")
    now = datetime(2024, 3, 1, 12, 30, 45, 123456, tzinfo=timezone.utc)
    t.set_value(now)
    t.write()
    t2 = ValueTracker(path=p, tracking_type="timestamp")
    assert t2.value == now


def test_monotone_never_regresses(tmp_path):
    t = ValueTracker(path=None, tracking_type="numeric")
    t.set_value(10)
    t.set_value(5)
    assert t.value == 10


def test_clean_run_resets_and_deletes(tmp_path):
    p = str(tmp_path / "c.json")
    t = ValueTracker(path=p, tracking_type="numeric")
    t.set_value(7)
    t.write()
    # clean_run=true resets to initial and removes persisted state
    # (jdbc.rb:263-281, value_tracking.rb:10-13).
    t2 = ValueTracker(path=p, tracking_type="numeric", clean_run=True)
    assert t2.value == 0
    assert not os.path.exists(p)


def test_record_last_run_false_never_persists(tmp_path):
    p = str(tmp_path / "c.json")
    t = ValueTracker(path=p, tracking_type="numeric", record_last_run=False)
    t.set_value(9)
    t.write()  # NullFileHandler (value_tracking.rb:137-149)
    assert not os.path.exists(p)


def test_type_mismatch_rejected(tmp_path):
    p = str(tmp_path / "c.json")
    t = ValueTracker(path=p, tracking_type="numeric")
    t.set_value(1)
    t.write()
    with pytest.raises(ValueError):
        ValueTracker(path=p, tracking_type="timestamp")


def test_partition_cursor_merge_monotone(tmp_path):
    t = ValueTracker(path=str(tmp_path / "c.json"), tracking_type="timestamp")
    t.set_partitions({"0": {"max_ts": datetime(2024, 1, 1, 5, tzinfo=timezone.utc),
                            "conv_id": "a", "turn_idx": 3}})
    t.set_partitions({"0": {"max_ts": datetime(2024, 1, 1, 4, tzinfo=timezone.utc),
                            "conv_id": "b", "turn_idx": 9}})
    assert t.partitions["0"]["conv_id"] == "a"  # older cursor didn't win
    t.set_partitions({"0": {"max_ts": datetime(2024, 1, 1, 6, tzinfo=timezone.utc),
                            "conv_id": "c", "turn_idx": 1}})
    assert t.partitions["0"]["conv_id"] == "c"
    t.write()
    t2 = ValueTracker(path=t.path, tracking_type="timestamp")
    assert t2.partitions["0"]["max_ts"] == datetime(2024, 1, 1, 6, tzinfo=timezone.utc)


def test_atomic_write_leaves_valid_json(tmp_path):
    p = str(tmp_path / "c.json")
    t = ValueTracker(path=p, tracking_type="numeric")
    for i in range(5):
        t.set_value(i)
        t.write()
        with open(p) as f:
            assert json.load(f)["value"] == max(i, 0)
