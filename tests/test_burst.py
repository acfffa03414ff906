"""Burst detection over keyed event streams (windows.burst_windows)."""

from __future__ import annotations

from datetime import datetime, timedelta

from bigdata_event_stream_detection_spark.operators.windows import (
    burst_windows,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, event_type string")


def test_burst_flags_spike_not_steady_state(spark):
    t0 = datetime(2024, 1, 1)
    rows = []
    # type "a": 2/hour for 10 hours, then a 10-event spike in hour 10
    for h in range(10):
        rows += [(t0 + timedelta(hours=h, minutes=m), "a") for m in (5, 35)]
    rows += [(t0 + timedelta(hours=10, minutes=m), "a") for m in range(10)]
    # type "b": steady 3/hour throughout — never a burst
    for h in range(11):
        rows += [(t0 + timedelta(hours=h, minutes=m), "b")
                 for m in (10, 20, 30)]
    got = burst_windows(_events(spark, rows), min_lift=1.5).collect()
    assert [(r["event_type"], r["n"], r["baseline"], r["lift"])
            for r in got] == [("a", 10, 2.0, 5.0)]
    assert got[0]["ws_epoch"] == int(
        (t0 + timedelta(hours=10)).timestamp())


def test_burst_first_window_has_no_baseline(spark):
    t0 = datetime(2024, 1, 1)
    rows = [(t0 + timedelta(minutes=m), "a") for m in range(30)]
    assert burst_windows(_events(spark, rows)).collect() == []


def test_burst_baseline_uses_recent_nonempty_windows_only(spark):
    t0 = datetime(2024, 1, 1)
    # 2 events in hour 0, silence for a day, 6 events in hour 25:
    # baseline = the one live window (2), lift = 3
    rows = [(t0 + timedelta(minutes=m), "a") for m in (1, 2)]
    rows += [(t0 + timedelta(hours=25, minutes=m), "a") for m in range(6)]
    got = burst_windows(_events(spark, rows), min_lift=1.5).collect()
    assert [(r["n"], r["baseline"], r["lift"]) for r in got] == [(6, 2.0, 3.0)]
