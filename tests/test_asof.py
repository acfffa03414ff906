"""Backward as-of join composition (operators/asof.py)."""

from __future__ import annotations

from datetime import datetime

from bigdata_event_stream_detection_spark.operators.asof import asof_join


def _t(s):
    return datetime(2024, 1, 1, 0, 0, int(s))


def test_asof_join_picks_most_recent_at_or_before(spark):
    left = spark.createDataFrame(
        [("e1", 1, _t(10)), ("e2", 1, _t(30)), ("e3", 1, _t(5)),
         ("e4", 2, _t(20))],
        "event_id string, user_id int, ts timestamp")
    right = spark.createDataFrame(
        [(1, _t(8), 100.0), (1, _t(10), 200.0), (1, _t(25), 300.0),
         (2, _t(21), 400.0)],
        "user_id int, ts timestamp, value double")
    got = {r["event_id"]: (r["right_ts"], r["right_value"])
           for r in asof_join(left, right).collect()}
    assert got["e1"] == (_t(10), 200.0)   # equal ts: right row visible
    assert got["e2"] == (_t(25), 300.0)   # most recent prior, not first
    assert got["e3"] == (None, None)      # nothing at or before: null
    assert got["e4"] == (None, None)      # key 2's right row is later


def test_asof_join_tolerance_nullifies_stale_matches(spark):
    left = spark.createDataFrame(
        [("e1", 1, _t(50)), ("e2", 1, _t(12))],
        "event_id string, user_id int, ts timestamp")
    right = spark.createDataFrame(
        [(1, _t(10), 1.0)], "user_id int, ts timestamp, value double")
    got = {r["event_id"]: r["right_value"]
           for r in asof_join(left, right,
                              tolerance_seconds=5).collect()}
    assert got == {"e1": None, "e2": 1.0}  # 40 s stale vs 2 s fresh


def test_asof_join_preserves_left_rowcount(spark):
    left = spark.createDataFrame(
        [(f"e{i}", i % 3, _t(i)) for i in range(30)],
        "event_id string, user_id int, ts timestamp")
    right = spark.createDataFrame(
        [(0, _t(1), 9.0)], "user_id int, ts timestamp, value double")
    out = asof_join(left, right)
    assert out.count() == 30
    # exactly one shuffle key: repartitioned input gives identical rows
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, asof_join(left.repartition(7), right).collect()))
    assert a == b


def test_asof_join_randomized_vs_reference(spark):
    """Randomized cross-check of the carry-forward window composition
    against a brute-force per-row reference, covering equal timestamps
    (right visible to a simultaneous left) and tolerance expiry."""
    import random
    from datetime import timedelta

    rng = random.Random(20240817)
    base = datetime(2024, 1, 1)

    for trial in range(10):
        keys = list(range(1, rng.randint(2, 4)))
        lrows, rrows = [], []
        for u in keys:
            for _ in range(rng.randint(0, 6)):
                lrows.append((u, base + timedelta(
                    seconds=rng.randint(0, 120))))
            # unique right timestamps per key (operator precondition)
            for s in rng.sample(range(0, 120), rng.randint(0, 6)):
                rrows.append((u, base + timedelta(seconds=s),
                              float(u * 1000 + s)))
        if not lrows:
            continue
        tol = rng.choice([None, 10, 45])
        left = spark.createDataFrame(lrows, "user_id int, ts timestamp")
        right = spark.createDataFrame(
            rrows, "user_id int, ts timestamp, value double")
        got = [(r["user_id"], r["ts"], r["right_ts"], r["right_value"])
               for r in asof_join(left, right,
                                  tolerance_seconds=tol).collect()]

        def ref_match(u, ts):
            cands = [(rts, v) for (ru, rts, v) in rrows
                     if ru == u and rts <= ts
                     and (tol is None
                          or (ts - rts).total_seconds() <= tol)]
            return max(cands) if cands else (None, None)

        want = [(u, ts) + ref_match(u, ts) for (u, ts) in lrows]
        assert sorted(got, key=str) == sorted(want, key=str), \
            f"trial {trial} tol={tol}"


def test_interval_join_matches_bruteforce(spark):
    """Banded equi-join rewrite == naive all-pairs filter, including
    pairs sitting exactly on the gap boundary and on band edges."""
    import random

    from bigdata_event_stream_detection_spark.operators.asof import (
        interval_join,
    )

    from datetime import timedelta

    rng = random.Random(7)
    gap = 10  # seconds; band width = 10 s
    base = _t(0)
    lrows, rrows = [], []
    for u in (1, 2, 3):
        for i in range(12):
            # includes exact multiples of the band width (0, 10, 20 s)
            s = rng.choice([0, 10, 20, rng.randint(0, 90)])
            lrows.append((f"L{u}_{i}", u, base + timedelta(seconds=s)))
            rrows.append((f"R{u}_{i}", u, base + timedelta(
                seconds=(s + rng.randint(-15, 15)) % 90)))
    left = spark.createDataFrame(
        lrows, "event_id string, user_id int, ts timestamp")
    right = spark.createDataFrame(
        rrows, "event_id string, user_id int, ts timestamp")
    got = sorted(
        (r["user_id"], r["event_id"], r["right_event_id"], r["dt_sec"])
        for r in interval_join(left, right, gap).collect())
    want = sorted(
        (lu, lid, rid, round((rts - lts).total_seconds(), 6))
        for (lid, lu, lts) in lrows for (rid, ru, rts) in rrows
        if lu == ru and abs((rts - lts).total_seconds()) <= gap)
    assert got == want
    # duplicate-free by construction (no distinct in the plan)
    assert len(got) == len(set(got))


def test_interval_join_plan_is_equi_not_nested_loop(spark):
    from bigdata_event_stream_detection_spark.operators.asof import (
        interval_join,
    )

    left = spark.createDataFrame(
        [("a", 1, _t(0))], "event_id string, user_id int, ts timestamp")
    out = interval_join(left, left, 5.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_rejects_nonpositive_gap(spark):
    import pytest

    from bigdata_event_stream_detection_spark.operators.asof import (
        interval_join,
    )

    left = spark.createDataFrame(
        [("a", 1, _t(0))], "event_id string, user_id int, ts timestamp")
    with pytest.raises(ValueError, match="positive"):
        interval_join(left, left, 0)
