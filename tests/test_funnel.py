"""Funnel / sequence-pattern matching (operators/funnel.py)."""

from __future__ import annotations

from datetime import datetime

import pytest

from bigdata_event_stream_detection_spark.operators.funnel import (
    funnel_conversion,
    funnel_times,
)


def _t(s):
    return datetime(2024, 1, 1, 0, 0, int(s) % 60, 0) if s < 60 else \
        datetime(2024, 1, 1, 0, int(s) // 60, int(s) % 60, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, t, _t(s)) for u, t, s in rows],
        "user_id int, event_type string, ts timestamp")


def test_funnel_requires_strict_order(spark):
    ev = _events(spark, [
        (1, "view", 1), (1, "click", 5), (1, "purchase", 9),   # completes
        (2, "click", 1), (2, "view", 5), (2, "purchase", 9),   # click BEFORE
        (3, "view", 1), (3, "purchase", 2),                    # no click
    ])
    got = {r["user_id"]: (r["t0"], r["t1"], r["t2"])
           for r in funnel_times(ev, ["view", "click", "purchase"]).collect()}
    assert got[1] == (_t(1), _t(5), _t(9))
    assert got[2][1] is None and got[2][2] is None  # click at 1 ignored
    assert got[3] == (_t(1), None, None)
    conv = funnel_conversion(ev, ["view", "click", "purchase"]).collect()[0]
    assert (conv["n_step1"], conv["n_step2"], conv["n_step3"]) == (3, 1, 1)


def test_funnel_greedy_earliest_still_finds_later_completions(spark):
    # earliest click (s=2) is followed by a purchase at s=10: greedy
    # matching must complete even though another click exists at s=8
    ev = _events(spark, [
        (1, "view", 1), (1, "click", 2), (1, "click", 8),
        (1, "purchase", 10),
    ])
    got = funnel_times(ev, ["view", "click", "purchase"]).collect()[0]
    assert (got["t0"], got["t1"], got["t2"]) == (_t(1), _t(2), _t(10))


def test_funnel_within_horizon(spark):
    ev = _events(spark, [
        (1, "view", 0), (1, "click", 100), (1, "purchase", 200),
        (2, "view", 0), (2, "click", 10), (2, "purchase", 20),
    ])
    got = {r["user_id"]: r["t2"]
           for r in funnel_times(ev, ["view", "click", "purchase"],
                                 within_seconds=30).collect()}
    assert got[1] is None       # click at +100 s breaches the horizon
    assert got[2] == _t(20)


def test_funnel_rejects_single_step(spark):
    ev = _events(spark, [(1, "view", 1)])
    with pytest.raises(ValueError):
        funnel_times(ev, ["view"])


def test_funnel_randomized_vs_reference(spark):
    """Randomized cross-check of the join/agg composition against an
    independent per-step greedy reference, with microsecond-resolution
    timestamps exercising the sub-second horizon arithmetic."""
    import random
    from datetime import timedelta

    rng = random.Random(20240817)
    steps = ["a", "b", "c"]
    base = datetime(2024, 1, 1)

    def reference(events, horizon_us):
        # per-user greedy: t0 = global earliest step-0; each later step
        # = earliest event strictly after the previous completion and
        # within horizon of t0 (no backtracking — the operator's spec)
        out = {}
        for u in {e[0] for e in events}:
            ev = [(t, ts) for (uu, t, ts) in events if uu == u]
            zeros = [ts for t, ts in ev if t == steps[0]]
            if not zeros:
                continue
            chain = [min(zeros)]
            for s in steps[1:]:
                if chain[-1] is None:
                    chain.append(None)
                    continue
                cands = [ts for t, ts in ev
                         if t == s and ts > chain[-1]
                         and (ts - chain[0]).total_seconds() * 1e6
                         <= horizon_us]
                chain.append(min(cands) if cands else None)
            out[u] = tuple(chain)
        return out

    for trial in range(12):
        n_users = rng.randint(1, 3)
        events = []
        for u in range(1, n_users + 1):
            for _ in range(rng.randint(0, 10)):
                typ = rng.choice(steps + ["noise"])
                us = rng.randint(0, 60_000_000)  # within one minute
                events.append((u, typ, base + timedelta(microseconds=us)))
        if not events:
            continue
        horizon_s = rng.choice([0.5, 7.3, 45.0])
        got = {r["user_id"]: (r["t0"], r["t1"], r["t2"])
               for r in funnel_times(
                   spark.createDataFrame(
                       events, "user_id int, event_type string, ts timestamp"),
                   steps, within_seconds=horizon_s).collect()}
        want = reference(events, horizon_s * 1e6)
        assert got == want, f"trial {trial}: {got} != {want}"
