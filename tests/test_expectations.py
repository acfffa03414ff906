"""Declarative quality expectations (operators/expectations.py):
CHECK-constraint NULL semantics, single-scan plans, quarantine feed."""

from __future__ import annotations

import pandas as pd

from bigdata_event_stream_detection_spark.operators.expectations import (
    expectation_summary, violating_rows,
)

CHECKS = [
    ("value_nonneg", "value >= 0"),
    ("value_present", "value IS NOT NULL"),
    ("type_known", "event_type IN ('a', 'b')"),
]


def _df(spark):
    pdf = pd.DataFrame(
        [(1, 5.0, "a"), (2, -1.0, "a"), (3, None, "b"), (4, 2.0, "zz")],
        columns=["event_id", "value", "event_type"])
    return spark.createDataFrame(pdf)


def test_summary_counts_and_null_semantics(spark):
    got = {r["expectation"]: (r["n_rows"], r["n_violations"],
                              r["violation_rate"], r["passed"])
           for r in expectation_summary(_df(spark), CHECKS).collect()}
    # NULL value -> "value >= 0" is UNKNOWN -> a violation (CHECK
    # semantics), so value_nonneg fails rows 2 AND 3
    assert got == {
        "value_nonneg": (4, 2, 0.5, False),
        "value_present": (4, 1, 0.25, False),
        "type_known": (4, 1, 0.25, False),
    }


def test_summary_all_pass(spark):
    got = expectation_summary(
        _df(spark), [("id_present", "event_id IS NOT NULL")]).collect()
    assert [(r["n_violations"], r["passed"]) for r in got] == [(0, True)]


def test_violating_rows_quarantine_feed(spark):
    got = {(r["event_id"], r["expectation"])
           for r in violating_rows(_df(spark), CHECKS).collect()}
    assert got == {
        (2, "value_nonneg"), (3, "value_nonneg"),
        (3, "value_present"), (4, "type_known"),
    }


def test_plans_single_scan_no_join(spark):
    df = _df(spark)
    p1 = expectation_summary(df, CHECKS)._jdf.queryExecution() \
        .executedPlan().toString()
    # one-row final agg is the only exchange; no join, one scan
    assert "Join" not in p1
    assert p1.count("Scan") == 1
    p2 = violating_rows(df, CHECKS)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in p2 and "Join" not in p2
    assert p2.count("Scan") == 1


def test_summary_empty_input_all_pass(spark):
    """Zero rows = zero violations (sum-over-nothing must not leak
    NULL into n_violations/passed)."""
    got = {r["expectation"]: (r["n_rows"], r["n_violations"],
                              r["violation_rate"], r["passed"])
           for r in expectation_summary(
               _df(spark).limit(0), CHECKS).collect()}
    assert got == {name: (0, 0, 0.0, True) for name, _ in CHECKS}
