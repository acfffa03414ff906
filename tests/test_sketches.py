"""HLL++ sketch aggregates vs exact distinct counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_event_stream_detection_spark.operators.sketches import (
    approx_distinct_counts,
    approx_distinct_verified,
)


def _synth(spark):
    # two groups with known distinct cardinalities: 2000 and 100
    return spark.range(10_000).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("g"),
        F.when(F.col("id") % 2 == 0, F.col("id") % 4000)
        .otherwise(F.col("id") % 200).alias("v"),
    )


def test_approx_distinct_within_tolerance(spark):
    rows = {r["g"]: r for r in
            approx_distinct_verified(_synth(spark), ["g"], "v",
                                     rsd=0.05).collect()}
    assert rows["a"]["n_exact"] == 2000
    assert rows["b"]["n_exact"] == 100
    assert all(r["within_tol"] for r in rows.values())


def test_approx_distinct_counts_close(spark):
    rows = {r["g"]: r["n_approx"] for r in
            approx_distinct_counts(_synth(spark), ["g"], "v",
                                   rsd=0.02).collect()}
    assert abs(rows["a"] - 2000) <= 2000 * 0.08
    assert abs(rows["b"] - 100) <= 100 * 0.08
