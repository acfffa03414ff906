"""Sketch-based aggregates: the approximate counterparts a 100 TB
deployment substitutes for exact distinct/quantile shuffles.

``count(DISTINCT x)`` needs every distinct value of x to meet in one
place — a full shuffle of the distinct set per group. HyperLogLog++
(``approx_count_distinct``) replaces that with a fixed ~1.5 kB sketch
per group that merges associatively, so the aggregation stays map-side
partial + tiny exchange no matter how many distinct values exist. The
reference's distinct-user / distinct-word counts (the A13 distinct and
the vocabulary sizing in InputParser.java:204-223) are the queries
this swaps into at scale.

The ``*_verified`` form computes BOTH the sketch and the exact answer
and emits a per-group within-tolerance verdict — that is what makes an
approximate operator oracle-checkable: the driver's DuckDB oracle
reproduces the exact side and expects every verdict to be true, so a
sketch regression (wrong rsd plumbing, broken merge) fails the gate
rather than drifting silently. Run it at test scale; run the pure
sketch form in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_counts(
    df: DataFrame,
    keys: list[str],
    col: str,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-key HLL++ distinct count of ``col`` (relative standard
    deviation ``rsd``). One tiny exchange: sketches partial-aggregate
    map-side."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd).alias("n_approx"))


def approx_distinct_verified(
    df: DataFrame,
    keys: list[str],
    col: str,
    rsd: float = 0.05,
    tolerance_sds: float = 4.0,
) -> DataFrame:
    """Per-key exact distinct count plus a verdict that the HLL++
    estimate landed within ``tolerance_sds * rsd`` of it.

    Emits (keys..., n_exact, within_tol). Exact and sketch aggregate
    in the same pass (one shuffle). 4 standard deviations keeps the
    per-group false-alarm rate below ~1e-4 while still catching any
    real sketch defect, which shows up as orders-of-magnitude error.
    """
    out = df.groupBy(*keys).agg(
        F.countDistinct(col).alias("n_exact"),
        F.approx_count_distinct(col, rsd).alias("_n_approx"),
    )
    tol = float(tolerance_sds) * float(rsd)
    return out.select(
        *keys,
        "n_exact",
        (F.abs(F.col("_n_approx") - F.col("n_exact"))
         <= F.col("n_exact") * tol).alias("within_tol"),
    )
