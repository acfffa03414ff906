"""Streaming sketch aggregates: windowed HLL++ distinct counts.

Exact windowed ``count(DISTINCT x)`` is not supported by Structured
Streaming's append mode (the distinct set would be unbounded state);
the HLL++ sketch IS, because it is a fixed-size register array whose
merge is commutative, associative, and idempotent-under-max — so the
incremental micro-batch merges produce bit-identical registers to a
one-shot batch aggregation regardless of arrival order. That makes
stream == batch parity EXACT (same estimate, not "close"), which the
parity test asserts.

This is the production form of ``operators.sketches`` at stream time:
per-window unique users/documents over an unbounded stream with
O(windows x groups x 1.5 kB) state, closed by the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_windowed_distinct(
    stream: DataFrame,
    keys: list[str],
    col: str,
    time_col: str = "ts",
    length: str = "1 hour",
    watermark_delay: str = "30 minutes",
    rsd: float = 0.05,
) -> DataFrame:
    """Per-(window, keys) HLL++ distinct count of ``col`` in append
    mode: each window emits exactly once, when the watermark closes it.
    """
    return (
        stream.withWatermark(time_col, watermark_delay)
        .groupBy(F.window(time_col, length).alias("w"), *keys)
        .agg(F.approx_count_distinct(col, rsd).alias("n_approx"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("ws_epoch"),
            *keys, "n_approx")
    )


def batch_windowed_distinct(
    df: DataFrame,
    keys: list[str],
    col: str,
    time_col: str = "ts",
    length: str = "1 hour",
    rsd: float = 0.05,
) -> DataFrame:
    """The batch twin (same plan minus the watermark) — the parity
    oracle for the streaming form."""
    return (
        df.groupBy(F.window(time_col, length).alias("w"), *keys)
        .agg(F.approx_count_distinct(col, rsd).alias("n_approx"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("ws_epoch"),
            *keys, "n_approx")
    )
