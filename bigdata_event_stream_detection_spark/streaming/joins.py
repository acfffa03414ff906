"""Continuous interval join: the streaming twin of
``operators.asof.interval_join``.

Unlike the batch form (which rewrites the non-equi time condition into
gap-width band equi-keys to dodge a nested-loop plan), the streaming
form needs NO bands: Spark's stream-stream join accepts the time-range
condition natively and uses it — together with the watermarks on both
sides — to bound and expire the join state (each side holds only rows
within ``max_gap`` of the other side's watermark). One
StreamingSymmetricHashJoin keyed on ``by``, no Python in the row path.

Inner-join matches emit as soon as both rows have arrived; the
watermark only governs state cleanup, so on a drained
``availableNow`` run the output is row-identical to the batch
``interval_join`` on the same input (tests/test_streaming_cep.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    max_gap_seconds: float,
    time_col: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    left_id: str = "event_id",
    right_id: str = "event_id",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Every (left, right) pair of the same key whose event times lie
    within ``max_gap_seconds`` of each other, continuously.

    Output matches the batch operator exactly:
    ``by + (left_id, right_id AS right_<right_id>, dt_sec)`` with
    ``dt_sec = right.ts - left.ts`` at microsecond-exact 6 dp
    (negative when the right event precedes the left).
    """
    gap_us = int(round(float(max_gap_seconds) * 1e6))
    if gap_us <= 0:
        raise ValueError(
            f"max_gap_seconds={max_gap_seconds} must be positive")
    lt = left.withWatermark(time_col, watermark_delay).select(
        *by, F.col(left_id).alias("_lid"),
        F.col(time_col).alias("_lts"))
    rt = right.withWatermark(time_col, watermark_delay).select(
        *[F.col(c).alias(f"_r_{c}") for c in by],
        F.col(right_id).alias("_rid"),
        F.col(time_col).alias("_rts"))
    keys = reduce(lambda a, b: a & b,
                  [F.col(c) == F.col(f"_r_{c}") for c in by])
    gap = F.expr(f"INTERVAL {gap_us} MICROSECOND")
    cond = (keys
            & (F.col("_rts") >= F.col("_lts") - gap)
            & (F.col("_rts") <= F.col("_lts") + gap))
    dt_us = (F.unix_micros(F.col("_rts").cast("timestamp"))
             - F.unix_micros(F.col("_lts").cast("timestamp")))
    return lt.join(rt, cond, "inner").select(
        *by,
        F.col("_lid").alias(left_id),
        F.col("_rid").alias(f"right_{right_id}"),
        F.round(dt_us / F.lit(1e6), 6).alias("dt_sec"),
    )
