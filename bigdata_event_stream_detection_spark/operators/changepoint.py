"""CUSUM changepoint detection over keyed windowed counts.

``windows.burst_windows`` fires on a single window standing out against
its trailing baseline; CUSUM is the complementary detector for SLOW
drifts — many windows each slightly above the expected rate, none of
them individually a burst. It is the classic Page (1954) one-sided
cumulative-sum test: per key, after calibrating the expected per-window
rate ``mu`` on the first ``calibration_windows`` non-empty windows,

    S_t = max(0, S_{t-1} + (n_t - mu * (1 + drift)))

and a changepoint is flagged whenever ``S_t > threshold * mu``.

Scale + oracle shape: the recursion looks sequential, but the standard
identity ``S_t = P_t - min(0, min_{j<=t} P_j)`` (with ``P`` the plain
cumulative sum of deviations) turns it into two stacked per-key ordered
window functions — a cumulative sum, then a running min of that sum.
Both engines (Spark AND the DuckDB oracle) evaluate it as ordinary
window aggregates: the only exchange is one hash shuffle on the key,
each key's frame scan is linear, and there is no global sort and no
driver loop. Empty windows are absent rows (not zeros), matching
``burst_windows``' convention, so a key's calibration and scan run over
its live history only — and exactly the same row sequence the
streaming twin (``streaming.changepoint``) closes in order, which is
what makes batch/stream parity exact.

Reference analog: the event criterion of
``LifeCycleAnalyserSpark.java:196-266`` is "theme strength stands out
against the background"; burst_windows generalizes the spike form and
this operator the drift form of that criterion to arbitrary keyed
event streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_changepoints(
    events: DataFrame,
    time_col: str = "ts",
    key_col: str = "event_type",
    truncate_to: str = "hour",
    calibration_windows: int = 6,
    drift: float = 0.25,
    threshold: float = 2.0,
) -> DataFrame:
    """Flag (key, window) rows whose one-sided CUSUM statistic exceeds
    ``threshold * mu`` (see module docstring for the statistic).

    ``mu`` is the mean count of the key's first ``calibration_windows``
    non-empty windows; those calibration rows never alarm. ``drift``
    is the slack fraction (deviations below ``mu * (1 + drift)`` decay
    the statistic). Emits (key, ws_epoch, n, cusum, target) with
    ``cusum`` and ``target`` rounded to 6 dp — identical to the DuckDB
    window-SQL oracle and to the streaming twin's closed-window output.
    """
    counts = events.groupBy(
        F.unix_timestamp(
            F.date_trunc(truncate_to, F.col(time_col))).alias("ws_epoch"),
        key_col,
    ).agg(F.count("*").alias("n"))

    by_key = Window.partitionBy(key_col).orderBy("ws_epoch")
    whole_key = Window.partitionBy(key_col)
    run = by_key.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    ranked = counts.withColumn("_rn", F.row_number().over(by_key))
    calibrated = ranked.withColumn(
        "_mu",
        F.avg(F.when(F.col("_rn") <= calibration_windows, F.col("n")))
        .over(whole_key),
    )
    # CUSUM runs on the post-calibration rows only; P is the running sum
    # of deviations and S = P - min(0, running min of P) — the
    # max(0, ...) recursion in closed form.
    scan = (
        calibrated.filter(F.col("_rn") > calibration_windows)
        .withColumn(
            "_p",
            F.sum(F.col("n") - F.col("_mu") * (1.0 + float(drift)))
            .over(run))
        .withColumn("_s",
                    F.col("_p") - F.least(F.lit(0.0), F.min("_p").over(run)))
    )
    return (
        scan.filter(F.col("_s") > F.col("_mu") * float(threshold))
        .select(
            key_col, "ws_epoch", "n",
            F.round("_s", 6).alias("cusum"),
            F.round("_mu", 6).alias("target"),
        )
    )
