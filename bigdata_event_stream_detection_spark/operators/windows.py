"""Event-time windowing: tumbling, sliding, session — batch and stream.

The reference assigns docs to windows by joining against a driver-side
list of TimePeriods and *duplicating a doc into every window containing
it* (``EmInputFromParser.java:67-95``) — exactly the semantics of
Spark's ``window(ts, length, slide)``. The same expressions work under
``spark.read`` and ``spark.readStream``, which is how the batch tests
and the streaming engine share one implementation.

Window columns are flattened to ``window_start`` / ``window_end``
timestamps so downstream group keys are plain columns (grouping by a
struct breaks applyInPandas key passing and DuckDB comparability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_time_window(
    df: DataFrame,
    ts_col: str = "event_time",
    length: str = "7 days",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (slide=None) or sliding window assignment.

    Sliding windows duplicate each row into every containing window —
    the reference's flatMap duplication, natively.
    """
    w = F.window(F.col(ts_col), length, slide) if slide else F.window(F.col(ts_col), length)
    return df.withColumn("_w", w).withColumn(
        "window_start", F.col("_w.start")
    ).withColumn("window_end", F.col("_w.end")).drop("_w")


def with_session_window_batch(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "event_time",
    gap: str = "1 hour",
) -> DataFrame:
    """Batch sessionization: lag + cumulative sum of gap breaks per key.

    Produces per-key session ids plus the session's start/end — the
    batch analog of streaming ``session_window(ts, gap)`` (which the
    streaming shell uses directly). The reference only merges periods
    driver-side (``TimePeriod.getEnglobingTimePeriod``); sessions are
    the generalization the streaming engine needs.
    """
    gap_expr = F.expr(f"INTERVAL {gap}")
    byk = Window.partitionBy(*key_cols).orderBy(ts_col)
    new_sess = (
        F.col(ts_col) > F.lag(ts_col).over(byk) + gap_expr
    ).cast("long")
    sess_id = F.sum(F.coalesce(new_sess, F.lit(0))).over(
        byk.rowsBetween(Window.unboundedPreceding, 0)
    )
    with_id = df.withColumn("session_id", sess_id)
    bounds = Window.partitionBy(*key_cols, "session_id")
    return (
        with_id.withColumn("window_start", F.min(ts_col).over(bounds))
        .withColumn("window_end", F.max(ts_col).over(bounds) + gap_expr)
    )


def drop_late(
    df: DataFrame,
    ts_col: str = "event_time",
    watermark_delay: str = "3 days",
    max_event_time=None,
) -> DataFrame:
    """Batch analog of the watermark: drop rows older than
    (max event time seen) - delay. In streaming this is
    ``withWatermark``; in batch we compute the global max once
    (broadcast 1-row join). Mirrors the reference's out-of-period scan
    filter (RawArticleInputStream.java:141-142).
    """
    delay = F.expr(f"INTERVAL {watermark_delay}")
    if max_event_time is not None:
        return df.filter(F.col(ts_col) >= F.lit(max_event_time) - delay)
    mx = df.agg(F.max(ts_col).alias("_max_ts"))
    return (
        df.crossJoin(F.broadcast(mx))
        .filter(F.col(ts_col) >= F.col("_max_ts") - delay)
        .drop("_max_ts")
    )


def filter_docs(
    df: DataFrame,
    min_tokens: int = 50,
    min_distinct: int | None = None,
) -> DataFrame:
    """Doc-quality gate: length filter (P2, ``InputParser.java:100-107``)
    and optional distinct-words floor (P5, ``EmInputFromParser.java:90``)."""
    out = df.filter(F.col("n_tok") >= min_tokens)
    if min_distinct is not None:
        out = out.filter(F.size(F.array_distinct("tokens")) > min_distinct)
    return out


def burst_windows(
    events: DataFrame,
    time_col: str = "ts",
    key_col: str = "event_type",
    truncate_to: str = "hour",
    baseline_windows: int = 6,
    min_lift: float = 1.5,
) -> DataFrame:
    """Burst detection over a generic event stream: per (key, window)
    count vs the trailing per-key baseline; emit windows whose count is
    at least ``min_lift`` x the average of the ``baseline_windows``
    most recent *non-empty* windows (empty windows are absent rows, not
    zeros — a key going quiet then returning compares against its live
    history, which is the conservative choice for sparse keys).

    The relational skeleton of the reference's event criterion — theme
    strength standing out against its background
    (``LifeCycleAnalyserSpark.java:196-266``) — applied to arbitrary
    keyed event streams. One hash aggregate then one per-key ordered
    frame scan; the window function partitions by key, so no global
    sort and no single-partition cliff, and a key's frame is a bounded
    ``baseline_windows`` rows regardless of stream length.
    """
    counts = events.groupBy(
        F.unix_timestamp(
            F.date_trunc(truncate_to, F.col(time_col))).alias("ws_epoch"),
        key_col,
    ).agg(F.count("*").alias("n"))
    frame = (
        Window.partitionBy(key_col)
        .orderBy("ws_epoch")
        .rowsBetween(-baseline_windows, -1)
    )
    base = F.avg("n").over(frame)
    return (
        counts.withColumn("baseline", base)
        .filter(F.col("baseline").isNotNull()
                & (F.col("n") >= F.col("baseline") * F.lit(min_lift)))
        .select(
            key_col, "ws_epoch", "n",
            F.round("baseline", 6).alias("baseline"),
            F.round(F.col("n") / F.col("baseline"), 6).alias("lift"),
        )
    )
