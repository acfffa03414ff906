"""Streaming burst detection: the continuous form of
``operators.windows.burst_windows``.

Per event-type key, tumbling event-time windows are counted in grouped
state; when the watermark passes a window's end it is closed IN ORDER,
compared against the trailing baseline of the most recent non-empty
closed windows, and emitted (append-mode, exactly once per closed
window) iff its count reaches ``min_lift`` x that baseline. Output
rows are identical to the batch operator on the same input once every
real window has closed — the same batch/streaming parity contract as
``streaming_detect_events``.

Scale shape: the ONLY exchange is the hash shuffle on ``key_col``
(event type / tenant / source — naturally bounded cardinality), and
each key's state is O(open windows + baseline_windows) longs, so the
state store carries kilobytes per key no matter the stream volume;
the per-batch bucketing is one vectorized numpy pass per key. Contrast
with a naive global sort or an unbounded raw-event buffer — neither
survives a hot stream.

Late rows for a window that already closed are dropped and COUNTED
into ``dropped_rows_acc`` (append-mode can't resurrect an emitted
window), mirroring the engine's accounted-drop policy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)

BURST_SCHEMA = StructType([
    StructField("event_type", StringType()),
    StructField("ws_epoch", LongType()),
    StructField("n", LongType()),
    StructField("baseline", DoubleType()),
    StructField("lift", DoubleType()),
])

# Per-key state: counts of the still-open windows + the trailing
# non-empty closed-window counts (the baseline), + the newest closed
# window start (late-row fence). Arrays here are a handful of longs
# per key — boxed ArrayType is fine (unlike the engine's token blobs).
BURST_STATE_SCHEMA = StructType([
    StructField("open_ws", ArrayType(LongType())),
    StructField("open_n", ArrayType(LongType())),
    StructField("hist_n", ArrayType(LongType())),
    StructField("last_closed_ws", LongType()),
])


def streaming_burst_windows(
    stream: DataFrame,
    time_col: str = "ts",
    key_col: str = "event_type",
    window_seconds: int = 3600,
    baseline_windows: int = 6,
    min_lift: float = 1.5,
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Continuous keyed burst detection (see module docstring).

    ``window_seconds=3600`` matches the batch operator's
    ``date_trunc('hour')`` bucketing (UTC). Emitted columns equal
    ``windows.burst_windows``: (key, ws_epoch, n, baseline, lift).
    """
    dropped_acc = stream.sparkSession.sparkContext.accumulator(0)
    win = int(window_seconds)
    base_k = int(baseline_windows)
    lift_thr = float(min_lift)

    def close_ready(key, open_ws, open_n, hist_n, last_closed, wm_ms):
        """Close every open window whose end the watermark passed, in
        window order; return (emitted rows, new state tuple)."""
        rows = []
        order = np.argsort(open_ws)
        keep_ws, keep_n = [], []
        for i in order:
            ws, n = int(open_ws[i]), int(open_n[i])
            if (ws + win) * 1000 <= wm_ms:
                if hist_n:
                    base = float(np.mean(hist_n[-base_k:]))
                    if n >= base * lift_thr:
                        rows.append((key, ws, n, round(base, 6),
                                     round(n / base, 6)))
                hist_n = (hist_n + [n])[-base_k:]
                last_closed = max(last_closed, ws)
            else:
                keep_ws.append(ws)
                keep_n.append(n)
        return rows, (keep_ws, keep_n, hist_n, last_closed)

    def fn(key, pdf_iter, state: GroupState):
        k = key[0]
        wm_ms = state.getCurrentWatermarkMs()
        if state.exists:
            open_ws, open_n, hist_n, last_closed = state.get
            open_ws, open_n = list(open_ws), list(open_n)
            hist_n = list(hist_n)
        else:
            open_ws, open_n, hist_n, last_closed = [], [], [], -(1 << 62)

        if not state.hasTimedOut:
            counts: dict[int, int] = dict(zip(open_ws, open_n))
            for pdf in pdf_iter:
                if not len(pdf):
                    continue
                sec = (pdf[time_col].to_numpy("datetime64[ns]")
                       .astype(np.int64) // 1_000_000_000)
                ws_arr = (sec // win) * win
                uws, cnt = np.unique(ws_arr, return_counts=True)
                for ws, c in zip(uws.tolist(), cnt.tolist()):
                    if ws <= last_closed:
                        dropped_acc.add(int(c))  # late: window emitted
                    else:
                        counts[ws] = counts.get(ws, 0) + int(c)
            open_ws = list(counts.keys())
            open_n = [counts[w] for w in open_ws]

        rows, (open_ws, open_n, hist_n, last_closed) = close_ready(
            k, open_ws, open_n, hist_n, last_closed, wm_ms)

        state.update((open_ws, open_n, hist_n, last_closed))
        if open_ws:
            next_end_ms = (min(open_ws) + win) * 1000
            # clamp past the watermark (engine.py's out-of-order rule)
            state.setTimeoutTimestamp(max(next_end_ms, wm_ms + 1))
        if rows:
            yield pd.DataFrame(rows, columns=[
                "event_type", "ws_epoch", "n", "baseline", "lift"])

    keyed = (
        stream.withWatermark(time_col, watermark_delay)
        .select(F.col(key_col).alias("event_type"), time_col)
    )
    out = keyed.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=BURST_SCHEMA,
        stateStructType=BURST_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    out.dropped_rows_acc = dropped_acc
    return out
