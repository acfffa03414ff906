"""Streaming funnel CEP parity with batch funnel_times (horizon-bounded,
exactly-once completion emission)."""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from bigdata_event_stream_detection_spark.operators.funnel import (
    funnel_times,
)
from bigdata_event_stream_detection_spark.streaming.funnel import (
    streaming_funnel_completions,
)

ARROW_SCHEMA = pa.schema([
    ("user_id", pa.int64()),
    ("event_type", pa.string()),
    ("ts", pa.timestamp("us")),
])

STEPS = ["view", "click", "purchase"]
WITHIN = 1800  # 30 min horizon


def _make_events() -> pd.DataFrame:
    t0 = datetime(2024, 6, 1)
    rows = []
    # u1 completes inside the horizon
    rows += [(1, "view", t0), (1, "click", t0 + timedelta(minutes=5)),
             (1, "purchase", t0 + timedelta(minutes=20))]
    # u2's purchase breaches the horizon of its earliest view
    rows += [(2, "view", t0), (2, "click", t0 + timedelta(minutes=10)),
             (2, "purchase", t0 + timedelta(minutes=40))]
    # u3 has the steps out of order
    rows += [(3, "click", t0), (3, "view", t0 + timedelta(minutes=5)),
             (3, "purchase", t0 + timedelta(minutes=4))]
    # u4 completes late in the stream (second chunk)
    rows += [(4, "view", t0 + timedelta(hours=2)),
             (4, "click", t0 + timedelta(hours=2, minutes=1)),
             (4, "purchase", t0 + timedelta(hours=2, minutes=2))]
    # u5: noise event types only
    rows += [(5, "error", t0 + timedelta(minutes=i)) for i in range(3)]
    return pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])


def test_streaming_funnel_matches_batch(spark, tmp_path):
    pdf = _make_events().sort_values("ts").reset_index(drop=True)
    d = str(tmp_path / "in")
    os.makedirs(d)
    half = len(pdf) // 2
    for i, chunk in enumerate([pdf.iloc[:half], pdf.iloc[half:]]):
        f = os.path.join(d, f"c{i}.parquet")
        pq.write_table(pa.Table.from_pandas(
            chunk, schema=ARROW_SCHEMA, preserve_index=False), f)
        os.utime(f, (time.time() + i, time.time() + i))
    sent = pd.DataFrame({"user_id": [99], "event_type": ["view"],
                         "ts": [pdf["ts"].max() + pd.Timedelta(days=30)]})
    f = os.path.join(d, "zz.parquet")
    pq.write_table(pa.Table.from_pandas(
        sent, schema=ARROW_SCHEMA, preserve_index=False), f)
    os.utime(f, (time.time() + 9, time.time() + 9))

    stream = (spark.readStream
              .schema("user_id long, event_type string, ts timestamp")
              .option("maxFilesPerTrigger", "1").parquet(d))
    out = streaming_funnel_completions(stream, STEPS, WITHIN)
    q = (out.writeStream.format("memory").queryName("funnel_s")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["user_id"]: (r["t0"], r["t1"], r["t2"])
           for r in spark.table("funnel_s").collect()}

    batch = funnel_times(
        spark.createDataFrame(pdf), STEPS, within_seconds=WITHIN)
    truth = {r["user_id"]: (r["t0"], r["t1"], r["t2"])
             for r in batch.filter(F.col("t2").isNotNull()).collect()}
    assert got == truth
    assert set(got) == {1, 4}          # u2 horizon, u3 order, u5 noise
    assert out.dropped_events_acc.value == 0
