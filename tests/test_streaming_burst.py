"""Streaming burst detection parity with the batch operator.

Same harness contract as tests/test_streaming.py: chronological parquet
chunks with increasing mtimes (maxFilesPerTrigger=1) plus a far-future
sentinel row whose watermark closes every real window before the
availableNow trigger drains.
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bigdata_event_stream_detection_spark.operators.windows import (
    burst_windows,
)
from bigdata_event_stream_detection_spark.streaming.burst import (
    streaming_burst_windows,
)

ARROW_SCHEMA = pa.schema([
    ("ts", pa.timestamp("us")),
    ("event_type", pa.string()),
])


def _make_events() -> pd.DataFrame:
    t0 = datetime(2024, 3, 1)
    rows = []
    for h in range(24):
        # steady key: 3/hour, never bursts
        rows += [(t0 + timedelta(hours=h, minutes=m), "steady")
                 for m in (7, 23, 41)]
        # spiky key: 2/hour with a 12-event spike in hour 20
        n = 12 if h == 20 else 2
        rows += [(t0 + timedelta(hours=h, minutes=m % 60, seconds=m // 60),
                  "spiky") for m in range(n)]
    return pd.DataFrame(rows, columns=["ts", "event_type"])


@pytest.fixture(scope="module")
def burst_dir(tmp_path_factory):
    pdf = _make_events().sort_values("ts").reset_index(drop=True)
    path = str(tmp_path_factory.mktemp("burst") / "input")
    os.makedirs(path, exist_ok=True)
    bounds = [round(i * len(pdf) / 4) for i in range(5)]
    for i in range(4):
        f = os.path.join(path, f"chunk_{i:03d}.parquet")
        pq.write_table(pa.Table.from_pandas(
            pdf.iloc[bounds[i]:bounds[i + 1]], schema=ARROW_SCHEMA,
            preserve_index=False), f)
        os.utime(f, (time.time() + i, time.time() + i))
    sent = pd.DataFrame({
        "ts": [pdf["ts"].max() + pd.Timedelta(days=30)],
        "event_type": ["SENTINEL"]})
    f = os.path.join(path, "chunk_zzz_sentinel.parquet")
    pq.write_table(pa.Table.from_pandas(
        sent, schema=ARROW_SCHEMA, preserve_index=False), f)
    os.utime(f, (time.time() + 10, time.time() + 10))
    return {"dir": path, "pdf": pdf}


def test_streaming_bursts_match_batch(spark, burst_dir):
    stream = (spark.readStream
              .schema("ts timestamp, event_type string")
              .option("maxFilesPerTrigger", "1")
              .parquet(burst_dir["dir"]))
    bursts = streaming_burst_windows(stream, min_lift=1.5)
    q = (bursts.writeStream.format("memory").queryName("bursts")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["event_type"], r["ws_epoch"]): (r["n"], r["baseline"],
                                              r["lift"])
           for r in spark.table("bursts").collect()}

    truth = {(r["event_type"], r["ws_epoch"]): (r["n"], r["baseline"],
                                                r["lift"])
             for r in burst_windows(
                 spark.createDataFrame(burst_dir["pdf"]),
                 min_lift=1.5).collect()}
    assert got == truth
    # the planted spike is found, the steady key never fires
    assert any(k[0] == "spiky" and v[0] == 12 for k, v in got.items())
    assert not any(k[0] == "steady" for k in got)
    assert bursts.dropped_rows_acc.value == 0


def test_streaming_burst_resumes_from_checkpoint(spark, burst_dir,
                                                 tmp_path):
    """Kill the query mid-input, restart from the same checkpoint with
    the remaining files: per-key baseline/open-window state is
    recovered, post-restart closes still match the batch operator, and
    no (key, window) is emitted twice."""
    import glob

    part_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(part_dir)
    src_files = sorted(glob.glob(burst_dir["dir"] + "/*.parquet"))

    def copy(files):
        for f in files:
            dst = os.path.join(part_dir, os.path.basename(f))
            open(dst, "wb").write(open(f, "rb").read())
            os.utime(dst, (os.stat(f).st_mtime, os.stat(f).st_mtime))

    def run_once():
        stream = (spark.readStream
                  .schema("ts timestamp, event_type string")
                  .option("maxFilesPerTrigger", "1").parquet(part_dir))
        q = (streaming_burst_windows(stream, min_lift=1.5)
             .writeStream.format("parquet").option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    copy(src_files[:2])
    run_once()                 # phase 1: early windows, some still open
    copy(src_files[2:])
    run_once()                 # phase 2: resume and drain (incl. sentinel)

    final = spark.read.parquet(out_dir)
    from pyspark.sql import functions as F
    assert (final.groupBy("event_type", "ws_epoch").count()
            .filter(F.col("count") > 1).count()) == 0
    got = {(r["event_type"], r["ws_epoch"]): (r["n"], r["baseline"])
           for r in final.collect()}
    truth = {(r["event_type"], r["ws_epoch"]): (r["n"], r["baseline"])
             for r in burst_windows(
                 spark.createDataFrame(burst_dir["pdf"]),
                 min_lift=1.5).collect()}
    assert got == truth
