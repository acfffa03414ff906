"""CUSUM changepoint detection: batch closed form vs a brute-force
max(0, ...) recursion, streaming parity, and checkpoint resume.

Streaming harness contract as in tests/test_streaming.py: chronological
parquet chunks with increasing mtimes (maxFilesPerTrigger=1) plus a
far-future sentinel row whose watermark closes every real window.
Planted rates keep every CUSUM value far from the alarm and rounding
boundaries, so the float-identity between the batch closed form and
the streaming fold is exact after round(6).
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bigdata_event_stream_detection_spark.operators.changepoint import (
    cusum_changepoints,
)
from bigdata_event_stream_detection_spark.streaming.changepoint import (
    streaming_cusum_changepoints,
)

ARROW_SCHEMA = pa.schema([
    ("ts", pa.timestamp("us")),
    ("event_type", pa.string()),
])

CALIB, DRIFT, THR = 6, 0.25, 2.0


def _make_events() -> pd.DataFrame:
    t0 = datetime(2024, 3, 1)
    rows = []
    for h in range(36):
        # steady: 3/hour forever — never alarms (dev = 3 - 3.75 < 0)
        rows += [(t0 + timedelta(hours=h, minutes=m), "steady")
                 for m in (7, 23, 41)]
        # drifty: 4/hour during calibration, then 6/hour — a slow +1
        # deviation per window that burst detection (lift 1.5x) misses
        # but the cumulative sum catches once s > 8
        n = 4 if h < CALIB else 6
        rows += [(t0 + timedelta(hours=h, minutes=m % 60, seconds=m // 60),
                  "drifty") for m in range(n)]
        # spiky: 2/hour with one 30-event spike at hour 20 — the CUSUM
        # statistic jumps then decays by 0.5/window, alarming for a run
        n = 30 if h == 20 else 2
        rows += [(t0 + timedelta(hours=h, minutes=(m * 2 + 1) % 60,
                                 seconds=m // 30), "spiky")
                 for m in range(n)]
    return pd.DataFrame(rows, columns=["ts", "event_type"])


def _brute_force(pdf: pd.DataFrame) -> dict:
    """Direct Page recursion per key over hourly non-empty windows."""
    out = {}
    ws = (pdf["ts"].astype("datetime64[us]").astype("int64")
          // 1_000_000 // 3600 * 3600)
    counts = (pdf.assign(ws=ws).groupby(["event_type", "ws"])
              .size().reset_index(name="n"))
    for key, grp in counts.groupby("event_type"):
        grp = grp.sort_values("ws")
        ns = grp["n"].tolist()
        wss = grp["ws"].tolist()
        if len(ns) <= CALIB:
            continue
        mu = sum(ns[:CALIB]) / CALIB
        s = 0.0
        for ws_i, n in zip(wss[CALIB:], ns[CALIB:]):
            s = max(0.0, s + (n - mu * (1.0 + DRIFT)))
            if s > mu * THR:
                out[(key, ws_i)] = (n, round(s, 6), round(mu, 6))
    return out


@pytest.fixture(scope="module")
def cusum_dir(tmp_path_factory):
    pdf = _make_events().sort_values("ts").reset_index(drop=True)
    path = str(tmp_path_factory.mktemp("cusum") / "input")
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


def test_batch_cusum_matches_brute_force(spark, cusum_dir):
    got = {(r["event_type"], r["ws_epoch"]): (r["n"], r["cusum"],
                                              r["target"])
           for r in cusum_changepoints(
               spark.createDataFrame(cusum_dir["pdf"])).collect()}
    truth = _brute_force(cusum_dir["pdf"])
    assert got == truth
    keys = {k[0] for k in got}
    # the slow drift is caught, the steady key never fires, and the
    # spike alarms while its statistic decays
    assert keys == {"drifty", "spiky"}
    drift_alarms = sorted(k[1] for k in got if k[0] == "drifty")
    # s = t - CALIB after t post-calibration windows; > 8 from the 9th
    assert len(drift_alarms) == 36 - CALIB - 8


def test_streaming_cusum_matches_batch(spark, cusum_dir):
    stream = (spark.readStream
              .schema("ts timestamp, event_type string")
              .option("maxFilesPerTrigger", "1")
              .parquet(cusum_dir["dir"]))
    cps = streaming_cusum_changepoints(stream)
    q = (cps.writeStream.format("memory").queryName("cusum")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["event_type"], r["ws_epoch"]): (r["n"], r["cusum"],
                                              r["target"])
           for r in spark.table("cusum").collect()}
    truth = {(r["event_type"], r["ws_epoch"]): (r["n"], r["cusum"],
                                                r["target"])
             for r in cusum_changepoints(
                 spark.createDataFrame(cusum_dir["pdf"])).collect()}
    assert got == truth
    assert cps.dropped_rows_acc.value == 0


def test_streaming_cusum_resumes_from_checkpoint(spark, cusum_dir,
                                                 tmp_path):
    """Kill mid-input, restart from the checkpoint: calibration + CUSUM
    state recover, post-restart closes still match batch, no (key,
    window) emitted twice."""
    import glob

    part_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(part_dir)
    src_files = sorted(glob.glob(cusum_dir["dir"] + "/*.parquet"))

    def copy(files):
        for f in files:
            dst = os.path.join(part_dir, os.path.basename(f))
            open(dst, "wb").write(open(f, "rb").read())
            os.utime(dst, (os.stat(f).st_mtime, os.stat(f).st_mtime))

    def run_once():
        stream = (spark.readStream
                  .schema("ts timestamp, event_type string")
                  .option("maxFilesPerTrigger", "1").parquet(part_dir))
        q = (streaming_cusum_changepoints(stream)
             .writeStream.format("parquet").option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    copy(src_files[:2])
    run_once()
    copy(src_files[2:])
    run_once()

    final = spark.read.parquet(out_dir)
    from pyspark.sql import functions as F
    assert (final.groupBy("event_type", "ws_epoch").count()
            .filter(F.col("count") > 1).count()) == 0
    got = {(r["event_type"], r["ws_epoch"]): (r["n"], r["cusum"])
           for r in final.collect()}
    truth = {(r["event_type"], r["ws_epoch"]): (r["n"], r["cusum"])
             for r in cusum_changepoints(
                 spark.createDataFrame(cusum_dir["pdf"])).collect()}
    assert got == truth
