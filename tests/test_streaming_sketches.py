"""Streaming windowed HLL++ distinct == batch (exact register parity).

Same harness contract as tests/test_streaming.py: chronological parquet
chunks with increasing mtimes (maxFilesPerTrigger=1) plus a far-future
sentinel row whose watermark closes every real window.
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from bigdata_event_stream_detection_spark.streaming.sketches import (
    batch_windowed_distinct,
    streaming_windowed_distinct,
)

ARROW_SCHEMA = pa.schema([
    ("ts", pa.timestamp("us")),
    ("source", pa.string()),
    ("user_id", pa.int64()),
])


def _make_events() -> pd.DataFrame:
    t0 = datetime(2024, 5, 1)
    rows = []
    for h in range(6):
        for m in range(60):
            # per-hour distinct cardinality differs per source
            rows.append((t0 + timedelta(hours=h, minutes=m), "web",
                         (h * 7 + m) % 40))
            rows.append((t0 + timedelta(hours=h, minutes=m, seconds=30),
                         "app", m % (5 + h)))
    return pd.DataFrame(rows, columns=["ts", "source", "user_id"])


def test_streaming_windowed_distinct_matches_batch(spark, tmp_path):
    pdf = _make_events().sort_values("ts").reset_index(drop=True)
    d = str(tmp_path / "in")
    os.makedirs(d)
    bounds = [round(i * len(pdf) / 3) for i in range(4)]
    for i in range(3):
        f = os.path.join(d, f"c{i}.parquet")
        pq.write_table(pa.Table.from_pandas(
            pdf.iloc[bounds[i]:bounds[i + 1]], schema=ARROW_SCHEMA,
            preserve_index=False), f)
        os.utime(f, (time.time() + i, time.time() + i))
    sent = pd.DataFrame({"ts": [pdf["ts"].max() + pd.Timedelta(days=30)],
                         "source": ["SENTINEL"], "user_id": [0]})
    f = os.path.join(d, "zz.parquet")
    pq.write_table(pa.Table.from_pandas(
        sent, schema=ARROW_SCHEMA, preserve_index=False), f)
    os.utime(f, (time.time() + 9, time.time() + 9))

    stream = (spark.readStream
              .schema("ts timestamp, source string, user_id long")
              .option("maxFilesPerTrigger", "1").parquet(d))
    out = streaming_windowed_distinct(stream, ["source"], "user_id")
    q = (out.writeStream.format("memory").queryName("hll_s")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["ws_epoch"], r["source"]): r["n_approx"]
           for r in spark.table("hll_s").collect()}

    truth = {(r["ws_epoch"], r["source"]): r["n_approx"]
             for r in batch_windowed_distinct(
                 spark.createDataFrame(pdf), ["source"], "user_id")
             .collect()}
    # every real window closed (sentinel's own window never does)
    assert got == {k: v for k, v in truth.items() if k[1] != "SENTINEL"}
    assert len(got) == 12  # 6 hours x 2 sources
    # sanity: estimates track the exact per-window cardinalities
    exact = {(r["ws_epoch"], r["source"]): r["n"]
             for r in spark.createDataFrame(pdf).groupBy(
                 F.unix_timestamp(F.window("ts", "1 hour").start)
                 .alias("ws_epoch"), "source")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(2, exact[k] * 0.2)


def test_streaming_heavy_hitters_guarantees(spark, tmp_path):
    """Per-window MG candidates: no false negatives among true heavy
    values, lower bounds sandwich the exact counts, per-bucket totals
    sum to the window size, and closed-window state is removed."""
    from collections import Counter

    from bigdata_event_stream_detection_spark.streaming.sketches import (
        streaming_windowed_heavy_hitters,
    )

    t0 = datetime(2024, 5, 1)
    # hot values per hour (descending counts) + a long singleton tail
    rows = []
    uid = 0
    for h in range(3):
        for v in range(4):
            for i in range(120 - 25 * v):
                rows.append((t0 + timedelta(hours=h, minutes=i % 60,
                                            seconds=(i * 13) % 60),
                             "web", f"hot{h}_{v}"))
        for i in range(400):
            uid += 1
            rows.append((t0 + timedelta(hours=h, minutes=i % 60,
                                        seconds=(i * 7) % 60),
                         "web", f"tail{uid}"))
    pdf = pd.DataFrame(rows, columns=["ts", "source", "user_id"]) \
        .sort_values("ts").reset_index(drop=True)

    d = str(tmp_path / "in")
    os.makedirs(d)
    schema3 = pa.schema([("ts", pa.timestamp("us")),
                         ("source", pa.string()),
                         ("user_id", pa.string())])
    bounds = [round(i * len(pdf) / 3) for i in range(4)]
    for i in range(3):
        f = os.path.join(d, f"c{i}.parquet")
        pq.write_table(pa.Table.from_pandas(
            pdf.iloc[bounds[i]:bounds[i + 1]], schema=schema3,
            preserve_index=False), f)
        os.utime(f, (time.time() + i, time.time() + i))
    sent = pd.DataFrame({"ts": [pdf["ts"].max() + pd.Timedelta(days=30)],
                         "source": ["S"], "user_id": ["s"]})
    f = os.path.join(d, "zz.parquet")
    pq.write_table(pa.Table.from_pandas(
        sent, schema=schema3, preserve_index=False), f)
    os.utime(f, (time.time() + 9, time.time() + 9))

    stream = (spark.readStream
              .schema("ts timestamp, source string, user_id string")
              .option("maxFilesPerTrigger", "1").parquet(d))
    out = streaming_windowed_heavy_hitters(
        stream, "user_id", length="1 hour", capacity=64, num_buckets=4)
    q = (out.writeStream.format("memory").queryName("hh_s")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("hh_s").collect()

    # exact per-window truth
    pdf["ws"] = pdf["ts"].dt.floor("h")
    for h in range(3):
        ws_epoch = int((t0 + timedelta(hours=h)).timestamp())
        win = pdf[pdf["ws"] == t0 + timedelta(hours=h)]
        exact = Counter(win["user_id"])
        cand = {r["value"]: r for r in got if r["ws_epoch"] == ws_epoch}
        # per-bucket totals sum to the window row count
        bucket_tot = {r["bucket"]: r["n_bucket"]
                      for r in got if r["ws_epoch"] == ws_epoch}
        assert sum(bucket_tot.values()) == len(win)
        for v in (f"hot{h}_{x}" for x in range(4)):
            r = cand.get(v)
            assert r is not None, f"false negative {v}"
            err_budget = r["n_bucket"] // (64 + 1) + 1
            assert r["lb"] <= exact[v] <= r["lb"] + err_budget
    # every state entry was emitted-and-removed (sentinel window has no
    # closed state rows; its open key is the only remaining one)
    progress = q.lastProgress or q.recentProgress[-1]
    assert progress["stateOperators"][0]["numRowsTotal"] == 1


def test_streaming_windowed_histogram_matches_batch(spark, tmp_path):
    """Windowed bin counts are exact mergeable longs, so stream ==
    batch parity is EXACT; quantiles reconstructed from the closed
    windows equal the batch reconstruction."""
    import numpy as np

    from bigdata_event_stream_detection_spark.operators.sketches import (
        histogram_quantiles,
    )
    from bigdata_event_stream_detection_spark.streaming.sketches import (
        batch_windowed_histogram,
        streaming_windowed_histogram,
    )

    rng = np.random.RandomState(11)
    t0 = datetime(2024, 5, 1)
    rows = []
    for h in range(4):
        for m in range(60):
            for s in ("web", "app"):
                rows.append((t0 + timedelta(hours=h, minutes=m),
                             s, float(rng.gamma(2.0, 10.0 * (h + 1)))))
    pdf = (pd.DataFrame(rows, columns=["ts", "source", "value"])
           .sort_values("ts").reset_index(drop=True))

    d = str(tmp_path / "in")
    os.makedirs(d)
    schema = pa.schema([("ts", pa.timestamp("us")),
                        ("source", pa.string()),
                        ("value", pa.float64())])
    bounds = [round(i * len(pdf) / 3) for i in range(4)]
    for i in range(3):
        f = os.path.join(d, f"c{i}.parquet")
        pq.write_table(pa.Table.from_pandas(
            pdf.iloc[bounds[i]:bounds[i + 1]], schema=schema,
            preserve_index=False), f)
        os.utime(f, (time.time() + i, time.time() + i))
    sent = pd.DataFrame({"ts": [pdf["ts"].max() + pd.Timedelta(days=30)],
                         "source": ["SENTINEL"], "value": [0.0]})
    f = os.path.join(d, "zz.parquet")
    pq.write_table(pa.Table.from_pandas(
        sent, schema=schema, preserve_index=False), f)
    os.utime(f, (time.time() + 9, time.time() + 9))

    stream = (spark.readStream
              .schema("ts timestamp, source string, value double")
              .option("maxFilesPerTrigger", "1").parquet(d))
    out = streaming_windowed_histogram(stream, ["source"], "value",
                                       bin_width=5.0)
    q = (out.writeStream.format("memory").queryName("hist_s")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["ws_epoch"], r["source"], r["bin"]): r["cnt"]
           for r in spark.table("hist_s").collect()}
    truth = {(r["ws_epoch"], r["source"], r["bin"]): r["cnt"]
             for r in batch_windowed_histogram(
                 spark.createDataFrame(pdf), ["source"], "value",
                 bin_width=5.0).collect()}
    # exact equality: batch twin runs on the sentinel-free frame, and
    # the sentinel's own (never-closing) window is its only stream row
    # not emitted
    assert got == truth
    assert len({k[:2] for k in got}) == 8  # 4 hours x 2 sources

    # quantile reconstruction on the emitted rows == batch twin's
    stream_q = {(r["ws_epoch"], r["source"], r["q"]): (r["n"], r["est"])
                for r in histogram_quantiles(
                    spark.table("hist_s"),
                    ["ws_epoch", "source"], [0.5, 0.95],
                    bin_width=5.0).collect()}
    batch_q = {(r["ws_epoch"], r["source"], r["q"]): (r["n"], r["est"])
               for r in histogram_quantiles(
                   batch_windowed_histogram(
                       spark.createDataFrame(pdf), ["source"], "value",
                       bin_width=5.0),
                   ["ws_epoch", "source"], [0.5, 0.95],
                   bin_width=5.0).collect()}
    assert stream_q == batch_q


def test_streaming_windowed_count_min_matches_batch(spark, tmp_path):
    """Windowed CM cells stream == batch bit-for-bit (exact longs,
    order-insensitive merge); per-window estimates never undercount."""
    from bigdata_event_stream_detection_spark.operators.sketches import (
        count_min_estimate,
    )
    from bigdata_event_stream_detection_spark.streaming.sketches import (
        batch_windowed_count_min,
        streaming_windowed_count_min,
    )

    pdf = _make_events().sort_values("ts").reset_index(drop=True)
    d = str(tmp_path / "in_cm")
    os.makedirs(d)
    bounds = [round(i * len(pdf) / 3) for i in range(4)]
    for i in range(3):
        f = os.path.join(d, f"c{i}.parquet")
        pq.write_table(pa.Table.from_pandas(
            pdf.iloc[bounds[i]:bounds[i + 1]], schema=ARROW_SCHEMA,
            preserve_index=False), f)
        os.utime(f, (time.time() + i, time.time() + i))
    sent = pd.DataFrame({"ts": [pdf["ts"].max() + pd.Timedelta(days=30)],
                         "source": ["SENTINEL"], "user_id": [0]})
    f = os.path.join(d, "zz.parquet")
    pq.write_table(pa.Table.from_pandas(
        sent, schema=ARROW_SCHEMA, preserve_index=False), f)
    os.utime(f, (time.time() + 9, time.time() + 9))

    stream = (spark.readStream
              .schema("ts timestamp, source string, user_id long")
              .option("maxFilesPerTrigger", "1").parquet(d))
    out = streaming_windowed_count_min(stream, "user_id",
                                       width=64, depth=3)
    q = (out.writeStream.format("memory").queryName("cm_s")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.table("cm_s").collect()))

    batch = batch_windowed_count_min(
        spark.createDataFrame(pdf), "user_id", width=64, depth=3)
    want = sorted(map(tuple, batch.collect()))
    # closed windows equal the batch twin bit-for-bit (pdf holds only
    # real events; the sentinel's own window never closes and never
    # emits, so both sides cover exactly the 6 real hours)
    assert got == want

    # per-window probe: estimates from one window's cells never
    # undercount that window's true counts
    w0 = spark.table("cm_s").filter(
        F.col("ws_epoch") == got[0][0]).select("row", "bucket", "cnt")
    ev0 = spark.createDataFrame(pdf)
    ev0 = ev0.filter(F.unix_timestamp(
        F.window("ts", "1 hour").start) == got[0][0])
    est = {r["value"]: r["est"] for r in count_min_estimate(
        w0, ev0.select(F.col("user_id").cast("string").alias("v")),
        "v", width=64, depth=3).collect()}
    true = {str(r["user_id"]): r["n"] for r in
            ev0.groupBy("user_id").agg(F.count("*").alias("n"))
            .collect()}
    assert all(est[v] >= n for v, n in true.items())
