"""Streaming dedup: bounded-state exact dedup + per-batch LSH pairs.

Same fixture conventions as tests/test_streaming.py: chronological
parquet chunks with increasing mtimes; a far-future sentinel advances
the watermark so `dropDuplicatesWithinWatermark` state can evict.
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from bigdata_event_stream_detection_spark.streaming.dedup import (
    dedup_exact_stream,
    dedup_history_stream,
    dedup_minhash_stream,
    with_content_hash,
)
from bigdata_event_stream_detection_spark.streaming.engine import (
    SEQUENCE_SCHEMA,
)

ARROW_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("tokens", pa.list_(pa.int32())),
    ("n_tok", pa.int32()),
    ("source", pa.string()),
    ("event_time", pa.timestamp("us")),
])


def _write(pdf, path, name, mtime):
    f = os.path.join(path, name)
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=ARROW_SCHEMA, preserve_index=False),
        f)
    os.utime(f, (mtime, mtime))


def _seq_rows(ids_toks_times):
    return pd.DataFrame({
        "doc_id": [d for d, _, _ in ids_toks_times],
        "tokens": [t for _, t, _ in ids_toks_times],
        "n_tok": [len(t) for _, t, _ in ids_toks_times],
        "source": ["s0"] * len(ids_toks_times),
        "event_time": pd.to_datetime([ts for _, _, ts in ids_toks_times]),
    })


def test_dedup_exact_stream_drops_in_horizon_dups(spark, tmp_path):
    d = str(tmp_path / "seq")
    os.makedirs(d)
    toks_a = list(range(10))
    toks_b = list(range(5, 25))
    t0 = time.time()
    # batch 1: original A + copy of A from another feed + B
    _write(_seq_rows([
        ("a1", toks_a, "2020-01-01 00:00"),
        ("a2", toks_a, "2020-01-01 00:10"),   # exact dup inside horizon
        ("b1", toks_b, "2020-01-01 00:20"),
    ]), d, "c1.parquet", t0)
    # batch 2: another A dup still within the 1h horizon + sentinel
    _write(_seq_rows([
        ("a3", toks_a, "2020-01-01 00:40"),
        ("zz", list(range(30)), "2030-01-01 00:00"),
    ]), d, "c2.parquet", t0 + 1)

    stream = (spark.readStream.schema(SEQUENCE_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(d))
    out = dedup_exact_stream(stream, watermark_delay="1 hour")
    q = (out.writeStream.format("memory").queryName("dedup_exact")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = spark.sql(
        "select doc_id from dedup_exact order by doc_id").toPandas()
    kept = set(got["doc_id"])
    # exactly one survivor per content, duplicates a2/a3 dropped
    assert "a1" in kept and "b1" in kept and "zz" in kept
    assert "a2" not in kept and "a3" not in kept
    assert len(kept) == 3


def test_content_hash_is_token_exact(spark):
    pdf = _seq_rows([
        ("x", [1, 2, 3], "2020-01-01"),
        ("y", [1, 2, 3], "2020-01-02"),
        ("z", [1, 23], "2020-01-03"),     # "1,23" vs "1,2,3" must differ
    ])
    df = with_content_hash(spark.createDataFrame(pdf, SEQUENCE_SCHEMA))
    h = {r["doc_id"]: r["content_hash"] for r in df.collect()}
    assert h["x"] == h["y"]
    assert h["x"] != h["z"]


def test_dedup_minhash_stream_finds_near_dups(spark, tmp_path):
    docs = pd.DataFrame({
        "doc_id": ["d1", "d2", "d3"],
        "text": [
            "the quick brown fox jumps over the lazy dog again and again",
            "the quick brown fox jumps over the lazy dog again and again!",
            "completely different content with no overlap whatsoever here",
        ],
        "event_time": pd.to_datetime(
            ["2020-01-01", "2020-01-01", "2020-01-01"]),
    })
    d = str(tmp_path / "docs")
    os.makedirs(d)
    f = os.path.join(d, "c1.parquet")
    doc_schema = pa.schema([("doc_id", pa.string()), ("text", pa.string()),
                            ("event_time", pa.timestamp("us"))])
    pq.write_table(
        pa.Table.from_pandas(docs, schema=doc_schema, preserve_index=False),
        f)

    stream = (spark.readStream
              .schema("doc_id string, text string, event_time timestamp")
              .parquet(d))
    out_dir = str(tmp_path / "pairs")
    q = dedup_minhash_stream(
        stream, out_dir, str(tmp_path / "ckpt2"), available_now=True)
    q.awaitTermination(300)
    pairs = spark.read.parquet(out_dir).toPandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs["doc1"], pairs["doc2"])}
    assert ("d1", "d2") in got
    assert all("d3" not in p for p in got)


def test_dedup_clusters_stream_assigns_transitive_clusters(spark, tmp_path):
    from bigdata_event_stream_detection_spark.streaming.dedup import (
        dedup_clusters_stream,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = pd.DataFrame({
        # d1~d2 and d2~d3 near-dups -> one transitive cluster {d1,d2,d3}
        "doc_id": ["d1", "d2", "d3", "d4"],
        "text": [base, base + "!", base + "!?", "totally unrelated words"],
        "event_time": pd.to_datetime(["2020-01-01"] * 4),
    })
    d = str(tmp_path / "docs")
    os.makedirs(d)
    doc_schema = pa.schema([("doc_id", pa.string()), ("text", pa.string()),
                            ("event_time", pa.timestamp("us"))])
    pq.write_table(
        pa.Table.from_pandas(docs, schema=doc_schema, preserve_index=False),
        os.path.join(d, "c1.parquet"))

    stream = (spark.readStream
              .schema("doc_id string, text string, event_time timestamp")
              .parquet(d))
    out_dir = str(tmp_path / "clusters")
    q = dedup_clusters_stream(
        stream, out_dir, str(tmp_path / "ckpt3"), available_now=True)
    q.awaitTermination(300)
    got = spark.read.parquet(out_dir).toPandas()
    rows = {r.doc_id: (r.cluster_id, r.is_representative)
            for r in got.itertuples()}
    assert rows["d1"] == ("d1", 1)
    assert rows["d2"][0] == "d1" and rows["d3"][0] == "d1"
    assert rows["d4"] == ("d4", 1)


def test_dedup_history_stream_flags_cross_batch_dups(spark, tmp_path):
    d = str(tmp_path / "hist_docs")
    os.makedirs(d)
    A = "the quick brown fox jumps over the lazy dog near the river bank"
    B = "a completely different story about ships sailing the open sea"
    C = "yet another unrelated text describing mountains and snow"

    def _wdocs(rows, name, mtime):
        f = os.path.join(d, name)
        pq.write_table(pa.Table.from_pandas(
            pd.DataFrame(rows, columns=["doc_id", "text"]),
            schema=pa.schema([("doc_id", pa.string()),
                              ("text", pa.string())]),
            preserve_index=False), f)
        os.utime(f, (mtime, mtime))

    t0 = time.time()
    _wdocs([("d1", A), ("d2", B)], "b1.parquet", t0)
    # d3 duplicates d1 ACROSS batches; d4/d4b duplicate WITHIN the batch
    _wdocs([("d3", A), ("d4", C), ("d4b", C)], "b2.parquet", t0 + 10)

    stream = (spark.readStream.schema("doc_id string, text string")
              .option("maxFilesPerTrigger", "1").parquet(d))
    out_dir = str(tmp_path / "dups")
    store = str(tmp_path / "sigstore")
    q = dedup_history_stream(stream, store, out_dir,
                             str(tmp_path / "ckpt_hist"),
                             available_now=True)
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir).toPandas()
    flagged = dict(zip(got["doc_id"], got["dup_of"]))
    # cross-batch dup flagged against its historical original...
    assert flagged == {"d3": "d1"}
    # ...and the signature store now covers every ingested doc
    sigs = spark.read.parquet(store + "/batch=*")
    assert (set(r["doc_id"] for r in sigs.select("doc_id")
                .distinct().collect())
            == {"d1", "d2", "d3", "d4", "d4b"})

    # late third batch: duplicates of BOTH earlier batches are found,
    # with the smallest historical id as the canonical ancestor
    _wdocs([("d5", A), ("d6", C)], "b3.parquet", t0 + 20)
    q2 = dedup_history_stream(
        (spark.readStream.schema("doc_id string, text string")
         .option("maxFilesPerTrigger", "1").parquet(d)),
        store, out_dir, str(tmp_path / "ckpt_hist"),
        available_now=True)
    q2.awaitTermination(300)
    got2 = spark.read.parquet(out_dir).toPandas()
    flagged2 = dict(zip(got2["doc_id"], got2["dup_of"]))
    assert flagged2 == {"d3": "d1", "d5": "d1", "d6": "d4"}
