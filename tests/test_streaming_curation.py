"""Continuous curation pass (streaming/curation.py): stateless gates
stream unchanged, dedup is watermark-bounded, PII is redacted on the
way out."""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from bigdata_event_stream_detection_spark.streaming.curation import (
    curate_document_stream,
)

GOOD = ("the and of to in is on for with a " * 12
        + "contact alice@example.com now")
GOOD2 = "a the of and to in on is for with " * 15
BAD = "@@@@@ !!!!! ##### $$$$$ %%%%%"

ARROW_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("ts", pa.timestamp("us")),
])


def test_curate_document_stream(spark, tmp_path):
    t0 = datetime(2024, 5, 1)
    chunk0 = pd.DataFrame([
        ("keep-email", GOOD, "en", t0),
        ("bad-quality", BAD, "en", t0 + timedelta(minutes=1)),
        ("wrong-lang", GOOD2, "fr", t0 + timedelta(minutes=2)),
    ], columns=["doc_id", "text", "lang", "ts"])
    chunk1 = pd.DataFrame([
        ("dup-of-keep", GOOD, "en", t0 + timedelta(minutes=10)),
        ("keep-2", GOOD2, "en", t0 + timedelta(minutes=11)),
    ], columns=["doc_id", "text", "lang", "ts"])

    d = str(tmp_path / "in")
    os.makedirs(d)
    for i, chunk in enumerate([chunk0, chunk1]):
        f = os.path.join(d, f"c{i}.parquet")
        pq.write_table(pa.Table.from_pandas(
            chunk, schema=ARROW_SCHEMA, preserve_index=False), f)
        os.utime(f, (time.time() + i, time.time() + i))

    stream = (spark.readStream
              .schema("doc_id string, text string, lang string, ts timestamp")
              .option("maxFilesPerTrigger", "1").parquet(d))
    out = curate_document_stream(stream, {"en": 1.0}, quality_min=0.5)
    q = (out.writeStream.format("memory").queryName("curated")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {r["doc_id"]: r for r in spark.table("curated").collect()}

    # quality floor, language mix, and within-watermark dedup applied
    assert set(rows) == {"keep-email", "keep-2"}
    # PII redacted on the way out
    assert "<EMAIL>" in rows["keep-email"]["text"]
    assert "alice@example.com" not in rows["keep-email"]["text"]
    # untouched columns pass through
    assert rows["keep-2"]["lang"] == "en"


def test_curate_stream_with_model_gate(spark, tmp_path):
    from bigdata_event_stream_detection_spark.operators.classifier import (
        nb_gate_expr, nb_train,
    )

    SPAM = "buy cheap pills now offer " * 20
    train = spark.createDataFrame(
        [(i, GOOD, "keep") for i in range(10)]
        + [(100 + i, SPAM, "drop") for i in range(10)],
        "doc_id long, text string, lang string")
    cond, priors = nb_train(train)
    gate = nb_gate_expr(cond, priors, "keep", "drop")

    t0 = datetime(2024, 5, 1)
    chunk = pd.DataFrame([
        ("ok", GOOD2, "en", t0),
        ("spammy", SPAM, "en", t0 + timedelta(minutes=1)),
    ], columns=["doc_id", "text", "lang", "ts"])
    d = str(tmp_path / "in_gate")
    os.makedirs(d)
    pq.write_table(pa.Table.from_pandas(
        chunk, schema=ARROW_SCHEMA, preserve_index=False),
        os.path.join(d, "c0.parquet"))

    stream = (spark.readStream.schema(
        "doc_id string, text string, lang string, ts timestamp")
        .parquet(d))
    out = curate_document_stream(
        stream, {"en": 1.0}, quality_min=0.0, gate_expr=gate)
    q = (out.writeStream.format("memory").queryName("gated_curation")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    kept = [r["doc_id"] for r in
            spark.sql("select doc_id from gated_curation").collect()]
    assert kept == ["ok"]
