"""Streaming model-based scoring (streaming/classify.py): every
arriving micro-batch scored against a statically trained NB model;
output equals the batch nb_classify on the same docs (parity), and
replay is idempotent by construction (batch_id-keyed overwrite).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from bigdata_event_stream_detection_spark.operators.classifier import (
    nb_classify, nb_train,
)
from bigdata_event_stream_detection_spark.streaming.classify import (
    classify_stream,
)

_DOC_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("text", pa.string()),
])


def _write(rows, path, name):
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(rows, columns=["doc_id", "text"]),
            schema=_DOC_SCHEMA, preserve_index=False),
        os.path.join(path, name))


def test_classify_stream_matches_batch(spark, tmp_path):
    train = spark.createDataFrame(
        [(i, "buy cheap pills now", "spam") for i in range(20)]
        + [(20 + i, "meeting agenda notes", "ham") for i in range(20)],
        "doc_id long, text string, lang string")
    cond, priors = nb_train(train)

    d = str(tmp_path / "docs")
    os.makedirs(d)
    _write([(100, "cheap pills today"), (101, "agenda for the meeting")],
           d, "a.parquet")
    _write([(102, "pills pills pills"), (103, "")], d, "b.parquet")

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1").parquet(d))
    out_dir = str(tmp_path / "scored")
    q = classify_stream(stream, cond, priors, out_dir,
                        str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(300)

    got = (spark.read.parquet(out_dir)
           .select("doc_id", "pred_label", "score").collect())
    want = nb_classify(
        spark.read.parquet(d), cond, priors).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    labels = {r["doc_id"]: r["pred_label"] for r in got}
    assert labels[100] == "spam" and labels[102] == "spam"
    assert labels[101] == "ham"
