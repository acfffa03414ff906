"""The north-star pipeline end-to-end over the table format:

    icelite sequences table --(snapshot-incremental stream)-->
    stateful windowed EM+HMM event detection --(exactly-once
    transactional sink)--> icelite events table

and the emitted event rows must EQUAL the batch flagship on the same
corpus (the engine's parity invariant), with the sink's snapshot
history recording one atomic commit per non-empty micro-batch.

Micro-batch structure: the corpus is appended in chronological chunks,
each drained by its own `available_now_drain` call sharing one
checkpoint — every drain is a fresh query over the checkpoint, so the
production restart path is exercised per chunk. The final chunk is ONE
far-future sentinel (3 tokens < min_doc_tokens, contributes nothing)
that advances the watermark past every real window; the drain's
run-to-quiescence lets Spark's no-data micro-batch fire the final
timeout sweep inside the same run (availableNow runs cannot — their
event-time stats die at termination, see available_now_drain).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from bigdata_event_stream_detection_spark.operators import background as bg
from bigdata_event_stream_detection_spark.plans.pipeline import (
    detect_event_stream,
    small_params,
)
from bigdata_event_stream_detection_spark.sources import icelite
from bigdata_event_stream_detection_spark.sources.icelite_source import (
    available_now_drain,
)
from bigdata_event_stream_detection_spark.sources.tables import (
    read_sequences_stream,
)
from bigdata_event_stream_detection_spark.streaming.engine import (
    streaming_detect_events,
)
from bigdata_event_stream_detection_spark.streaming.icelite_sink import (
    start_append_sink,
)

PARAMS = small_params(
    num_themes=3, window_length="1 hour", em_iterations=5,
    min_doc_tokens=5, min_word_corpus_count=2, bw_max_iterations=5,
    watermark_delay="10 minutes",
)


def test_flagship_end_to_end_over_icelite(spark, tiny_sequences,
                                          tmp_path):
    seqs = tiny_sequences
    model = bg.background_model(
        seqs.filter(F.col("n_tok") >= PARAMS.min_doc_tokens),
        min_count=PARAMS.min_word_corpus_count)
    batch_events = detect_event_stream(seqs, PARAMS)
    batch_rows = {
        (r["window_start"], r["source"], r["theme_id"]): r["strength"]
        for r in batch_events.collect()}
    assert batch_rows, "fixture must produce events"

    # sequences table, appended in three chronological chunks + sentinel
    src_tbl = str(tmp_path / "sequences")
    icelite.create_table(src_tbl, seqs.schema)
    t_lo, t_hi = seqs.agg(F.min("event_time"), F.max("event_time")).first()
    span = (t_hi - t_lo) / 3
    cuts = [t_lo + span, t_lo + 2 * span]
    chunks = [
        seqs.filter(F.col("event_time") < cuts[0]),
        seqs.filter((F.col("event_time") >= cuts[0])
                    & (F.col("event_time") < cuts[1])),
        seqs.filter(F.col("event_time") >= cuts[1]),
    ]
    # ONE far-future sentinel: available_now_drain runs to quiescence,
    # so the no-data micro-batch after the sentinel batch fires the
    # final timeout sweep inside the same run
    sentinel = spark.createDataFrame(
        [("__sentinel__", [1, 2, 3], 3, "sentinel",
          t_hi + datetime.timedelta(days=365))], seqs.schema)

    events_tbl = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    def start():
        stream = read_sequences_stream(spark, src_tbl, fmt="icelite")
        events = streaming_detect_events(stream, model.toPandas(), PARAMS)
        return start_append_sink(events, events_tbl, ckpt)

    def run_once():
        available_now_drain(start, src_tbl, timeout_s=600)

    for chunk in chunks:
        icelite.append(chunk, src_tbl)
        run_once()
    icelite.append(sentinel, src_tbl)
    run_once()

    got = {
        (r["window_start"], r["source"], r["theme_id"]): r["strength"]
        for r in icelite.read_table(spark, events_tbl).collect()}
    assert got == batch_rows

    # sink history: every event row arrived via an atomic stamped
    # snapshot commit; re-running with no new input adds nothing
    history = icelite.snapshots(events_tbl)
    stamped = [s for s in history
               if s["summary"].get("stream_batch_id") is not None]
    assert stamped and all(s["operation"] == "append" for s in stamped)
    n_before = len(history)
    run_once()
    assert len(icelite.snapshots(events_tbl)) == n_before
    assert (icelite.read_table(spark, events_tbl).count()
            == len(batch_rows))
