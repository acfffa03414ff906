"""Streaming model-based scoring: classify a document stream with a
pre-trained NB model (operators/classifier.py).

The production shape for quality/language filters at ingest: the model
is trained OFFLINE on a labeled slice (batch ``nb_train``), then every
arriving micro-batch is scored against the static model tables —
stream-static composition, the same pattern as the streaming BPE
encode. The model tables are persisted once before the query starts,
so micro-batches never re-run the training aggregation.

Scoring runs the batch ``nb_classify`` verbatim inside ``foreachBatch``
(its per-doc argmax window is not an append-mode streaming operator,
and per-batch is exactly the semantics wanted: every doc is scored
once, on arrival, independent of windowing). Output is idempotent
under batch replay via the batch_id-keyed overwrite pattern shared
with the dedup/evolution sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def classify_stream(
    stream: DataFrame,
    cond: DataFrame,
    priors: DataFrame,
    out_path: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = False,
):
    """Score every arriving document against the trained model; write
    (id, pred_label, score) per micro-batch, replay-idempotent."""
    from ..operators.classifier import nb_classify

    cond = cond.persist()
    priors = priors.persist()

    def write_batch(batch_df: DataFrame, batch_id: int):
        out = nb_classify(batch_df, cond, priors,
                          id_col=id_col, text_col=text_col)
        (out.write.mode("overwrite")
         .parquet(f"{out_path}/batch_id={batch_id}"))

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(**({"availableNow": True} if available_now
                    else {"processingTime": "30 seconds"}))
        .start()
    )
