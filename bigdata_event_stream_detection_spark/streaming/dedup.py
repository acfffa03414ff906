"""Streaming deduplication for the sequences stream.

Training-data pipelines dedup at ingest: the same article arrives from
multiple feeds (exact dup) or as a near-identical rewrite. These
operators run the batch dedup semantics (operators/dedup.py) under
readStream with bounded state:

* ``dedup_exact_stream`` — drop exact content duplicates via
  ``dropDuplicatesWithinWatermark`` on the content hash: state for a
  key is reclaimable once the event-time watermark passes, so state
  stays bounded by the watermark horizon instead of growing forever
  (the classic unbounded-``dropDuplicates`` failure at stream scale).
* ``dedup_minhash_stream`` — per-micro-batch MinHash/LSH candidate
  pairs via ``foreachBatch`` reusing the BATCH operators verbatim:
  near-dup detection needs a join within the batch's accumulation
  window, which is exactly the tumbling-ingest shape (dedup horizon =
  trigger interval).

Both keep every computation as Column expressions / batch operators —
no new kernel code, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_content_hash(stream: DataFrame, token_col: str = "tokens") -> DataFrame:
    """Deterministic content key: md5 over the exact int sequence.

    Hashing the joined token ids (not the raw text) makes the key
    stable across sources that tokenized identically — the engine's
    byte-level token-array invariant guarantees that is well-defined.
    """
    return stream.withColumn(
        "content_hash",
        F.md5(F.concat_ws(",", F.col(token_col).cast("array<string>"))))


def dedup_exact_stream(
    stream: DataFrame,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Exactly-once exact dedup under readStream.

    ``dropDuplicatesWithinWatermark`` keeps one row per content hash
    among rows whose event times fall within the watermark horizon of
    each other, and — unlike plain ``dropDuplicates`` on a stream —
    evicts each key's state once the watermark passes its event time,
    so state size is bounded by (arrival rate x watermark delay)
    regardless of stream lifetime. Duplicates separated by more than
    the horizon are by definition re-admitted; that is the documented
    trade-off of bounded-state streaming dedup.
    """
    return (
        with_content_hash(stream)
        .withWatermark("event_time", watermark_delay)
        .dropDuplicatesWithinWatermark(["content_hash"])
        .drop("content_hash")
    )


def dedup_minhash_stream(
    stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    num_hashes: int = 8,
    shingle_k: int = 3,
    rows_per_band: int = 2,
    available_now: bool = False,
):
    """Near-dup candidate pairs per micro-batch (foreachBatch).

    Reuses the batch MinHash/LSH operators unchanged on each
    micro-batch: the batch's rows form the dedup horizon (a tumbling
    accumulation window), inside which the LSH band join finds
    candidate pairs. Output is idempotent under batch replay via the
    batch_id-keyed overwrite pattern (same as
    ``start_keyed_idempotent_sink``).

    The stream must carry a ``text`` column (pre-tokenized streams
    dedup exactly via ``dedup_exact_stream`` instead — shingling wants
    raw text).
    """
    from ..operators.dedup import lsh_candidate_pairs

    def write_batch(batch_df: DataFrame, batch_id: int):
        pairs = lsh_candidate_pairs(
            batch_df, num_hashes=num_hashes, shingle_k=shingle_k,
            rows_per_band=rows_per_band)
        (pairs.write.mode("overwrite")
         .parquet(f"{out_path}/batch_id={batch_id}"))

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(**({"availableNow": True} if available_now
                    else {"processingTime": "30 seconds"}))
        .start()
    )


def dedup_clusters_stream(
    stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    num_hashes: int = 8,
    shingle_k: int = 3,
    rows_per_band: int = 2,
    available_now: bool = False,
):
    """Transitive duplicate-cluster assignment per micro-batch.

    Composes the batch operators inside ``foreachBatch``: LSH candidate
    pairs -> connected components -> (doc_id, cluster_id,
    is_representative) over the batch's docs. The batch is the dedup
    horizon (same trade as ``dedup_minhash_stream``); output is
    idempotent under replay via the batch_id-keyed overwrite. A
    pipeline keeps ``is_representative == 1`` rows as the ingest
    survivors.
    """
    from ..operators.dedup import dedup_clusters, lsh_candidate_pairs

    def write_batch(batch_df: DataFrame, batch_id: int):
        pairs = lsh_candidate_pairs(
            batch_df, num_hashes=num_hashes, shingle_k=shingle_k,
            rows_per_band=rows_per_band)
        (dedup_clusters(batch_df, pairs)
         .write.mode("overwrite")
         .parquet(f"{out_path}/batch_id={batch_id}"))

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(**({"availableNow": True} if available_now
                    else {"processingTime": "30 seconds"}))
        .start()
    )


def dedup_history_stream(
    stream: DataFrame,
    signature_store_dir: str,
    out_path: str,
    checkpoint_path: str,
    num_hashes: int = 8,
    shingle_k: int = 3,
    rows_per_band: int = 2,
    available_now: bool = False,
):
    """Cross-batch near-dup detection against ALL history — the real
    production ingest question ("is this new doc a near-copy of
    anything among the 10^9 docs already ingested?"), which the
    within-batch LSH (``dedup_minhash_stream``) cannot answer.

    Per micro-batch: compute the batch's LSH band signatures, probe
    the persistent signature store for collisions (flagged rows emit
    (doc_id, dup_of) with the smallest colliding historical doc), then
    append this batch's signatures as a ``batch=<id>`` partition.
    Exactly-once under replay by construction: a replayed batch
    re-probes exactly the batches BEFORE it (``batch < batch_id``
    filter) and both writes are batch_id-keyed overwrites.

    Scale shape: the store is the band-signature relation — a few
    rows per doc, partitioned by batch; the probe is a (band,
    band_sig) equi-join, i.e. only docs colliding in some bucket ever
    meet (at 10^9 docs the store side would be bucketed/Z-ordered on
    the join key via sinks/maintenance so the probe prunes to the
    touched buckets; the relational shape here is already that one).
    """
    import os

    from ..operators.dedup import band_signatures

    def process(batch_df: DataFrame, batch_id: int):
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint(eager=True)
        if batch_df.isEmpty():
            return
        sig = band_signatures(
            batch_df, num_hashes=num_hashes,
            rows_per_band=rows_per_band, shingle_k=shingle_k,
        ).localCheckpoint(eager=True)
        if os.path.isdir(signature_store_dir) and any(
                e.startswith("batch=")
                for e in os.listdir(signature_store_dir)):
            store = (spark.read.option("basePath", signature_store_dir)
                     .parquet(signature_store_dir + "/batch=*")
                     .filter(F.col("batch") < batch_id))
            dups = (
                sig.join(
                    store.select(F.col("doc_id").alias("dup_of"),
                                 "band", "band_sig"),
                    ["band", "band_sig"])
                .groupBy("doc_id")
                .agg(F.min("dup_of").alias("dup_of"))
            )
        else:
            dups = (sig.select("doc_id").limit(0)
                    .withColumn("dup_of", F.col("doc_id")))
        dups.write.mode("overwrite").parquet(
            f"{out_path}/batch_id={batch_id}")
        sig.write.mode("overwrite").parquet(
            f"{signature_store_dir}/batch={batch_id}")

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(**({"availableNow": True} if available_now
                    else {"processingTime": "30 seconds"}))
        .start()
    )
