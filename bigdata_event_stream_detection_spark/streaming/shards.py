"""Continuous trainer-shard sink: curation stream -> sharded parquet.

``sharding.shard_assignments`` is a stateless Column derivation, so it
runs UNCHANGED on a readStream — membership and order key for a doc are
decided the moment it arrives, identically to the batch path (same
hash, same (seed, epoch)). This module is just the sink side: the
assigned stream lands in ``shard_id=K/`` directories through the
parquet file sink, whose ``_spark_metadata`` manifest + checkpoint make
it exactly-once under restart (same contract as
``engine.start_event_sink``).

Ordering note: a stream appends files over time, so the on-disk row
order of a shard is arrival order, not epoch order. The persisted
``order_key`` column is the order authority — a trainer (or the batch
``read_manifest`` reconciliation) sorts by it within the shard, which
is exactly why ``shard_assignments`` keeps it in the data. Everything
else about the shards — membership, key, token arrays — is
byte-identical to what ``write_training_shards`` would have produced
on the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.sharding import shard_assignments


def start_shard_stream_sink(
    stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    n_shards: int,
    seed: int = 0,
    epoch: int = 0,
    key_col: str = "doc_id",
    available_now: bool = False,
    processing_time: str | None = None,
):
    """Assign shards on the stream and append to a partitioned,
    exactly-once parquet sink. Returns the StreamingQuery."""
    assigned = shard_assignments(
        stream, n_shards, seed=seed, epoch=epoch, key_col=key_col
    )
    writer = (
        assigned.writeStream
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("shard_id")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
