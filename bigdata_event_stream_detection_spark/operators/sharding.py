"""Epoch shuffling and trainer-shard export — the pipeline's last mile.

A training job does not consume a DataFrame; it consumes SHARDS: files
of sequences in a pseudo-random order that changes every epoch but is
bit-reproducible for a given (seed, epoch). This module provides that
step for the input-hint table shape ``(doc_id, tokens, n_tok, source)``
(and any table with a stable key column):

* ``shard_assignments`` — adds ``order_key`` (the epoch-shuffle sort
  key) and ``shard_id`` as ONE pure-Column md5 hash of
  (seed, epoch, key). No shuffle, no state, no RNG: membership and
  order are functions of the key alone, so the result is identical at
  any parallelism / partitioning / replay — the same replay-stability
  contract as ``sampling.hash_split`` and the objectives transforms.
* ``epoch_shuffled`` — a total pseudo-random order over the corpus
  (range-partitioned sort on ``order_key``; Spark samples boundaries,
  so no single-partition stage).
* ``shard_manifest`` — per-shard doc/token/source accounting, one
  hash aggregation. Shard balance at scale is statistical (hash
  uniformity: relative spread ~ 1/sqrt(rows_per_shard)); the manifest
  is how a pipeline VERIFIES the balance instead of trusting it.
* ``write_training_shards`` — materializes ``shard=K/`` parquet
  directories, rows ordered by ``order_key`` within each shard, plus a
  ``_manifest`` the trainer (and tests) can reconcile against. One
  repartition on ``shard_id`` is the only shuffle; within-shard order
  comes from ``sortWithinPartitions`` (never a global sort).

Advancing ``epoch`` re-derives every hash, which reshuffles both shard
membership and within-shard order deterministically — a full-corpus
epoch reshuffle with zero saved state.

The reference's analogue is the explicit repartition it performs
before every distributed sweep (em/EmAlgo.java:115,
evolutiongraph/KLDivergence.java:42, hmm/Hmm2.java:592 — each
re-materializes repartitioned RDD blocks per pass); this expresses the
same need as a pure column derivation so Catalyst pipelines it into
the scan and the layout is reproducible rather than planner-chosen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import hash60

SHARD_SALT = "shard"


def epoch_order_key(
    key: Column, seed: int = 0, epoch: int = 0
) -> Column:
    """60-bit md5 hash of (salt, seed, epoch, key): the shuffle key.

    Portable to the DuckDB oracles via the standard hash60 form
    (CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)).
    """
    return hash60(
        F.concat_ws(
            "|",
            F.lit(SHARD_SALT),
            F.lit(str(int(seed))),
            F.lit(str(int(epoch))),
            key.cast("string"),
        )
    )


def shard_assignments(
    df: DataFrame,
    n_shards: int,
    seed: int = 0,
    epoch: int = 0,
    key_col: str = "doc_id",
) -> DataFrame:
    """Add ``order_key`` and ``shard_id`` columns (pure codegen).

    ``shard_id = order_key % n_shards`` — within a shard, ordering by
    ``order_key`` walks the residue class in hash order, which is a
    uniform pseudo-random permutation of the shard's members. One hash
    serves both membership and order, and both roll over cleanly when
    ``epoch`` advances.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = epoch_order_key(F.col(key_col), seed=seed, epoch=epoch)
    return df.withColumn("order_key", h).withColumn(
        "shard_id", (F.col("order_key") % F.lit(int(n_shards))).cast("int")
    )


def epoch_shuffled(
    df: DataFrame,
    seed: int = 0,
    epoch: int = 0,
    key_col: str = "doc_id",
) -> DataFrame:
    """Corpus in epoch-shuffle order: sort by (order_key, key).

    The key tiebreak makes the order total even under (vanishingly
    unlikely) 60-bit collisions, so downstream consumers are
    bit-reproducible, not just distribution-reproducible.
    """
    h = epoch_order_key(F.col(key_col), seed=seed, epoch=epoch)
    return df.withColumn("order_key", h).orderBy("order_key", key_col)


def shard_manifest(
    assigned: DataFrame,
    n_tok_col: str | None = "n_tok",
    source_col: str | None = "source",
) -> DataFrame:
    """Per-shard accounting: (shard_id, n_docs, n_tokens, n_sources,
    min_key, max_key). One hash aggregation over the assigned frame.

    ``min_key``/``max_key`` double as a cheap cross-run integrity
    fingerprint: two runs that agree on counts but disagree on
    membership will almost surely disagree on the extremes.
    """
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if n_tok_col is not None:
        aggs.append(F.sum(F.col(n_tok_col)).cast("long").alias("n_tokens"))
    if source_col is not None:
        aggs.append(F.countDistinct(F.col(source_col)).alias("n_sources"))
    aggs += [
        F.min("order_key").alias("min_key"),
        F.max("order_key").alias("max_key"),
    ]
    return assigned.groupBy("shard_id").agg(*aggs).orderBy("shard_id")


_PROBE_ARRAY_LIMIT = 4096


def _murmur3_int(x: int, seed: int = 42) -> int:
    """Murmur3_x86_32 of a single 4-byte int block, seed 42 — the hash
    behind Spark's ``F.hash``/``HashPartitioning`` for IntegerType.

    Pure driver-side Python so probe keys cost no Spark job; the test
    suite pins equality with ``pmod(F.hash(p), n)`` so any engine-side
    hash change would fail loudly, not mis-route silently.
    """
    c1, c2 = 0xCC9E2D51, 0x1B873593
    k = (x & 0xFFFFFFFF) * c1 & 0xFFFFFFFF
    k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
    k = k * c2 & 0xFFFFFFFF
    h = (seed ^ k) & 0xFFFFFFFF
    h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
    h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    h ^= 4  # fmix: total byte length
    h ^= h >> 16
    h = h * 0x85EBCA6B & 0xFFFFFFFF
    h ^= h >> 13
    h = h * 0xC2B2AE35 & 0xFFFFFFFF
    h ^= h >> 16
    return h - 0x100000000 if h >= 0x80000000 else h  # as signed int32


def _partition_probe_keys(spark, n_parts: int) -> list[int]:
    """Ints ``p[b]`` with ``pmod(hash(p[b]), n_parts) == b`` for every
    bucket ``b`` — the exact preimages that make ``repartition(n, col)``
    a 1:1 bucket->partition map.

    ``repartition(n, col)`` places a row by ``pmod(murmur3(col), n)``,
    so distinct bucket ids collide like balls in bins: ~1/e of the
    write tasks come up empty and the heaviest carries ~3 shards — a
    3x straggler on every epoch write at any scale. Walking integers
    until every bucket has a preimage (expected ~n ln n probes,
    computed driver-side in microseconds) and routing each shard
    through its preimage gives every shard its own task,
    deterministically, with no extra Spark job per epoch write.
    """
    probes: dict[int, int] = {}
    p = 0
    while len(probes) < n_parts:
        b = _murmur3_int(p) % n_parts  # pmod: n_parts > 0
        if b not in probes:
            probes[b] = p
        p += 1
    return [probes[b] for b in range(n_parts)]


def _ready_for_write(
    assigned: DataFrame, n_shards: int, files_per_shard: int
) -> DataFrame:
    """Repartition so bucket (shard_id[, sub_file]) -> its OWN task.

    The bucket index routes through a probe key (``_partition_probe_keys``)
    so the exchange lands bucket b in partition b exactly — no empty
    write tasks, no multi-shard stragglers. Small bucket counts inline
    the probe table as an array literal (pure codegen); large ones
    broadcast-join it.
    """
    n_parts = int(n_shards) * int(files_per_shard)
    spark = assigned.sparkSession
    probes = _partition_probe_keys(spark, n_parts)
    if files_per_shard == 1:
        bucket = F.col("shard_id")
    else:
        # integer div, not `/`: order_key is 60-bit and float division
        # would lose the low digits above 2^53
        sub = (
            F.expr(f"order_key div {int(n_shards)}")
            % F.lit(int(files_per_shard))
        ).cast("int")
        bucket = F.col("shard_id") * F.lit(int(files_per_shard)) + sub
    if n_parts <= _PROBE_ARRAY_LIMIT:
        pk = F.element_at(
            F.array(*[F.lit(p) for p in probes]), bucket + F.lit(1)
        )
        keyed = assigned.withColumn("_pk", pk)
    else:
        probe_df = F.broadcast(
            spark.createDataFrame(
                [(b, p) for b, p in enumerate(probes)], "_bucket int, _pk int"
            )
        )
        keyed = assigned.withColumn("_bucket", bucket).join(
            probe_df, "_bucket"
        ).drop("_bucket")
    return keyed.repartition(n_parts, "_pk").drop("_pk")


def write_training_shards(
    assigned: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    n_tok_col: str | None = "n_tok",
    source_col: str | None = "source",
    files_per_shard: int = 1,
    exchange: str = "preimage",
) -> None:
    """Materialize ``<path>/shard_id=K/`` parquet dirs + ``_manifest``.

    The repartition routes every shard to its OWN task (see
    ``_ready_for_write`` — a probe-key exchange, not raw shard_id
    hashing, so no empty tasks and no multi-shard stragglers), so
    each shard directory holds one file whose row order IS the epoch
    order — parquet preserves task row order, and
    ``sortWithinPartitions`` established it without a global sort.

    ``files_per_shard > 1`` is the task-size bound for giant corpora:
    at 10^12 sequences a one-task-per-shard write would hand each task
    corpus/n_shards rows, so the repartition key widens to
    (shard_id, sub_file) — ``sub_file = (order_key / n_shards) %
    files_per_shard``, a second independent digit of the same hash —
    and every shard directory lands as ``files_per_shard`` files, each
    internally sorted by ``order_key``. Readers of multi-file shards
    must merge by the persisted ``order_key`` (it is kept in the data
    for exactly that reason); the single-file default keeps the
    stronger file-order-IS-epoch-order contract.

    The ``_manifest`` directory is underscore-prefixed so Spark's file
    index treats it as hidden — reading ``<path>`` back yields only
    shard rows.

    The manifest is aggregated from the WRITTEN files, not from the
    input plan: it fingerprints what is actually on disk (the property
    a trainer reconciles against), and the column-pruned parquet read
    touches only the few scalar columns it needs — no second pass over
    the token arrays and no re-derivation of the md5 order keys.

    ``exchange`` picks the write topology:

    * ``"preimage"`` (default) — one corpus exchange routes every
      shard to its own task; each shard directory holds
      ``files_per_shard`` file(s) and the single-file layout's
      file order IS the epoch order. Right when shard file count
      matters more than shuffle cost.
    * ``"none"`` — ZERO-SHUFFLE export: every input task sorts its own
      rows by (shard_id, order_key) and the partitioned write splits
      them into per-shard files directly — the corpus never crosses an
      exchange, so the job is a pure scan→sort→encode map that scales
      with cores/executors instead of with shuffle bandwidth. Each
      shard directory holds up to one file PER INPUT PARTITION; the
      trainer merges by the persisted ``order_key`` (the standard
      multi-file contract). At 10^12 sequences re-shuffling the corpus
      every epoch is the bottleneck, so this is the giant-corpus path;
      bound the file count by coalescing the input upstream.
    """
    if files_per_shard < 1:
        raise ValueError("files_per_shard must be >= 1")
    if exchange not in ("preimage", "none"):
        raise ValueError(f"unknown exchange {exchange!r}")
    spark = assigned.sparkSession
    if exchange == "none":
        ready = assigned
    else:
        ready = _ready_for_write(assigned, n_shards, files_per_shard)
    (
        ready.sortWithinPartitions("shard_id", "order_key", key_col)
        .write.partitionBy("shard_id")
        .mode("overwrite")
        .parquet(path)
    )
    written = spark.read.parquet(path).withColumn(
        "shard_id", F.col("shard_id").cast("int")
    )
    manifest = shard_manifest(
        written, n_tok_col=n_tok_col, source_col=source_col
    )
    manifest.coalesce(1).write.mode("overwrite").json(path + "/_manifest")


def read_manifest(spark, path: str) -> DataFrame:
    """Read back the manifest written by ``write_training_shards``."""
    return spark.read.json(path + "/_manifest")
