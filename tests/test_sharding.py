"""Epoch shuffle / trainer-shard export invariants.

The contract under test is the replay-stability one: shard membership
and within-shard order are pure functions of (key, seed, epoch), so
they must be byte-identical across input partitionings (the local
stand-in for different cluster sizes), and an epoch advance must
reshuffle deterministically without losing or duplicating a row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_event_stream_detection_spark.operators.sharding import (
    epoch_shuffled,
    read_manifest,
    shard_assignments,
    shard_manifest,
    write_training_shards,
)

N_SHARDS = 8


@pytest.fixture(scope="module")
def assigned(tiny_sequences):
    df = shard_assignments(tiny_sequences, N_SHARDS, seed=7, epoch=1)
    df.cache().count()
    return df


def _membership(df):
    return {
        (r.doc_id, r.shard_id, r.order_key)
        for r in df.select("doc_id", "shard_id", "order_key").collect()
    }


def test_assignment_identical_across_partitionings(tiny_sequences, assigned):
    coarse = shard_assignments(
        tiny_sequences.repartition(2), N_SHARDS, seed=7, epoch=1)
    assert _membership(coarse) == _membership(assigned)


def test_exhaustive_and_disjoint(tiny_sequences, assigned):
    # every doc gets exactly one shard in [0, N)
    assert assigned.count() == tiny_sequences.count()
    bad = assigned.filter(
        (F.col("shard_id") < 0) | (F.col("shard_id") >= N_SHARDS))
    assert bad.count() == 0
    assert assigned.select("doc_id").distinct().count() == assigned.count()


def test_epoch_advance_reshuffles_without_loss(tiny_sequences, assigned):
    nxt = shard_assignments(tiny_sequences, N_SHARDS, seed=7, epoch=2)
    # same corpus either way
    assert (
        nxt.select("doc_id").sort("doc_id").collect()
        == assigned.select("doc_id").sort("doc_id").collect()
    )
    # but a real reshuffle: most docs move shards, all order keys change
    both = assigned.select("doc_id", "shard_id", "order_key").alias("a").join(
        nxt.select("doc_id", "shard_id", "order_key").alias("b"), "doc_id")
    moved = both.filter(F.col("a.shard_id") != F.col("b.shard_id")).count()
    total = both.count()
    assert moved > total * 0.5
    assert both.filter(F.col("a.order_key") == F.col("b.order_key")).count() == 0


def test_shard_balance_is_statistical(assigned):
    sizes = [r.n_docs for r in shard_manifest(assigned).collect()]
    assert len(sizes) == N_SHARDS
    mean = sum(sizes) / len(sizes)
    # 2000 docs / 8 shards = 250/shard; 5 sigma ~ 80 docs
    assert all(abs(s - mean) < 5 * mean**0.5 + 1 for s in sizes)


def test_epoch_shuffled_total_order(tiny_sequences):
    rows = epoch_shuffled(tiny_sequences, seed=7, epoch=1).select(
        "doc_id", "order_key").collect()
    keys = [(r.order_key, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    assert len(rows) == tiny_sequences.count()


def test_write_shards_round_trip(spark, assigned, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("shards") / "epoch1")
    write_training_shards(assigned, path, N_SHARDS)

    back = spark.read.parquet(path)
    # manifest reconciles against what was actually written
    man = {r.shard_id: r for r in read_manifest(spark, path).collect()}
    got = {
        r.shard_id: r
        for r in shard_manifest(back.withColumn(
            "shard_id", F.col("shard_id").cast("int"))).collect()
    }
    assert set(man) == set(got) == set(range(N_SHARDS))
    for sid in man:
        assert man[sid].n_docs == got[sid].n_docs
        assert man[sid].n_tokens == got[sid].n_tokens
        assert man[sid].min_key == got[sid].min_key
        assert man[sid].max_key == got[sid].max_key

    # within-shard file order IS the epoch order (parquet preserves
    # task row order; no global sort was involved)
    for sid in (0, N_SHARDS - 1):
        shard_rows = spark.read.parquet(
            f"{path}/shard_id={sid}").select("order_key", "doc_id").collect()
        keys = [(r.order_key, r.doc_id) for r in shard_rows]
        assert keys == sorted(keys)

    # token arrays survive the round trip byte-for-byte (north-rule
    # per-row invariant)
    orig = {r.doc_id: r.tokens for r in assigned.select(
        "doc_id", "tokens").collect()}
    for r in back.select("doc_id", "tokens").collect():
        assert orig[r.doc_id] == r.tokens


def test_write_repartition_is_one_task_per_shard(spark, assigned):
    """The write exchange must map every (shard, sub_file) bucket to
    its OWN task — no empty write slots, no multi-shard stragglers."""
    from bigdata_event_stream_detection_spark.operators.sharding import (
        _partition_probe_keys, _ready_for_write)

    # probe keys really are murmur3 preimages for every bucket index
    for n in (5, N_SHARDS, 257):
        probes = _partition_probe_keys(spark, n)
        got = spark.createDataFrame(
            [(p,) for p in probes], "p int"
        ).select(F.pmod(F.hash("p"), F.lit(n)).alias("b")).collect()
        assert [r.b for r in got] == list(range(n))

    for files_per_shard in (1, 3):
        ready = _ready_for_write(assigned, N_SHARDS, files_per_shard)
        per_part = (
            ready.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.countDistinct("shard_id").alias("n_shards_in_task"))
            .collect()
        )
        # every partition non-empty, and (for the single-file layout)
        # exactly one shard per task
        assert len(per_part) == N_SHARDS * files_per_shard
        if files_per_shard == 1:
            assert {r.n_shards_in_task for r in per_part} == {1}


def test_multi_file_shards_same_shards_bounded_tasks(
    spark, assigned, tmp_path_factory
):
    """files_per_shard>1 (the task-size bound for giant corpora) must
    not change shard membership, totals, or the merged epoch order —
    only the file layout."""
    import glob

    one = str(tmp_path_factory.mktemp("shards") / "single")
    many = str(tmp_path_factory.mktemp("shards") / "split")
    write_training_shards(assigned, one, N_SHARDS)
    write_training_shards(assigned, many, N_SHARDS, files_per_shard=3)

    # layout: each shard dir really is split into multiple files
    n_files = len(glob.glob(f"{many}/shard_id=0/*.parquet"))
    assert n_files == 3

    # manifests (written-file accounting) agree exactly
    m1 = {r.shard_id: (r.n_docs, r.n_tokens, r.min_key, r.max_key)
          for r in read_manifest(spark, one).collect()}
    m3 = {r.shard_id: (r.n_docs, r.n_tokens, r.min_key, r.max_key)
          for r in read_manifest(spark, many).collect()}
    assert m1 == m3

    # the multi-file reader contract: merge by order_key recovers the
    # same per-shard epoch order as the single-file layout
    for sid in (0, N_SHARDS - 1):
        a = [r.doc_id for r in spark.read.parquet(
            f"{one}/shard_id={sid}").orderBy("order_key", "doc_id")
            .select("doc_id").collect()]
        b = [r.doc_id for r in spark.read.parquet(
            f"{many}/shard_id={sid}").orderBy("order_key", "doc_id")
            .select("doc_id").collect()]
        assert a == b


def test_zero_shuffle_export_same_shards(spark, assigned, tmp_path_factory):
    """exchange='none' (the giant-corpus path: corpus never crosses an
    exchange) must produce identical membership, totals, and merged
    per-shard epoch order — only the file layout differs (up to one
    file per input partition per shard)."""
    import glob

    ex = str(tmp_path_factory.mktemp("shards") / "exchange")
    zs = str(tmp_path_factory.mktemp("shards") / "zeroshuffle")
    write_training_shards(assigned, ex, N_SHARDS)
    four = assigned.repartition(4)
    write_training_shards(four, zs, N_SHARDS, exchange="none")

    m_ex = {r.shard_id: (r.n_docs, r.n_tokens, r.min_key, r.max_key)
            for r in read_manifest(spark, ex).collect()}
    m_zs = {r.shard_id: (r.n_docs, r.n_tokens, r.min_key, r.max_key)
            for r in read_manifest(spark, zs).collect()}
    assert m_ex == m_zs

    # layout: at most one file per input partition per shard dir
    n_files = len(glob.glob(f"{zs}/shard_id=0/*.parquet"))
    assert 1 <= n_files <= 4

    # merged-by-order_key read recovers the exchange layout's order
    for sid in (0, N_SHARDS - 1):
        a = [r.doc_id for r in spark.read.parquet(
            f"{ex}/shard_id={sid}").orderBy("order_key", "doc_id")
            .select("doc_id").collect()]
        b = [r.doc_id for r in spark.read.parquet(
            f"{zs}/shard_id={sid}").orderBy("order_key", "doc_id")
            .select("doc_id").collect()]
        assert a == b


def test_stream_shard_sink_matches_batch_exactly_once(
    spark, tiny_sequences, tmp_path_factory
):
    """shard_assignments is stateless Column work, so the streaming
    sink must land exactly the batch membership — and a restart on the
    same checkpoint must add nothing (file-sink exactly-once)."""
    from bigdata_event_stream_detection_spark.streaming.shards import (
        start_shard_stream_sink,
    )

    base = tmp_path_factory.mktemp("stream_shards")
    src, out, ckpt = str(base / "src"), str(base / "out"), str(base / "ckpt")
    sample = tiny_sequences.limit(300).cache()
    sample.count()
    # two source files -> two micro-batches under maxFilesPerTrigger=1
    sample.repartition(2).write.parquet(src)

    stream = (
        spark.readStream.schema(sample.schema)
        .option("maxFilesPerTrigger", 1).parquet(src))
    q = start_shard_stream_sink(
        stream, out, ckpt, N_SHARDS, seed=7, epoch=1, available_now=True)
    q.awaitTermination(180)

    got = _membership(spark.read.parquet(out))
    want = _membership(shard_assignments(sample, N_SHARDS, seed=7, epoch=1))
    assert got == want

    # restart with no new input: exactly-once means zero new rows
    q2 = start_shard_stream_sink(
        stream, out, ckpt, N_SHARDS, seed=7, epoch=1, available_now=True)
    q2.awaitTermination(180)
    assert _membership(spark.read.parquet(out)) == want
