"""Jar-gated tests for the REAL Apache Iceberg adapter (sources/tables.py).

VERDICT r3 item 5: the ``fmt="iceberg"`` paths had never executed because
this sandbox ships no Iceberg runtime jars (verified: ``pyspark/jars``
contains no iceberg artifact, and there is no network to fetch one), so
these tests skip here by construction. On any machine with
``iceberg-spark-runtime`` on the session classpath they run the full
adapter surface — batch write/read, append-vs-create, streaming
incremental read, bucketed layout — against a local ``hadoop`` catalog
in ``tmp_path``, asserting byte-equal token arrays across the round
trip (the north rule's per-row invariant).

To run for real:
    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> ...
or add the jar to $SPARK_HOME/jars, then ``pytest tests/test_iceberg_adapter.py``.
"""

from __future__ import annotations

import time

import pytest

from bigdata_event_stream_detection_spark.sources import tables
from bigdata_event_stream_detection_spark.sources.synthetic import (
    generate_sequences,
)

pytestmark = pytest.mark.filterwarnings("ignore")

CATALOG = "besd_it"


@pytest.fixture(scope="module")
def iceberg_spark(spark, tmp_path_factory):
    """The shared session, with a hadoop catalog configured at runtime
    (Iceberg resolves ``spark.sql.catalog.*`` lazily at first catalog
    lookup, so conf.set after session start works). Skips when the
    runtime jars are absent."""
    if not tables.has_iceberg(spark):
        pytest.skip("Iceberg runtime jars not on the classpath "
                    "(none baked into this sandbox, no network to fetch)")
    wh = tmp_path_factory.mktemp("iceberg_wh")
    spark.conf.set(f"spark.sql.catalog.{CATALOG}",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set(f"spark.sql.catalog.{CATALOG}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{CATALOG}.warehouse", str(wh))
    return spark


def _tokens_by_doc(df):
    return {r["doc_id"]: list(r["tokens"]) for r in df.collect()}


def test_iceberg_batch_round_trip(iceberg_spark):
    spark = iceberg_spark
    seqs = generate_sequences(spark, 200, partitions=4)
    table = f"{CATALOG}.db.seq_batch"
    tables.write_events(seqs, table, fmt="iceberg",
                        partition_by=("source",), mode="overwrite")
    back = tables.read_sequences(spark, table, fmt="iceberg")
    assert _tokens_by_doc(back) == _tokens_by_doc(seqs)

    # append path on an existing table, and create-on-append on a new one
    tables.write_events(seqs.limit(10), table, fmt="iceberg",
                        partition_by=("source",), mode="append")
    assert back.count() == 210
    fresh = f"{CATALOG}.db.seq_fresh"
    tables.write_events(seqs.limit(5), fresh, fmt="iceberg",
                        partition_by=("source",), mode="append")
    assert tables.read_sequences(spark, fresh, fmt="iceberg").count() == 5


def test_iceberg_streaming_incremental(iceberg_spark, tmp_path):
    spark = iceberg_spark
    seqs = generate_sequences(spark, 120, partitions=4)
    table = f"{CATALOG}.db.seq_stream"
    tables.write_events(seqs, table, fmt="iceberg",
                        partition_by=("source",), mode="overwrite")
    stream = tables.read_sequences_stream(spark, table, fmt="iceberg")
    q = (stream.writeStream.format("memory").queryName("ice_mem")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert spark.table("ice_mem").count() == 120

    # a new snapshot appended after the first run is picked up on resume
    tables.write_events(seqs.limit(7), table, fmt="iceberg",
                        partition_by=("source",), mode="append")
    q2 = (stream.writeStream.format("memory").queryName("ice_mem2")
          .option("checkpointLocation", str(tmp_path / "ckpt"))
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)
    deadline = time.time() + 30
    while spark.table("ice_mem2").count() < 7 and time.time() < deadline:
        time.sleep(0.5)
    assert spark.table("ice_mem2").count() == 7


def test_iceberg_bucketed_layout(iceberg_spark):
    spark = iceberg_spark
    seqs = generate_sequences(spark, 100, partitions=4)
    table = f"{CATALOG}.db.seq_bucketed"
    tables.write_bucketed(seqs, table, buckets=4,
                          bucket_cols=("doc_id",), fmt="iceberg")
    back = tables.read_bucketed(spark, table, fmt="iceberg")
    assert back.count() == 100
    assert set(back.columns) == set(seqs.columns)
