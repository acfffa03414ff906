"""Continuous ``APPLY CHANGES`` — streaming CDC upsert into a keyed
bucket store.

The streaming twin of ``operators/cdc.py``: a changelog stream is
continuously merged into a latest-wins keyed store (the DLT
``APPLY CHANGES INTO`` / Iceberg ``MERGE INTO`` loop), here over a
bucket-partitioned parquet layout so the sandbox needs no table
format. The mechanics are the MERGE-on-read pattern at 100 TB scale:

* The store is hash-partitioned into ``n_buckets`` directories by key
  (``pmod(xxhash64(key), n_buckets)``). A micro-batch first collapses
  to its per-key latest change (one hash agg, map-side partials), then
  reads ONLY the store buckets its keys touch (partition pruning on
  the bucket column), merges latest-wins, and dynamic-partition-
  overwrites exactly those buckets. Work per trigger is proportional
  to touched data, never to store size.
* Tombstones are KEPT in the store: a delete must keep winning against
  late-arriving older updates to the same key, or a retracted document
  would silently resurrect. (Compaction may drop tombstones older than
  the source's lateness horizon; that policy hook is deliberately not
  hard-wired here.)
* Exactly-once under replay comes from the merge being idempotent —
  latest-wins ``max_by`` over the same rows is the same store — plus
  whole-bucket overwrite: replaying a half-written batch rewrites the
  touched buckets from scratch. The checkpoint guarantees each source
  offset range is applied by at most one successful batch commit.
* ``localCheckpoint`` materializes the merged buckets before the
  overwrite so the job never overwrites files it is still reading (a
  real deployment gets this from the table format's snapshot
  isolation instead).

The reference has no mutation story (static XML corpus, SURVEY.md
§2.1); this supplies the standard continuous-upsert surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import DELETE_OP


def _bucket_expr(key_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)) \
        .cast("int").alias("bucket")


def _batch_latest(
    batch: DataFrame,
    key_col: str,
    time_col: str,
    id_col: str,
    op_col: str,
    attrs: Sequence[str],
    n_buckets: int,
) -> DataFrame:
    """Collapse a changelog slice to one latest row per key, keeping
    tombstones, in the store's own schema."""
    order = F.struct(F.col(time_col), F.col(id_col))
    payload = F.struct(
        F.col(op_col).alias("op"),
        F.col(time_col).alias("last_ts"),
        F.col(id_col).alias("last_id"),
        *[F.col(c).alias(c) for c in attrs],
    )
    latest = (batch.groupBy(key_col)
              .agg(F.max_by(payload, order).alias("_l")))
    return latest.select(
        key_col,
        F.col("_l.op").alias("op"),
        *[F.col(f"_l.{c}").alias(c) for c in attrs],
        F.col("_l.last_ts").alias("last_ts"),
        F.col("_l.last_id").alias("last_id"),
        _bucket_expr(key_col, n_buckets),
    )


def start_apply_changes_sink(
    changelog: DataFrame,
    store_path: str,
    checkpoint_path: str,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    op_col: str = "op",
    attrs: Sequence[str] = ("event_type", "value"),
    n_buckets: int = 8,
    available_now: bool = False,
):
    """Run the continuous APPLY CHANGES loop: merge each micro-batch
    of changelog rows into the bucket store at ``store_path``.

    Returns the streaming query; read the materialized current state
    with :func:`read_snapshot`.
    """
    spark = changelog.sparkSession
    attrs = list(attrs)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        latest = _batch_latest(batch_df, key_col, time_col, id_col,
                               op_col, attrs, n_buckets)
        touched = [r["bucket"] for r in
                   latest.select("bucket").distinct().collect()]
        if not touched:
            return
        try:
            existing = (spark.read.parquet(store_path)
                        .filter(F.col("bucket").isin(touched)))
            merged_in = existing.unionByName(latest)
        except Exception:  # first batch: no store yet
            merged_in = latest
        order = F.struct(F.col("last_ts"), F.col("last_id"))
        payload = F.struct(
            F.col("op").alias("op"),
            F.col("last_ts").alias("last_ts"),
            F.col("last_id").alias("last_id"),
            *[F.col(c).alias(c) for c in attrs],
        )
        merged = (merged_in.groupBy(key_col, "bucket")
                  .agg(F.max_by(payload, order).alias("_l"))
                  .select(
                      key_col,
                      F.col("_l.op").alias("op"),
                      *[F.col(f"_l.{c}").alias(c) for c in attrs],
                      F.col("_l.last_ts").alias("last_ts"),
                      F.col("_l.last_id").alias("last_id"),
                      "bucket",
                  )
                  # cut the read->overwrite cycle on the store files
                  .localCheckpoint(eager=True))
        (merged.repartition(max(len(touched), 1), F.col("bucket"))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("bucket")
         .parquet(store_path))

    writer = (changelog.writeStream.foreachBatch(apply_batch)
              .option("checkpointLocation", checkpoint_path)
              .outputMode("update"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_snapshot(
    spark: SparkSession,
    store_path: str,
    delete_op: str = DELETE_OP,
) -> DataFrame:
    """Current-state view of the store: live keys only, tombstones and
    the physical bucket column dropped."""
    return (spark.read.parquet(store_path)
            .filter(F.col("op") != delete_op)
            .drop("bucket", "op"))
