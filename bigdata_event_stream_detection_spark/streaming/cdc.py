"""Continuous ``APPLY CHANGES`` — streaming CDC upsert into a keyed
bucket store.

The streaming twin of ``operators/cdc.py``: a changelog stream is
continuously merged into a latest-wins keyed store (the DLT
``APPLY CHANGES INTO`` / Iceberg ``MERGE INTO`` loop), here over a
bucket-partitioned parquet layout so the sandbox needs no table
format. Two write modes cover the two MERGE strategies real table
formats offer:

* ``mode="merge"`` (copy-on-write): a micro-batch collapses to its
  per-key latest change (one hash agg, map-side partials), reads ONLY
  the store buckets its keys touch (partition pruning on the bucket
  column), merges latest-wins, and dynamic-partition-overwrites
  exactly those buckets. Work per trigger is proportional to touched
  data — ideal when triggers are key-local. Worst case (uniform keys)
  rewrites the whole store per trigger.
* ``mode="delta"`` (merge-on-read): the per-key latest rows are
  written as an immutable bucket-partitioned delta under
  ``delta/batch=<id>/`` — a trigger writes O(changed rows), never
  O(store). Every ``compact_every`` triggers the base and outstanding
  deltas fold into a fresh ``base/`` (reusing one latest-wins agg) and
  the folded deltas are dropped. ``read_snapshot`` merges base ∪
  deltas latest-wins, so the view is correct at any instant, including
  across compaction crashes (duplicate rows between base and an
  undeleted delta merge to the same row). This is the uniform-key
  lever: per-trigger write volume follows batch size, and the
  full-store rewrite is amortized 1/compact_every.

Shared semantics:

* Tombstones are KEPT in the store: a delete must keep winning against
  late-arriving older updates to the same key, or a retracted document
  would silently resurrect. (Compaction may drop tombstones older than
  the source's lateness horizon; that policy hook is deliberately not
  hard-wired here.)
* Exactly-once under replay comes from idempotent writes — latest-wins
  ``max_by`` over the same rows is the same store, a replayed delta
  batch overwrites its own ``batch=<id>`` directory — plus the
  checkpoint guaranteeing each source offset range is applied by at
  most one successful batch commit.
* ``n_buckets`` is persisted in a ``_meta.json`` next to the store and
  validated on every (re)start: resuming with a different bucket count
  would hash keys into new buckets while old rows sit in old ones,
  silently duplicating keys. (A real table format records this in
  table properties; the underscore prefix keeps Spark's file-source
  from reading it as data.)
* Store reads treat ONLY a missing store as "first batch". Any other
  read failure (FS hiccup, corrupt footer, permissions) fails the
  batch so the checkpoint retries it — a transient error must never
  be mistaken for an empty store and overwrite live buckets.

The reference has no mutation story (static XML corpus, SURVEY.md
§2.1); this supplies the standard continuous-upsert surface.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import DELETE_OP

_META_FILE = "_meta.json"


def _local(path: str) -> str:
    """Strip a file: scheme for driver-side os.* operations. The meta /
    delta-listing bookkeeping is driver-local by design in this
    sandbox; on object stores a table format's snapshot metadata plays
    this role."""
    return path[7:] if path.startswith("file://") else (
        path[5:] if path.startswith("file:") else path)


def _check_meta(store_path: str, n_buckets: int, mode: str) -> None:
    """Persist (n_buckets, mode) on first start; refuse to resume with
    different values."""
    root = _local(store_path)
    meta_path = os.path.join(root, _META_FILE)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("n_buckets") != n_buckets or meta.get("mode") != mode:
            raise ValueError(
                f"store at {store_path} was created with "
                f"n_buckets={meta.get('n_buckets')} mode={meta.get('mode')!r};"
                f" got n_buckets={n_buckets} mode={mode!r} — changing either"
                " on an existing store would strand rows in stale buckets")
        return
    os.makedirs(root, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=root, prefix="._meta")
    with os.fdopen(fd, "w") as f:
        json.dump({"n_buckets": n_buckets, "mode": mode}, f)
    os.replace(tmp, meta_path)


def _bucket_expr(key_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)) \
        .cast("int").alias("bucket")


def _store_payload_cols(key_col: str, attrs: Sequence[str]):
    order = F.struct(F.col("last_ts"), F.col("last_id"))
    payload = F.struct(
        F.col("op").alias("op"),
        F.col("last_ts").alias("last_ts"),
        F.col("last_id").alias("last_id"),
        *[F.col(c).alias(c) for c in attrs],
    )
    return order, payload


def _merge_latest(df: DataFrame, key_col: str, attrs: Sequence[str]) -> DataFrame:
    """Latest-wins collapse of store-schema rows to one row per key."""
    order, payload = _store_payload_cols(key_col, attrs)
    return (df.groupBy(key_col, "bucket")
            .agg(F.max_by(payload, order).alias("_l"))
            .select(
                key_col,
                F.col("_l.op").alias("op"),
                *[F.col(f"_l.{c}").alias(c) for c in attrs],
                F.col("_l.last_ts").alias("last_ts"),
                F.col("_l.last_id").alias("last_id"),
                "bucket",
            ))


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


def _merge_store_exists(store_path: str) -> bool:
    root = _local(store_path)
    if not os.path.isdir(root):
        return False
    return any(e.startswith("bucket=") for e in os.listdir(root))


def _delta_batch_dirs(store_path: str) -> list[str]:
    droot = os.path.join(_local(store_path), "delta")
    if not os.path.isdir(droot):
        return []
    return sorted(
        os.path.join(droot, e) for e in os.listdir(droot)
        if e.startswith("batch="))


def _read_delta_union(spark: SparkSession, store_path: str) -> DataFrame | None:
    """base ∪ outstanding deltas in the store schema (or None if the
    store holds nothing yet)."""
    root = _local(store_path)
    base = os.path.join(root, "base")
    parts = []
    if os.path.isdir(base) and any(
            e.startswith("bucket=") for e in os.listdir(base)):
        parts.append(spark.read.parquet(base))
    if _delta_batch_dirs(store_path):
        # one scan over delta/: batch= and bucket= are partition cols
        parts.append(spark.read.parquet(os.path.join(root, "delta"))
                     .drop("batch"))
    if not parts:
        return None
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


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
    mode: str = "merge",
    compact_every: int = 16,
):
    """Run the continuous APPLY CHANGES loop: merge each micro-batch
    of changelog rows into the store at ``store_path``.

    ``mode="merge"`` rewrites touched buckets per trigger (copy-on-
    write); ``mode="delta"`` appends an immutable per-trigger delta and
    compacts every ``compact_every`` triggers (merge-on-read). Returns
    the streaming query; read the materialized current state with
    :func:`read_snapshot`.
    """
    if mode not in ("merge", "delta"):
        raise ValueError(f"unknown mode {mode!r} (want 'merge' or 'delta')")
    spark = changelog.sparkSession
    attrs = list(attrs)
    _check_meta(store_path, n_buckets, mode)

    def apply_merge(latest: DataFrame, batch_id: int) -> None:
        touched = [r["bucket"] for r in
                   latest.select("bucket").distinct().collect()]
        if not touched:
            return
        if _merge_store_exists(store_path):
            # NOT try/except: a transient read failure must fail the
            # batch (checkpoint retries), never masquerade as an empty
            # store and clobber the touched buckets.
            existing = (spark.read.parquet(store_path)
                        .filter(F.col("bucket").isin(touched)))
            merged_in = existing.unionByName(latest)
        else:
            merged_in = latest
        merged = (_merge_latest(merged_in, key_col, attrs)
                  # cut the read->overwrite cycle on the store files
                  .localCheckpoint(eager=True))
        (merged.repartition(max(len(touched), 1), F.col("bucket"))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("bucket")
         .parquet(store_path))

    def apply_delta(latest: DataFrame, batch_id: int) -> None:
        root = _local(store_path)
        delta_dir = os.path.join(root, "delta", f"batch={batch_id}")
        out = (latest.repartition(n_buckets, F.col("bucket"))
               .write.mode("overwrite").partitionBy("bucket"))
        out.parquet(delta_dir)
        if not os.path.isdir(delta_dir):
            return  # empty batch wrote nothing
        deltas = _delta_batch_dirs(store_path)
        if len(deltas) < compact_every:
            return
        # lazy compaction: fold base + deltas into a fresh base. Crash
        # anywhere here is safe: replay rewrites this batch's delta
        # idempotently, re-reading duplicated rows merges to the same
        # row, and leftover folded deltas just fold again.
        everything = _read_delta_union(spark, store_path)
        merged = (_merge_latest(everything, key_col, attrs)
                  .localCheckpoint(eager=True))
        (merged.repartition(n_buckets, F.col("bucket"))
         .write.mode("overwrite")
         .partitionBy("bucket")
         .parquet(os.path.join(root, "base")))
        for d in deltas:
            shutil.rmtree(d, ignore_errors=True)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        latest = _batch_latest(batch_df, key_col, time_col, id_col,
                               op_col, attrs, n_buckets)
        if mode == "delta":
            apply_delta(latest, batch_id)
        else:
            apply_merge(latest, batch_id)

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
    key_col: str = "user_id",
) -> DataFrame:
    """Current-state view of the store: live keys only, tombstones and
    the physical bucket column dropped.

    Handles both layouts: a merge-mode store is already one row per
    key; a delta-mode store merges base ∪ outstanding deltas
    latest-wins first (``key_col`` must match the sink's)."""
    root = _local(store_path)
    if (os.path.isdir(os.path.join(root, "base"))
            or os.path.isdir(os.path.join(root, "delta"))):
        df = _read_delta_union(spark, store_path)
        if df is None:
            raise FileNotFoundError(f"empty delta store at {store_path}")
        attrs = [c for c in df.columns
                 if c not in (key_col, "op", "last_ts", "last_id", "bucket")]
        df = _merge_latest(df, key_col, attrs)
    else:
        df = spark.read.parquet(store_path)
    return (df.filter(F.col("op") != delete_op)
            .drop("bucket", "op"))
