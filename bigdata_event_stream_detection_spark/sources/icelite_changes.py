"""Changelog (change-data-feed) scans over icelite tables.

:func:`table_changes` reads the row-level changes committed between two
snapshots as a DataFrame of the table's rows plus three metadata
columns — Iceberg's changelog-scan surface (``SELECT * FROM
t.changes`` / the ``create_changelog_view`` procedure; behavior parity
with iceberg-core's BaseIncrementalChangelogScan, cited by behavior
only, no code consulted):

* ``_change_type``        — ``'insert'`` or ``'delete'`` (an update is
  a delete of the old row + an insert of the new one, exactly how
  Iceberg renders updates when pre/post-image pairing is off),
* ``_commit_snapshot_id`` — the snapshot that committed the change,
* ``_change_ordinal``     — 0-based index of that snapshot among the
  change-producing snapshots of the scanned range (range-relative).

How each snapshot type becomes change rows:

* ``append``       — the added files' rows are inserts. ONE parquet
  scan covers every appended file in the range; the per-file
  (snapshot, ordinal) metadata is attached by a broadcast join on the
  scan's ``_metadata.file_path`` — O(range) files, no per-snapshot
  jobs.
* ``merge-mor``    — the added data files' rows are inserts; the
  deletes are computed exactly: the PARENT snapshot's live rows whose
  key is in the commit's equality-delete file (a row updated by the
  merge therefore yields delete(old) + insert(new); a pure insert
  yields only insert; a ``delete_col`` row yields only delete).
* MOR ``delete``   — the parent's live rows at the commit's positional
  ``(file, pos)`` pairs. Rows already dead in the parent (an earlier
  overlapping delete) are NOT re-reported even though the positional
  file may name them — the live-view intersection makes the changelog
  idempotent where the read path's anti-join is.
* COW rewrites (``merge`` / ``overwrite`` / copy-on-write ``delete``)
  — governed by ``replace_mode``: ``"net"`` (default) computes the
  exact multiset difference restricted to the touched files
  (``before EXCEPT ALL after`` = deletes, ``after EXCEPT ALL before``
  = inserts — a compaction-shaped rewrite nets to zero rows);
  ``"raise"`` refuses; ``"skip"`` emits nothing for them.
* metadata-only snapshots (``create`` / ``compact`` /
  ``rewrite-deletes`` / ``rewrite-manifests`` / ``schema`` /
  ``properties``) — no logical change, never emitted. Compaction is in
  this set by definition even though it rewrites files: its net change
  is empty and the changelog must not re-feed it downstream.

All rows are rendered in the ``to``-snapshot's schema (files written
before an ``add_columns`` null-fill the new fields), so a range that
crosses schema evolution unions cleanly.

The streaming twin is ``.option("mode", "cdc")`` on the ``icelite``
data source (sources/icelite_source.py): the same per-snapshot
semantics, planned incrementally per trigger, with the MOR delete
computation pushed into per-parent-data-file worker tasks
(:func:`cdc_plan_snapshot` / :func:`cdc_read_partition` below).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import icelite
from .icelite import (
    _apply_deletes,
    _entry_seq,
    _field_ids,
    _load_manifest,
    _load_snapshot,
    _read_mapped,
    _snapshot_entries,
)

__all__ = ["table_changes", "CHANGE_META_FIELDS"]

#: metadata columns appended to the table schema, in output order
CHANGE_META_FIELDS = StructType([
    StructField("_change_type", StringType(), False),
    StructField("_commit_snapshot_id", LongType(), False),
    StructField("_change_ordinal", IntegerType(), False),
])

# snapshots that change no logical rows (compact/rewrites carry the
# same live rows in new files; create/schema/properties carry none)
_NOCHANGE_OPS = {"create", "compact", "rewrite-deletes",
                 "rewrite-manifests", "schema", "properties"}

def _added_entries(path: str, snap: dict) -> list[dict]:
    return [e for m in snap.get("added_manifests", [])
            for e in _load_manifest(path, m)]


def _new_delete_entries(path: str, snap: dict, parent: dict) -> list[dict]:
    """Delete-file entries first referenced by ``snap`` (its commit's
    own deletes — parent manifests are carried by reference)."""
    old = set(parent.get("delete_manifests") or [])
    return [e for m in (snap.get("delete_manifests") or []) if m not in old
            for e in _load_manifest(path, m)]


def _live(spark: SparkSession, path: str, snap: dict,
          entries: list[dict], schema: StructType,
          fids: dict) -> DataFrame | None:
    """The delete-applied (live) view of ``entries`` as of ``snap``.
    Rows carry ``_fname``/``_pos`` scan coordinates (from the mapped
    read — also what lets a changelog range cross column renames)."""
    df = _read_mapped(spark, path, schema, fids, entries)
    if df is None:
        return None
    return _apply_deletes(spark, path, snap, entries, df)


def _with_meta(df: DataFrame, data_cols: list[str], ctype: str,
               sid: int, ordinal: int) -> DataFrame:
    return df.select(
        *data_cols,
        F.lit(ctype).alias("_change_type"),
        F.lit(sid).cast("long").alias("_commit_snapshot_id"),
        F.lit(ordinal).cast("int").alias("_change_ordinal"))


def table_changes(spark: SparkSession, path: str,
                  from_version: int | None = None,
                  to_version: int | None = None, *,
                  replace_mode: str = "net") -> DataFrame:
    """Row-level changes committed in ``(from_version, to_version]``.

    ``from_version`` is EXCLUSIVE (changes after that snapshot) and
    defaults to the earliest retained snapshot — i.e. the whole
    representable history; expired history cannot be replayed, same
    contract as the incremental stream. ``to_version`` is inclusive
    and defaults to the current snapshot. ``replace_mode`` governs
    copy-on-write rewrites (see module docstring).
    """
    if replace_mode not in ("net", "raise", "skip"):
        raise ValueError(f"unknown replace_mode {replace_mode!r}")
    ids = icelite._list_snapshot_ids(path)
    if not ids:
        raise FileNotFoundError(f"icelite table has no snapshots: {path!r}")
    frm = min(ids) if from_version is None else from_version
    to = ids[-1] if to_version is None else to_version
    if to < frm:
        raise ValueError(f"to_version {to} < from_version {frm}")
    if frm < min(ids) - 1:
        raise ValueError(
            f"from_version {frm}: snapshots before {min(ids)} are "
            "expired; their changes cannot be replayed")

    to_snap = _load_snapshot(path, to)
    to_schema = StructType.fromJson(to_snap["schema"])
    fids = _field_ids(to_snap)
    data_cols = [f.name for f in to_schema.fields]
    out_schema = StructType(to_schema.fields + CHANGE_META_FIELDS.fields)
    frames: list[DataFrame] = []
    # (file basename, sid, ordinal) for the consolidated insert scan
    ins_entries: list[dict] = []
    ins_map: list[tuple[str, int, int]] = []
    ordinal = -1

    def _parent(sid: int) -> dict:
        try:
            return _load_snapshot(path, sid - 1)
        except FileNotFoundError:
            raise ValueError(
                f"snapshot {sid}'s changes need its parent {sid - 1}, "
                "which is expired — start the scan at a later "
                "from_version") from None

    for sid in range(frm + 1, to + 1):
        snap = _load_snapshot(path, sid)
        op = snap["operation"]
        summary = snap.get("summary") or {}
        if op in _NOCHANGE_OPS:
            continue
        ordinal += 1

        if op in ("append", "merge-mor"):
            for e in _added_entries(path, snap):
                ins_entries.append(e)
                ins_map.append((os.path.basename(e["path"]), sid, ordinal))
            if op == "append":
                continue
            # merge-mor deletes: parent live rows whose key is in the
            # commit's equality-delete file (seq semantics hold by
            # construction: every parent file's seq < this commit's)
            parent = _parent(sid)
            eq = [e for e in _new_delete_entries(path, snap, parent)
                  if e["type"] == "eq"]
            parent_entries = _snapshot_entries(path, parent)
            live = _live(spark, path, parent, parent_entries, to_schema,
                         fids)
            if eq and live is not None:
                # the delete file's key column carries its COMMIT-TIME
                # name; the key may have been renamed since (allowed
                # as of r5 — entries resolve by field id), and the
                # live view is in the to-schema: translate by field id
                key_w = eq[0]["key"]
                kid = eq[0].get("kid")
                if kid is None:
                    kid = _field_ids(parent).get(key_w)
                key = next((n for n, i in fids.items() if i == kid),
                           key_w)
                keys = (spark.read.parquet(
                    *[os.path.join(path, e["path"]) for e in eq])
                    .select(F.col(key_w).alias(key)).distinct())
                dead = live.join(F.broadcast(keys), key, "leftsemi")
                frames.append(
                    _with_meta(dead, data_cols, "delete", sid, ordinal))
            continue

        if op == "delete" and summary.get("added_delete_files"):
            # MOR positional delete: parent live rows at the commit's
            # (file, pos) pairs — the live intersection keeps an
            # overlapping re-delete from double-reporting
            parent = _parent(sid)
            pos = [e for e in _new_delete_entries(path, snap, parent)
                   if e["type"] == "pos"]
            refs = {r for e in pos for r in e.get("refs", [])}
            ref_entries = [e for e in _snapshot_entries(path, parent)
                           if os.path.basename(e["path"]) in refs]
            live = _live(spark, path, parent, ref_entries, to_schema,
                         fids)
            if pos and live is not None:
                pairs = spark.read.parquet(
                    *[os.path.join(path, e["path"]) for e in pos]).select(
                    F.col("file").alias("_fname"),
                    F.col("pos").alias("_pos"))
                dead = live.join(F.broadcast(pairs),
                                 ["_fname", "_pos"], "inner")
                frames.append(
                    _with_meta(dead, data_cols, "delete", sid, ordinal))
            continue

        # copy-on-write rewrite (merge / overwrite / COW delete)
        if replace_mode == "skip":
            ordinal -= 1
            continue
        if replace_mode == "raise":
            raise ValueError(
                f"snapshot {sid} is a {op!r} rewrite; pass "
                "replace_mode='net' to compute its row changes or "
                "'skip' to ignore it")
        parent = _parent(sid)
        snap_entries = _snapshot_entries(path, snap)
        parent_entries = _snapshot_entries(path, parent)
        snap_paths = {e["path"] for e in snap_entries}
        parent_paths = {e["path"] for e in parent_entries}
        if ((snap.get("delete_manifests") or [])
                != (parent.get("delete_manifests") or [])):
            # the applicable MOR delete set changed (e.g. a rollback
            # past a row-level delete): shared files can differ in
            # LIVE rows, so diff the full live views — exceptAll
            # cancels the identical rows
            removed, added = parent_entries, snap_entries
        else:
            # symmetric difference by path, NOT added_manifests: a
            # rollback restores files by reference without "adding"
            removed = [e for e in parent_entries
                       if e["path"] not in snap_paths]
            added = [e for e in snap_entries
                     if e["path"] not in parent_paths]
        before = _live(spark, path, parent, removed, to_schema, fids)
        after = _live(spark, path, snap, added, to_schema, fids)
        empty = spark.createDataFrame([], to_schema)
        before = empty if before is None else before.select(*data_cols)
        after = empty if after is None else after.select(*data_cols)
        frames.append(_with_meta(
            before.exceptAll(after), data_cols, "delete", sid, ordinal))
        frames.append(_with_meta(
            after.exceptAll(before), data_cols, "insert", sid, ordinal))

    if ins_entries:
        scan = _read_mapped(spark, path, to_schema, fids, ins_entries)
        meta = spark.createDataFrame(
            ins_map, ["_fname", "_commit_snapshot_id", "_change_ordinal"])
        frames.append(
            scan.join(F.broadcast(meta), "_fname")
            .select(*data_cols,
                    F.lit("insert").alias("_change_type"),
                    F.col("_commit_snapshot_id").cast("long"),
                    F.col("_change_ordinal").cast("int")))

    if not frames:
        return spark.createDataFrame([], out_schema)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# ---------------------------------------------------------------------------
# streaming CDC planning + worker compute (used by icelite_source's
# ``.option("mode", "cdc")``; no SparkSession on either side)


def cdc_plan_snapshot(table_path: str, snap: dict, parent: dict,
                      skip_replace: bool,
                      fids: dict | None = None) -> list[dict]:
    """Driver-side plan for ONE snapshot's change rows: a list of task
    dicts the stream reader turns into InputPartitions.

    * ``{"kind": "insert", "path", "rg", "sid"}`` — one per added
      data file (or row group).
    * ``{"kind": "mor-delete", "path", "file_seq", "parent_pos",
      "parent_eq", "new_pos", "new_eq", "key", "sid"}`` — one per
      PARENT data file that the commit's new delete files could
      touch; the worker reads that one file, reconstructs its parent
      live view, and emits the rows the new deletes kill. O(parent
      files) tasks, each O(one file + the tiny delete files).

    Raises on COW rewrites unless ``skip_replace`` (their changes are
    not incrementally representable without a full diff; batch
    :func:`table_changes` with ``replace_mode='net'`` covers them).
    """
    op = snap["operation"]
    summary = snap.get("summary") or {}
    sid = snap["snapshot_id"]
    if op in _NOCHANGE_OPS:
        return []
    tasks: list[dict] = []

    from .icelite import _entry_names

    if op in ("append", "merge-mor"):
        for e in _added_entries(table_path, snap):
            n_rg = e.get("row_groups", 1) or 1
            names = _entry_names(e, fids)
            for rg in (range(n_rg) if n_rg > 1 else (None,)):
                tasks.append({"kind": "insert", "path": e["path"],
                              "rg": rg, "sid": sid, "names": names})
        if op == "append":
            return tasks
    new_dels = _new_delete_entries(table_path, snap, parent)
    new_eq = [e for e in new_dels if e["type"] == "eq"]
    new_pos = [e for e in new_dels if e["type"] == "pos"]
    if op == "merge-mor" or (op == "delete"
                             and summary.get("added_delete_files")):
        parent_entries = _snapshot_entries(table_path, parent)
        parent_dels = [e for m in (parent.get("delete_manifests") or [])
                       for e in _load_manifest(table_path, m)]
        pos_refs = {r for e in new_pos for r in e.get("refs", [])}
        pfids = _field_ids(parent) if parent.get("schema") else {}

        def _declared_key(d: dict) -> str:
            # commit-time key name -> declared-schema name by field
            # id: prefer the entry's stamped kid (survives renames
            # older than this commit's parent), fall back to the
            # parent-schema lookup for legacy kid-less entries
            if not fids:
                return d["key"]
            kid = d.get("kid")
            if kid is None:
                kid = pfids.get(d["key"])
            return next((n for n, i in fids.items() if i == kid),
                        d["key"])

        for e in parent_entries:
            fname = os.path.basename(e["path"])
            fseq = _entry_seq(e)
            eq_hits = [d for d in new_eq if d["seq"] > fseq]
            pos_hits = [d for d in new_pos if fname in pos_refs]
            if not eq_hits and not pos_hits:
                continue
            tasks.append({
                "kind": "mor-delete", "path": e["path"], "sid": sid,
                "names": _entry_names(e, fids),
                "file_seq": fseq,
                "key": (_declared_key(eq_hits[0])
                        if eq_hits else None),
                "key_file": eq_hits[0]["key"] if eq_hits else None,
                "new_eq": [(d["path"], d["seq"]) for d in eq_hits],
                "new_pos": [d["path"] for d in pos_hits],
                "parent_eq": [(_declared_key(d), d["key"],
                               d["path"], d["seq"])
                              for d in parent_dels
                              if d["type"] == "eq" and d["seq"] > fseq],
                "parent_pos": [d["path"] for d in parent_dels
                               if d["type"] == "pos"
                               and fname in d.get("refs", [fname])],
            })
        return tasks

    if skip_replace:
        return tasks
    raise ValueError(
        f"snapshot {sid} is a {op!r} rewrite — the CDC stream is "
        "MOR-incremental; set .option('skip-replace-snapshots', 'true') "
        "to skip rewrites, or diff them in batch via table_changes("
        "replace_mode='net')")


def cdc_read_partition(table_path: str, task: dict, schema_json: str,
                       ordinal: int):
    """Worker-side change-row compute for one :func:`cdc_plan_snapshot`
    task. Yields Arrow record batches in the CDC schema (table columns
    + the three metadata columns). Pure pyarrow — no per-row Python."""
    import pyarrow as pa

    from .icelite_source import _arrow_batches

    def metad(n: int, ctype: str):
        return [pa.array([ctype] * n, pa.string()),
                pa.array([task["sid"]] * n, pa.int64()),
                pa.array([ordinal] * n, pa.int32())]

    meta_names = [f.name for f in CHANGE_META_FIELDS.fields]
    if task["kind"] == "insert":
        for batch in _arrow_batches(
                os.path.join(table_path, task["path"]), schema_json,
                task.get("rg"), task.get("names")):
            yield pa.RecordBatch.from_arrays(
                list(batch.columns) + metad(batch.num_rows, "insert"),
                names=batch.schema.names + meta_names)
        return

    # mor-delete: one parent data file -> its killed live rows
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    fname = os.path.basename(task["path"])
    tbl = pa.Table.from_batches(list(_arrow_batches(
        os.path.join(table_path, task["path"]), schema_json,
        names=task.get("names"))))
    n = tbl.num_rows

    def positions(paths: list[str]) -> np.ndarray:
        out = [np.empty(0, dtype=np.int64)]
        for p in paths:
            t = pq.read_table(os.path.join(table_path, p))
            mask = pc.equal(t.column("file"), fname)
            out.append(t.column("pos").filter(mask).combine_chunks()
                       .to_numpy(zero_copy_only=False).astype(np.int64))
        return np.concatenate(out)

    def eq_mask(col: str, files: list[str],
                file_col: str | None = None) -> np.ndarray:
        fc = file_col or col
        keys = pa.concat_tables(
            [pq.read_table(os.path.join(table_path, p), columns=[fc])
             for p in files])
        hit = pc.is_in(tbl.column(col),
                       value_set=keys.column(fc).combine_chunks())
        return (pc.fill_null(hit, False).combine_chunks()
                .to_numpy(zero_copy_only=False).astype(bool))

    alive = np.ones(n, dtype=bool)
    ppos = positions(task["parent_pos"])
    if ppos.size:
        alive[ppos] = False
    for key, key_file, p, _seq in task["parent_eq"]:
        alive &= ~eq_mask(key, [p], key_file)

    dead = np.zeros(n, dtype=bool)
    npos = positions(task["new_pos"])
    if npos.size:
        dead[npos] = True
    if task["new_eq"]:
        dead |= eq_mask(task["key"], [p for p, _ in task["new_eq"]],
                        task.get("key_file"))

    out = tbl.filter(pa.array(alive & dead))
    if out.num_rows:
        yield pa.RecordBatch.from_arrays(
            [c.combine_chunks() for c in out.columns]
            + metad(out.num_rows, "delete"),
            names=out.schema.names + meta_names)
