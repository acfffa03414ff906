"""PySpark Python Data Source for icelite tables.

Registers the ``icelite`` format so the snapshot log becomes a real
Structured Streaming source with Iceberg's incremental-scan semantics:

    spark.dataSource.register(IceliteDataSource)
    stream = (spark.readStream.format("icelite")
              .load("/path/to/table"))         # or .option("path", ...)

* **Offsets are snapshot ids.** ``latestOffset`` is the table's current
  snapshot; a micro-batch reads exactly the data files ADDED by the
  snapshots in ``(start, end]``. Offsets live in the checkpoint's
  offset/commit logs, so kill/resume replays a batch against the same
  immutable files — the exactly-once contract the engine's sinks
  assume (same as the parquet file source, but commit-granular:
  a half-written directory can never be observed because files only
  become visible via an atomic snapshot commit).
* **Append-only incremental scan** (Iceberg's default): replace-type
  snapshots (merge/overwrite/compact) raise by default since their row
  changes cannot be represented as appends; ``.option
  ("skip-replace-snapshots", "true")`` skips them instead (their
  file rewrites are NOT re-emitted — compaction must not re-feed the
  pipeline).
* Workers read each data file with pyarrow and hand Spark **Arrow
  record batches** (zero per-row Python, the token arrays move as
  Arrow lists), cast to the table schema's Arrow form.
* **CDC mode** (``.option("mode", "cdc")``): emits row-level CHANGES
  instead of raw appended rows — the table columns plus
  ``_change_type`` / ``_commit_snapshot_id`` / ``_change_ordinal``.
  Appends stream as inserts; merge-on-read merges as inserts + exact
  deletes; MOR row-level deletes as deletes of the parent's live rows
  (per-parent-data-file worker tasks; see
  icelite_changes.cdc_plan_snapshot). COW rewrites raise (or skip
  with ``skip-replace-snapshots``); batch
  :func:`icelite_changes.table_changes` diffs those exactly.
* ``Trigger.AvailableNow`` caveat: Python data sources do not expose
  ``SupportsTriggerAvailableNow``, so Spark falls back to ONE batch
  per availableNow run — and the run terminates before its watermark
  advance can evict stateful-operator state (that happens in the NEXT
  batch). Use :func:`available_now_drain` instead: it runs a normal
  processing-time-trigger query to quiescence (snapshot caught up, the
  no-data micro-batch has fired the final timeout sweep) and stops it
  — the drain-to-empty semantics availableNow cannot deliver here.

The batch side (``spark.read.format("icelite")``) supports time travel
via ``.option("version", N)`` / ``.option("as-of-ms", T)``; the richer
batch API (file-level predicate pruning) is ``icelite.read_table``.
"""

from __future__ import annotations

import functools as _functools
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from . import icelite
from .icelite import _entry_names

# snapshots whose change is not representable as an append: rewrites
# (merge/overwrite/compact/COW delete) and merge-on-read commits
# (merge-mor adds rows AND an equality delete; "delete" may be a
# positional-delete-only commit). Iceberg's streaming read has the
# same contract: fail by default, skip when told to.
_REPLACE_OPS = {"merge", "overwrite", "compact", "merge-mor", "delete",
                "rollback"}


class _FilePartition(InputPartition):
    """One read task: a whole data file, or one of its row groups
    (``rg`` set) when the manifest recorded several — a 1 GB file must
    not become one Python task. The split plan costs NO footer reads:
    ``row_groups`` travels in the manifest entry (Iceberg's
    split-offsets idea). ``names`` maps declared column name ->
    the file's write-time name (field-id schema evolution; None value
    = column postdates the file, null-fill)."""

    def __init__(self, path: str, rg: int | None = None,
                 names: dict | None = None):
        self.path = path
        self.rg = rg
        self.names = names


def _entry_partitions(table_path: str, entry: dict,
                      fids: dict | None = None) -> list:
    path = os.path.join(table_path, entry["path"])
    names = _entry_names(entry, fids)
    n_rg = entry.get("row_groups", 1) or 1
    if n_rg <= 1:
        return [_FilePartition(path, names=names)]
    return [_FilePartition(path, rg, names=names) for rg in range(n_rg)]


def _arrow_batches(file_path: str, schema_json: str,
                   rg: int | None = None,
                   names: dict | None = None):
    """Yield the file's (or one row group's) rows as Arrow record
    batches cast to the table schema (runs in the Python worker;
    pyarrow is daemon-preloaded). ``names`` maps declared -> write-time
    column names (field-id evolution: renamed columns read under their
    old name; a None value null-fills — the column postdates the file
    or was dropped and re-added)."""
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    spark_schema = StructType.fromJson(json.loads(schema_json))
    arrow_schema = to_arrow_schema(spark_schema)
    # column-pruned read: only the fields that exist in the file
    # (missing ones are null-filled below for add-column evolution);
    # pyarrow skips the other column chunks entirely
    pf = pq.ParquetFile(file_path)
    file_cols = set(pf.schema_arrow.names)

    def local(n: str) -> str | None:
        return names.get(n, None) if names is not None else n

    want = [w for w in (local(f.name) for f in arrow_schema)
            if w is not None and w in file_cols]
    if rg is None:
        table = pf.read(columns=want)
    else:
        table = pf.read_row_group(rg, columns=want)
    if names is None and table.schema == arrow_schema:
        # fast path: file already in table-schema form (the common
        # case — icelite data files are written from the table schema)
        yield from table.to_batches()
        return
    # id-mapped / name-based resolution + null-fill
    import pyarrow as pa

    cols = []
    for field in arrow_schema:
        w = local(field.name)
        if w is not None and w in table.column_names:
            cols.append(table.column(w).cast(field.type))
        else:
            cols.append(pa.nulls(table.num_rows, field.type))
    yield from pa.Table.from_arrays(cols, schema=arrow_schema).to_batches()


@_functools.lru_cache(maxsize=4096)
def _cached_snapshot(table_path: str, sid: int) -> dict:
    """Snapshot JSONs are immutable once committed (os.link claim), so
    the long-lived source-runner process caches them: a trigger that
    replans (restart, retry) or the drain poller never re-reads."""
    return icelite._load_snapshot(table_path, sid)


@_functools.lru_cache(maxsize=512)
def _cached_manifest(table_path: str, name: str) -> list:
    """Manifests are immutable and content-addressed (uuid names); do
    not mutate the returned entries."""
    return icelite._load_manifest(table_path, name)


def _added_partitions(table_path: str, start_id: int, end_id: int,
                      skip_replace: bool,
                      fids: dict | None = None) -> list[_FilePartition]:
    out: list[_FilePartition] = []
    for sid in range(start_id + 1, end_id + 1):
        snap = _cached_snapshot(table_path, sid)
        op = snap["operation"]
        if op in _REPLACE_OPS:
            if skip_replace:
                continue
            raise ValueError(
                f"snapshot {sid} is a {op!r} — the incremental scan is "
                "append-only; set .option('skip-replace-snapshots', "
                "'true') to skip replace snapshots (their rewrites are "
                "not re-emitted)")
        for m in snap.get("added_manifests", []):
            for e in _cached_manifest(table_path, m):
                out.extend(_entry_partitions(table_path, e, fids))
    return out


def _progress_end_snapshot(lp) -> int | None:
    """Snapshot id in a progress dict's first source endOffset.
    PySpark renders a Python source's offset dict as its *repr*
    (single quotes — not JSON) inside the progress JSON; accept JSON,
    repr, and an already-parsed dict."""
    if not lp or not lp.get("sources"):
        return None
    eo = lp["sources"][0].get("endOffset")
    if isinstance(eo, str):
        try:
            eo = json.loads(eo)
        except ValueError:
            import ast
            try:
                eo = ast.literal_eval(eo)
            except (ValueError, SyntaxError):
                return None
    if isinstance(eo, dict):
        sid = eo.get("snapshot_id")
        return int(sid) if sid is not None else None
    return None


def available_now_drain(start_query, table_path: str, *,
                        quiet_polls: int = 10, poll_s: float = 0.2,
                        timeout_s: float = 600.0) -> dict | None:
    """Run a streaming query over the icelite table at ``table_path``
    to quiescence, then stop it — the ``Trigger.AvailableNow`` analog
    Python data sources cannot express natively. Returns the query's
    last progress dict (None if the query never progressed).

    ``start_query`` is a zero-arg callable returning a started
    :class:`~pyspark.sql.streaming.StreamingQuery` with a
    processing-time trigger (i.e. do NOT pass ``availableNow``).

    Why not loop availableNow runs: Python data sources lack
    ``SupportsTriggerAvailableNow``, so each availableNow run is ONE
    micro-batch — and the event-time stats that would advance the
    watermark die with the run, so the timeout sweep that evicts the
    final stateful windows never fires across runs (the old workaround
    was committing a SECOND far-future sentinel per drain). Inside one
    continuously-triggered run, Spark's no-data micro-batch fires that
    sweep as soon as the watermark advances, so run-to-quiescence is
    the correct drain.

    Quiescence = the stream has consumed through the table's current
    snapshot AND the query reported no available data / active trigger
    for ``quiet_polls`` consecutive polls (the watermark sweep batch,
    if any, has committed by then — Spark runs it immediately after
    the data batch that moved the watermark).
    """
    import time as _time

    q = start_query()
    deadline = _time.monotonic() + timeout_s
    quiet = 0
    try:
        while _time.monotonic() < deadline:
            if q.exception() is not None:
                raise q.exception()
            st = q.status
            active = st["isDataAvailable"] or st["isTriggerActive"]
            lp = q.lastProgress
            end = _progress_end_snapshot(lp)
            caught_up = (end is not None
                         and end >= icelite.current_snapshot_id(table_path))
            if caught_up and not active:
                quiet += 1
                if quiet >= quiet_polls:
                    return lp
            else:
                quiet = 0
            _time.sleep(poll_s)
        raise TimeoutError(
            f"available_now_drain: query did not reach quiescence over "
            f"{table_path!r} within {timeout_s}s")
    finally:
        q.stop()
        q.awaitTermination(60)


class _CdcPartition(InputPartition):
    """One CDC change-compute task (see icelite_changes.cdc_plan_snapshot)."""

    def __init__(self, task: dict, ordinal: int):
        self.task = task
        self.ordinal = ordinal


class IceliteStreamReader(DataSourceStreamReader):
    def __init__(self, table_path: str, schema_json: str,
                 skip_replace: bool, cdc: bool = False):
        self._path = table_path
        self._schema_json = schema_json
        self._skip_replace = skip_replace
        self._cdc = cdc
        self._last_seen: int | None = None
        # field ids of the DECLARED schema (fixed at query start) —
        # files committed under since-renamed columns resolve by id
        try:
            self._fids = icelite._field_ids(icelite._load_snapshot(
                table_path, icelite.current_snapshot_id(table_path)))
        except FileNotFoundError:
            self._fids = None

    def initialOffset(self) -> dict:
        # start before the EARLIEST snapshot still on disk, so the
        # first batch covers the whole *retained* history. After
        # expire_snapshots, rows whose adding snapshots were expired
        # are not re-emitted (Iceberg's incremental scan has the same
        # contract: compacted-away history cannot be replayed) — but a
        # fresh stream must start cleanly rather than crash on the
        # missing snapshot JSONs.
        ids = icelite._list_snapshot_ids(self._path)
        return {"snapshot_id": (min(ids) - 1) if ids else 0}

    def latestOffset(self) -> dict:
        # snapshot ids are dense (each commit claims parent+1 via
        # os.link), so after one full listing the per-trigger poll is
        # O(new snapshots) existence probes instead of an O(all
        # snapshots) listdir — after 10k streaming commits the listdir
        # itself becomes the per-trigger planning tax.
        if self._last_seen is None:
            self._last_seen = icelite.current_snapshot_id(self._path)
        meta = icelite._meta_dir(self._path)
        nxt = self._last_seen + 1
        while os.path.exists(os.path.join(meta, icelite._snap_name(nxt))):
            self._last_seen = nxt
            nxt += 1
        return {"snapshot_id": self._last_seen}

    def partitions(self, start: dict, end: dict):
        if not self._cdc:
            return _added_partitions(self._path, start["snapshot_id"],
                                     end["snapshot_id"],
                                     self._skip_replace, self._fids)
        from .icelite_changes import cdc_plan_snapshot

        out: list[_CdcPartition] = []
        ordinal = -1
        for sid in range(start["snapshot_id"] + 1,
                         end["snapshot_id"] + 1):
            snap = _cached_snapshot(self._path, sid)
            parent = (_cached_snapshot(self._path, sid - 1)
                      if snap.get("parent_id") is not None else {})
            tasks = cdc_plan_snapshot(self._path, snap, parent,
                                      self._skip_replace,
                                      fids=self._fids)
            if tasks:
                ordinal += 1
            out.extend(_CdcPartition(t, ordinal) for t in tasks)
        return out

    def read(self, partition):
        if isinstance(partition, _CdcPartition):
            from .icelite_changes import cdc_read_partition

            yield from cdc_read_partition(self._path, partition.task,
                                          self._schema_json,
                                          partition.ordinal)
            return
        yield from _arrow_batches(partition.path, self._schema_json,
                                  getattr(partition, "rg", None),
                                  getattr(partition, "names", None))

    def commit(self, end: dict) -> None:
        pass  # snapshots are immutable; nothing to clean up


class IceliteBatchReader(DataSourceReader):
    def __init__(self, table_path: str, schema_json: str,
                 version: int | None, as_of_ms: int | None):
        self._path = table_path
        self._schema_json = schema_json
        self._version = version
        self._as_of_ms = as_of_ms

    def partitions(self):
        snap = icelite._resolve_snapshot(
            self._path, version=self._version, as_of_ms=self._as_of_ms)
        fids = icelite._field_ids(snap)
        entries = icelite.table_files(
            self._path, version=self._version, as_of_ms=self._as_of_ms)
        return [p for e in entries
                for p in _entry_partitions(self._path, e, fids)]

    def read(self, partition: _FilePartition):
        yield from _arrow_batches(partition.path, self._schema_json,
                                  getattr(partition, "rg", None),
                                  getattr(partition, "names", None))


class IceliteDataSource(DataSource):
    """``spark.dataSource.register(IceliteDataSource)`` then
    ``spark.read[Stream].format("icelite").load(table_path)``."""

    @classmethod
    def name(cls) -> str:
        return "icelite"

    def _table_path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("icelite needs a table path: .load(path) "
                             "or .option('path', ...)")
        return path

    def _version(self) -> int | None:
        v = self.options.get("version")
        return int(v) if v is not None else None

    def _as_of_ms(self) -> int | None:
        v = self.options.get("as-of-ms")
        return int(v) if v is not None else None

    def _cdc(self) -> bool:
        return str(self.options.get("mode", "")).lower() == "cdc"

    def schema(self) -> StructType:
        table = icelite.table_schema(self._table_path(),
                                     version=self._version())
        if not self._cdc():
            return table
        from .icelite_changes import CHANGE_META_FIELDS

        return StructType(table.fields + CHANGE_META_FIELDS.fields)

    def reader(self, schema: StructType) -> IceliteBatchReader:
        if self._cdc():
            raise ValueError(
                "mode='cdc' is streaming-only here; use "
                "icelite_changes.table_changes for a batch changelog")
        return IceliteBatchReader(self._table_path(), schema.json(),
                                  self._version(), self._as_of_ms())

    def streamReader(self, schema: StructType) -> IceliteStreamReader:
        skip = str(self.options.get("skip-replace-snapshots",
                                    "false")).lower() == "true"
        if self._cdc():
            # workers read data files in the TABLE schema; the three
            # change-metadata columns are appended by the CDC compute
            table = icelite.table_schema(self._table_path())
            return IceliteStreamReader(self._table_path(), table.json(),
                                       skip, cdc=True)
        return IceliteStreamReader(self._table_path(), schema.json(), skip)
