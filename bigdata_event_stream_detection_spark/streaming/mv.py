"""Continuous materialized-view maintenance over the icelite CDC stream.

``start_mv_maintenance`` keeps a materialized view
(``sources/icelite_mv.py``) current as its source table commits: the
snapshot-incremental CDC source delivers each commit's exact change
rows, and every micro-batch applies them as signed increments through
the SAME merge path as batch refresh. Exactly-once comes from the
view's applied-snapshot watermark, stamped atomically inside each
MERGE commit: a replayed batch (restart, checkpoint loss, duplicate
trigger) sees ``max(_commit_snapshot_id) <= applied`` and is a no-op,
and a batch that partially overlaps the applied range is filtered to
the unapplied suffix — so view content is a pure function of the
source's committed history regardless of trigger boundaries.

Replace-type commits (COW merge/delete, overwrite, rollback) are not
incrementally representable in the stream (the CDC source skips them
under ``skip-replace-snapshots``), so each batch first inspects the
snapshot ops in its range driver-side (O(new snapshots) metadata
reads — the same cost the source's own planner pays): if any replace
op landed, the batch falls back to ``refresh_materialized_view``,
whose ``table_changes(replace_mode="net")`` computes the exact diff.
The common CDC write shapes (appends, merge-on-read upserts/deletes)
take the pure-stream path; compaction and metadata ops are no-change
by construction.

Scale shape: per trigger the stream reads only the files the new
snapshots added (plus O(parent-file) tasks for MOR deletes), the
delta aggregation shuffles O(batch) rows, and the MERGE rewrite is
bounded by stats/bucket pruning on the group key — the view is never
rebuilt and the source is never rescanned on the stream path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..sources.icelite import _load_snapshot, current_snapshot_id
from ..sources.icelite_mv import (
    _apply_change_rows,
    _mv_spec,
    refresh_materialized_view,
)

# ops whose content change the CDC stream cannot represent row-by-row
# (cdc_plan_snapshot raises or skips them); everything else is either
# streamed exactly (append / merge-mor / MOR delete) or a no-change op
_REPLACE_OPS = {"merge", "overwrite", "rollback"}


def _range_needs_net_refresh(src: str, lo: int, hi: int) -> bool:
    for sid in range(lo + 1, hi + 1):
        try:
            snap = _load_snapshot(src, sid)
        except FileNotFoundError:
            # expired history in the range: let the batch path raise
            # its clear cannot-replay error
            return True
        op = snap["operation"]
        if op in _REPLACE_OPS:
            return True
        if op == "delete" and not (snap.get("summary") or {}).get(
                "added_delete_files"):
            return True  # COW delete: files rewritten, no delete files
    return False


def start_mv_maintenance(
    spark: SparkSession,
    mv_path: str,
    checkpoint: str,
    trigger: dict | None = None,
):
    """Start a streaming query that continuously maintains ``mv_path``
    from its source table's CDC stream. Drain deterministically with
    ``sources.icelite_source.available_now_drain`` (pass the source
    table path); returns the started query."""
    from ..sources.icelite_source import IceliteDataSource

    src, group_by, measures, _applied, _filter = _mv_spec(mv_path)
    spark.dataSource.register(IceliteDataSource)
    stream = (spark.readStream.format("icelite")
              .option("mode", "cdc")
              .option("skip-replace-snapshots", "true")
              .load(src))

    def _apply(batch_df, _batch_id: int) -> None:
        bspark = batch_df.sparkSession
        # re-read the watermark every trigger: restarts and replays
        # must observe the committed state, not a captured one
        _s, gb, ms, applied, fsql = _mv_spec(mv_path)
        if batch_df.isEmpty():
            # a skipped replace snapshot planned zero rows but still
            # advanced the offsets — net-refresh catches its diff
            # (no-op when the source is merely idle)
            refresh_materialized_view(bspark, mv_path)
            return
        hi = batch_df.agg(
            F.max("_commit_snapshot_id").alias("m")).first()["m"]
        if hi <= applied:
            return  # replayed batch: already applied, exactly-once
        # The replace check must cover the batch's PLANNED range, not
        # just the rows' range: a replace-type commit AFTER the last
        # row-producing snapshot in the same trigger plans zero rows
        # (skip-replace-snapshots), yet the offsets advance past it —
        # bounding by the rows' max snapshot id would drop its diff
        # forever.  current_snapshot_id(src) is a conservative upper
        # bound for the end offset; over-refreshing is idempotent
        # because the net refresh stamps its own watermark and any
        # later-arriving rows for that range no-op on `hi <= applied`.
        if _range_needs_net_refresh(
                src, applied, max(hi, current_snapshot_id(src))):
            refresh_materialized_view(bspark, mv_path)
            return
        ch = batch_df.filter(F.col("_commit_snapshot_id") > applied)
        _apply_change_rows(bspark, mv_path, ch, gb, ms, hi,
                           filter_sql=fsql)

    writer = (stream.writeStream
              .foreachBatch(_apply)
              .option("checkpointLocation", checkpoint))
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


__all__ = ["start_mv_maintenance"]
