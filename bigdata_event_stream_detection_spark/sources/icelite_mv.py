"""Incrementally-maintained materialized views over icelite tables.

A materialized view is an aggregation (``GROUP BY`` + count/sum/avg
measures) over a source table, stored as its own icelite table and
kept current by applying the source's CHANGELOG instead of
recomputing: ``refresh`` reads ``table_changes`` over exactly the
snapshot range committed since the last refresh, turns inserts into
``+`` and deletes into ``-`` increments, aggregates the increments
per group (one shuffle over the DELTA, not the table), and MERGEs the
touched groups into the view. The applied-source-snapshot watermark is
stamped in the SAME commit as the data change (``merge_into``'s
atomic ``properties``), so a crashed refresh can never double-apply a
delta — rerunning simply recomputes the same range.

This is the standard incremental-view-maintenance shape (delta
processing over a change stream — Materialize/differential-dataflow
style, and Snowflake/Databricks incremental MV refresh) expressed in
the engine's own primitives: changelog scan + stats-pruned MERGE.

Scale shape: refresh cost is O(delta) for the changelog scan and
aggregation, plus a MERGE whose rewrite is bounded by the files whose
``_gkey`` range overlaps touched groups (file-stats pruning; create
the view with ``bucket=`` for exact bucket pruning under uniform
group keys). The view never rescans the source. Compaction/layout
rewrites of the source net to ZERO changes (``replace_mode="net"``)
and only advance the watermark; a source ``rollback_to`` nets its
exact diff, so the view follows it correctly.

Measure semantics match SQL exactly, including nulls: ``count(*)``,
``count(col)`` (non-null), ``sum(col)`` (NULL when no non-null rows
remain — a non-null companion count is maintained internally),
``avg(col)``. min/max are intentionally rejected: they are not
incrementally maintainable under deletes without re-scanning affected
groups (the classic IVM limitation — use a full recompute for those).

Note on float sums: the incremental total is the initial sum plus a
different-order sequence of +/- increments, so it can drift from a
direct recompute by float-rounding (~1e-9 relative); integer sums and
counts are exact.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .icelite import (
    create_table,
    current_snapshot_id,
    merge_into,
    read_table,
    set_properties,
    table_properties,
)
from .icelite_changes import table_changes

_INT_TYPES = {"integer", "long", "short", "byte"}
_FLOAT_TYPES = {"double", "float"}


def _gkey_expr(group_by: list[str]):
    # injective group-key rendering (nulls kept explicit so a NULL
    # group value joins with itself; json escaping keeps embedded
    # separators unambiguous) — the single MERGE key for composite /
    # nullable GROUP BY columns
    return F.to_json(F.struct(*[F.col(c) for c in group_by]),
                     {"ignoreNullFields": "false"})


def _storage_cols(name: str, agg: str) -> list[str]:
    if agg == "count":
        return [name]
    return [name, f"{name}__nn"]


def _normalize_measures(measures: dict) -> dict[str, tuple[str, str | None]]:
    out: dict[str, tuple[str, str | None]] = {}
    for name, spec in measures.items():
        if name.startswith("_") or "__" in name:
            raise ValueError(f"measure name {name!r}: leading '_' and "
                             "'__' are reserved for storage columns")
        agg, col = (spec if isinstance(spec, (tuple, list))
                    else (spec, None))
        if agg in ("min", "max"):
            raise ValueError(
                f"measure {name!r}: {agg} is not incrementally "
                "maintainable under deletes (a delete of the current "
                "extreme needs a group rescan); recompute instead")
        if agg not in ("count", "sum", "avg"):
            raise ValueError(f"measure {name!r}: unknown agg {agg!r} "
                             "(supported: count, sum, avg)")
        if agg in ("sum", "avg") and col is None:
            raise ValueError(f"measure {name!r}: {agg} needs a column")
        out[name] = (agg, col)
    return out


def _delta_aggs(measures: dict[str, tuple[str, str | None]], sign):
    """Signed-increment aggregate expressions over a change frame."""
    aggs = [F.sum(sign).alias("_rows")]
    for name, (agg, col) in measures.items():
        if agg == "count":
            if col is None:
                aggs.append(F.sum(sign).alias(name))
            else:
                aggs.append(F.sum(F.when(F.col(col).isNotNull(), sign)
                                  .otherwise(F.lit(0))).alias(name))
        else:
            val = sign * F.col(col)
            if agg == "avg":
                val = val.cast("double")
            aggs.append(F.sum(val).alias(name))
            aggs.append(F.sum(F.when(F.col(col).isNotNull(), sign)
                              .otherwise(F.lit(0)))
                        .alias(f"{name}__nn"))
    return aggs


def _merge_new_state(delta: DataFrame, old: DataFrame,
                     group_by: list[str],
                     measures: dict[str, tuple[str, str | None]],
                     ) -> DataFrame:
    """New stored rows for every group present in ``delta``: old state
    (0 for new groups) plus the signed increments; ``_delete`` marks
    groups whose live row count reached zero."""
    internal = ["_rows"]
    for name, (agg, _col) in measures.items():
        internal += _storage_cols(name, agg)
    oldr = old.select(
        "_gkey", *[F.col(c).alias(f"_o_{c}") for c in internal])
    j = delta.join(oldr, "_gkey", "left")
    upd = [(F.coalesce(F.col(f"_o_{c}"), F.lit(0))
            + F.coalesce(F.col(c), F.lit(0))).alias(c)
           for c in internal]
    return (j.select("_gkey", *group_by, *upd)
            .withColumn("_delete", F.col("_rows") == 0))


def create_materialized_view(
    spark: SparkSession,
    source_path: str,
    mv_path: str,
    group_by: list[str],
    measures: dict,
    bucket: int | None = None,
    filter_sql: str | None = None,
) -> int:
    """Create + initially populate a materialized view.

    ``measures`` maps output names to ``(agg, col)`` with agg in
    {count, sum, avg} (``("count", None)`` = ``count(*)``). The
    initial state is ONE aggregation over the source pinned at its
    current snapshot; the same commit stamps that snapshot as the
    applied watermark, so the first ``refresh`` starts exactly after
    it. ``bucket`` partitions the view by ``bucket(n)`` on the group
    key, giving refreshes exact bucket pruning when group keys are
    uniform (the same lever the CDC sink uses). ``filter_sql`` is the
    view's WHERE clause (a SQL boolean over source columns): applied
    to the initial build AND to every change delta symmetrically, so
    an update that moves a row across the predicate boundary nets to
    the correct insert-only / delete-only increment."""
    measures = _normalize_measures(measures)
    src_snap = current_snapshot_id(source_path)
    base = read_table(spark, source_path, version=src_snap)
    for c in group_by:
        if c not in base.columns:
            raise ValueError(f"group_by column {c!r} not in source")
    schema = base.schema
    for name, (agg, col) in measures.items():
        if col is not None and col not in base.columns:
            raise ValueError(f"measure {name!r}: column {col!r} "
                             "not in source")
        if agg in ("sum", "avg") and col is not None:
            t = schema[col].dataType.typeName()
            if t not in _INT_TYPES | _FLOAT_TYPES:
                raise ValueError(
                    f"measure {name!r}: {agg}({col}) needs a numeric "
                    f"column, got {t} (decimals: cast to double first)")
    # initial state = the same signed aggregation with sign == +1 over
    # the full table — one code path for initial build and refresh
    if filter_sql:
        base = base.filter(F.expr(filter_sql))
    state = (base.groupBy(*group_by)
             .agg(*_delta_aggs(measures, F.lit(1)))
             .withColumn("_gkey", _gkey_expr(group_by)))
    definition = {"group_by": group_by,
                  "measures": {n: list(s) for n, s in measures.items()}}
    if filter_sql:
        definition["filter"] = filter_sql
    create_table(
        mv_path, state.schema,
        partition_spec=([("_gkey", "bucket", bucket)] if bucket else None),
        properties={
            "mv.source": source_path,
            "mv.definition": json.dumps(definition),
        })
    return merge_into(spark, mv_path, state, key="_gkey",
                      properties={"mv.applied_to": str(src_snap)})


def _mv_spec(mv_path: str) -> tuple[str, list[str], dict, int,
                                    str | None]:
    props = table_properties(mv_path)
    try:
        src = props["mv.source"]
        d = json.loads(props["mv.definition"])
        applied = int(props["mv.applied_to"])
    except KeyError as e:
        raise ValueError(f"{mv_path!r} is not a materialized view "
                         f"(missing {e} property)")
    measures = {n: (s[0], s[1]) for n, s in d["measures"].items()}
    return src, d["group_by"], measures, applied, d.get("filter")


def _apply_change_rows(spark: SparkSession, mv_path: str,
                       ch: DataFrame, group_by: list[str],
                       measures: dict[str, tuple[str, str | None]],
                       watermark: int,
                       filter_sql: str | None = None) -> int:
    """Apply a frame of change rows (``_change_type`` insert/delete)
    as signed increments and advance the applied watermark to
    ``watermark`` — atomically when data changes (the MERGE commit),
    as a metadata-only commit when the changes net to nothing. Shared
    by batch refresh and the streaming maintainer. ``filter_sql``
    (the view's WHERE clause) applies to inserts and deletes alike —
    the symmetry that keeps a filtered view consistent when updates
    move rows across the predicate boundary."""
    if filter_sql:
        ch = ch.filter(F.expr(filter_sql))
    sign = F.when(F.col("_change_type") == "insert",
                  F.lit(1)).otherwise(F.lit(-1))
    delta = (ch.groupBy(*group_by)
             .agg(*_delta_aggs(measures, sign))
             .withColumn("_gkey", _gkey_expr(group_by)))
    if not delta.head(1):
        # nothing but rewrites in the range (e.g. compaction):
        # advance the watermark without touching data
        return set_properties(mv_path, {"mv.applied_to": str(watermark)})
    old = read_table(spark, mv_path)
    new_state = _merge_new_state(delta, old, group_by, measures)
    return merge_into(spark, mv_path, new_state, key="_gkey",
                      delete_col="_delete",
                      properties={"mv.applied_to": str(watermark)})


def refresh_materialized_view(spark: SparkSession,
                              mv_path: str) -> int | None:
    """Apply all source changes since the last refresh; returns the
    new view snapshot id, or None when already current. One changelog
    scan + one delta aggregation + one stats/bucket-pruned MERGE;
    source compactions net to zero rows and only advance the
    watermark (a metadata-only commit)."""
    src, group_by, measures, applied, filter_sql = _mv_spec(mv_path)
    src_snap = current_snapshot_id(src)
    if src_snap <= applied:
        return None
    ch = table_changes(spark, src, applied, src_snap,
                       replace_mode="net")
    return _apply_change_rows(spark, mv_path, ch, group_by, measures,
                              src_snap, filter_sql=filter_sql)


def rebuild_materialized_view(spark: SparkSession,
                              mv_path: str) -> int:
    """Full recompute: one aggregation over the source's current
    snapshot replaces the view's content, with the applied watermark
    reset in the SAME commit (``overwrite``'s atomic properties).

    The recovery path when incremental refresh is impossible — the
    source's changelog history has been expired past the view's
    watermark (``refresh`` raises its cannot-replay error), or a
    drifted float-sum view should be re-based. Also the documented
    answer for min/max-style measures, which are not incrementally
    maintainable under deletes."""
    from .icelite import overwrite

    src, group_by, measures, _applied, filter_sql = _mv_spec(mv_path)
    src_snap = current_snapshot_id(src)
    base = read_table(spark, src, version=src_snap)
    if filter_sql:
        base = base.filter(F.expr(filter_sql))
    state = (base.groupBy(*group_by)
             .agg(*_delta_aggs(measures, F.lit(1)))
             .withColumn("_gkey", _gkey_expr(group_by)))
    return overwrite(state, mv_path,
                     properties={"mv.applied_to": str(src_snap)})


def materialized_view_status(mv_path: str) -> dict:
    """Freshness/observability snapshot of a view: its definition,
    the applied source snapshot, the source's current snapshot, and
    ``lag`` (commits not yet applied — what a monitoring loop alerts
    on). Metadata-only: two snapshot-log reads, no Spark job."""
    src, group_by, measures, applied, filter_sql = _mv_spec(mv_path)
    current = current_snapshot_id(src)
    return {
        "source": src,
        "group_by": list(group_by),
        "measures": {n: list(s) for n, s in measures.items()},
        "filter": filter_sql,
        "applied_source_snapshot": applied,
        "current_source_snapshot": current,
        "lag": max(0, current - applied),
        "fresh": current <= applied,
    }


def read_materialized_view(spark: SparkSession,
                           mv_path: str,
                           version: int | None = None) -> DataFrame:
    """The view's user-facing result: group columns + measure columns
    with exact SQL semantics (sum/avg NULL when a group has no
    non-null values; avg rendered from its maintained sum/count)."""
    _src, group_by, measures, _applied, _filter = _mv_spec(mv_path)
    df = read_table(spark, mv_path, version=version)
    cols = [F.col(c) for c in group_by]
    for name, (agg, _col) in measures.items():
        if agg == "count":
            cols.append(F.col(name).cast("long").alias(name))
        elif agg == "sum":
            cols.append(F.when(F.col(f"{name}__nn") > 0, F.col(name))
                        .alias(name))
        else:
            cols.append(F.when(F.col(f"{name}__nn") > 0,
                               F.col(name) / F.col(f"{name}__nn"))
                        .alias(name))
    return df.select(*cols)


__all__ = ["create_materialized_view", "refresh_materialized_view",
           "rebuild_materialized_view", "read_materialized_view",
           "materialized_view_status"]
