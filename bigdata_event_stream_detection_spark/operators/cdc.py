"""CDC changelog application: latest-wins snapshots and SCD2 history.

A 100 TB training-data store is not append-only: documents get
re-crawled, re-scored, and retracted. The standard shape for that is a
keyed CHANGELOG — rows ``(key, ts, id, op, attrs...)`` where ``op`` is
insert/update/delete — applied into either a current-state snapshot
(Delta Live Tables' ``APPLY CHANGES INTO`` / Iceberg ``MERGE INTO``)
or a slowly-changing-dimension type-2 history (one validity interval
per version). The reference engine has no mutation story at all (its
corpus is a static XML dump, SURVEY.md §2.1); this module supplies the
standard one, Spark-first.

Scale notes:

* :func:`latest_snapshot` is ONE aggregate — ``max_by`` over the
  ``(ts, id)`` struct — so it gets map-side partial aggregation for
  free: each input partition reduces to at most |its distinct keys|
  rows before the single key exchange. (Spark plans struct-buffered
  ``max_by`` as SortAggregate, so each side sorts locally — but the
  exchange carries only the PARTIAL aggregates, which is the scale win
  over the textbook ``row_number() ... = 1`` window plan that shuffles
  and sorts every raw row.)
* :func:`scd2_history` is order-sensitive per key (each version's
  ``valid_to`` is the NEXT change's timestamp), so it pays the minimal
  plan for that: one key exchange + per-key sort, with ``lead`` and
  ``row_number`` sharing the same WindowExec sort order (no second
  exchange, no self-join).
* Tombstones participate in both plans before being filtered out, so
  a delete correctly wins a snapshot (key absent) and correctly closes
  the last version's validity interval.

The streaming twin — continuous ``APPLY CHANGES`` into a bucketed
parquet store that only rewrites touched buckets — lives in
``streaming/cdc.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: default op codes, DLT/Debezium-style
INSERT_OP = "I"
UPDATE_OP = "U"
DELETE_OP = "D"


def _attr_cols(
    changelog: DataFrame,
    key_col: str,
    time_col: str,
    id_col: str,
    op_col: str,
    attrs: Sequence[str] | None,
) -> list[str]:
    if attrs is not None:
        return list(attrs)
    skip = {key_col, time_col, id_col, op_col}
    return [c for c in changelog.columns if c not in skip]


def latest_snapshot(
    changelog: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    op_col: str = "op",
    delete_op: str = DELETE_OP,
    attrs: Sequence[str] | None = None,
) -> DataFrame:
    """Apply a changelog to its latest-wins current state: one row per
    key whose most recent change (by ``(time_col, id_col)``) is not a
    delete, carrying that change's attribute values.

    This is the read side of ``APPLY CHANGES INTO`` / ``MERGE INTO``
    expressed as a pure query — no mutable table required. The whole
    job is one aggregate (``max_by`` over the event-order struct):
    partial aggregation collapses each scan partition to its distinct
    keys before the only exchange, so only key-sized partials shuffle
    (the window-``row_number`` alternative shuffles every raw row).

    Output: ``(key_col, <attrs...>, last_ts, last_id)``.
    """
    attr_list = _attr_cols(changelog, key_col, time_col, id_col,
                           op_col, attrs)
    order = F.struct(F.col(time_col), F.col(id_col))
    payload = F.struct(
        F.col(op_col).alias("_op"),
        F.col(time_col).alias("last_ts"),
        F.col(id_col).alias("last_id"),
        *[F.col(c).alias(c) for c in attr_list],
    )
    latest = (changelog
              .groupBy(key_col)
              .agg(F.max_by(payload, order).alias("_last")))
    return (latest
            .filter(F.col("_last._op") != delete_op)
            .select(
                key_col,
                *[F.col(f"_last.{c}").alias(c) for c in attr_list],
                F.col("_last.last_ts").alias("last_ts"),
                F.col("_last.last_id").alias("last_id"),
            ))


def scd2_history(
    changelog: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    op_col: str = "op",
    delete_op: str = DELETE_OP,
    attrs: Sequence[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 view of a changelog: one row
    per non-delete change, valid from its own timestamp until the next
    change to the same key (delete or not). The last open version has
    ``valid_to`` NULL and ``is_current`` true; a trailing delete closes
    the final interval instead, leaving the key with no current row.

    ``version`` numbers every CHANGE (deletes included) in per-key
    event order, so version numbers are stable under later appends and
    gaps in the emitted sequence mark exactly where tombstones fell.

    Plan: ``lead`` + ``row_number`` share one partition+order window —
    a single key exchange and per-key sort (the minimum for
    order-sensitive semantics), then a filter; no join.
    """
    attr_list = _attr_cols(changelog, key_col, time_col, id_col,
                           op_col, attrs)
    w_ord = Window.partitionBy(key_col).orderBy(time_col, id_col)
    versioned = changelog.select(
        key_col, op_col,
        *attr_list,
        F.col(time_col).alias("valid_from"),
        F.col(id_col).alias("change_id"),
        F.row_number().over(w_ord).alias("version"),
        F.lead(time_col).over(w_ord).alias("valid_to"),
    )
    return (versioned
            .filter(F.col(op_col) != delete_op)
            .select(
                key_col, "version", "change_id",
                *attr_list,
                "valid_from", "valid_to",
                F.col("valid_to").isNull().alias("is_current"),
            ))


def events_as_changelog(events: DataFrame) -> DataFrame:
    """Adapt the synthetic ``events`` table into a CDC changelog over
    ``user_id``: ``signup`` rows are inserts, ``error`` rows are
    deletes (account torn down), everything else upserts the user's
    ``event_type``/``value`` state. Pure column mapping — exists so the
    CDC queries and their DuckDB oracles share one derivation.
    """
    return events.withColumn(
        "op",
        F.when(F.col("event_type") == "signup", F.lit(INSERT_OP))
        .when(F.col("event_type") == "error", F.lit(DELETE_OP))
        .otherwise(F.lit(UPDATE_OP)),
    )
