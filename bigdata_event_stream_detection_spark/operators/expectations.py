"""Declarative data-quality expectations over any table or stream.

The validation gate a training-data pipeline runs before anything
ships: each expectation is ``(name, sql_predicate)`` and a row PASSES
an expectation when the predicate is true. Two read-only views:

* :func:`expectation_summary` — one row per expectation with row /
  violation counts and rate. ALL expectations evaluate in ONE scan as
  conditional-count aggregates (map-side partials, a one-row
  exchange); adding an expectation adds a column, never a pass.
* :func:`violating_rows` — (id_cols, expectation name) per failed
  check, for quarantine/debug sinks. One scan, an array-literal
  explode of only the FAILED names per row — output is
  violations-sized, never corpus-sized.

Predicates are SQL strings compiled by Catalyst (pure codegen, no
Python in the row path), so the same expectation set runs unchanged
under ``spark.read``, inside a ``foreachBatch``, or as a windowed
streaming aggregate (group the summary by ``window(ts, ...)``).

NULL semantics follow SQL CHECK constraints: a NULL predicate is a
VIOLATION (use explicit ``IS NULL`` allowances to opt out) — unlike
WHERE filters, a quality gate must not let unknowns pass silently.

Beyond the reference (which validates nothing at ingest); the
operation every curation pipeline needs before `plans/curation`
mixes and ships — see COVERAGE.md §LLM-data-pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _passes(cond: str):
    # NULL -> false: CHECK-constraint semantics, not WHERE semantics
    return F.coalesce(F.expr(cond).cast("boolean"), F.lit(False))


def expectation_summary(
    df: DataFrame,
    checks: list[tuple[str, str]],
) -> DataFrame:
    """One row per expectation: ``(expectation, n_rows, n_violations,
    violation_rate, passed)`` — ``passed`` is true iff no row violates.

    Single full-table scan regardless of the number of checks; the
    stacked per-check columns un-pivot through a literal explode of a
    checks-sized array (no shuffle beyond the one-row final agg).
    """
    if not checks:
        raise ValueError("checks must be non-empty")
    agg = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        # coalesce: sum over ZERO rows is NULL, but an empty input has
        # zero violations, not unknown ones
        *[F.coalesce(F.sum((~_passes(cond)).cast("long")), F.lit(0))
          .alias(f"_v_{i}") for i, (_, cond) in enumerate(checks)])
    pairs = F.array(*[
        F.struct(F.lit(name).alias("expectation"),
                 F.col(f"_v_{i}").alias("n_violations"))
        for i, (name, _) in enumerate(checks)])
    return (agg.select("n_rows", F.explode(pairs).alias("c"))
            .select(
                F.col("c.expectation").alias("expectation"),
                "n_rows",
                F.col("c.n_violations").alias("n_violations"),
                F.round(F.col("c.n_violations")
                        / F.greatest(F.col("n_rows"), F.lit(1)), 6)
                .alias("violation_rate"),
                (F.col("c.n_violations") == 0).alias("passed")))


def violating_rows(
    df: DataFrame,
    checks: list[tuple[str, str]],
    id_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """``(id_cols..., expectation)`` — one row per (row, failed
    check), the quarantine feed. Rows passing every check never leave
    the scan (filter on any-failed before the explode)."""
    if not checks:
        raise ValueError("checks must be non-empty")
    failed = F.filter(
        F.array(*[
            F.when(~_passes(cond), F.lit(name))
            for name, cond in checks]),
        lambda x: x.isNotNull())
    return (df.select(*id_cols, failed.alias("_failed"))
            .filter(F.size("_failed") > 0)
            .select(*id_cols,
                    F.explode("_failed").alias("expectation")))
