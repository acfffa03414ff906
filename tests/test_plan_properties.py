"""Static physical-plan guarantees for the headline queries.

BENCH.md's plan audits are run by hand (tools/explain_audit.py); this
test pins the two properties that must NEVER regress, on every headline
query, at plan-build time (no execution beyond what query construction
itself does):

* no ``CartesianProduct`` — an all-pairs join sneaking into a headline
  plan is the canonical 100x-at-scale regression;
* every parquet scan of a fact table prunes columns (``ReadSchema``
  never re-lists the full 16-column lineitem / 9-column orders width
  for a projection query).

The audit runs against sf0.001 so plan construction (which for the
model pipelines includes the one-time background-model collect) stays
in milliseconds.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest

SF_DIR = "/root/testdata/sf0.001"

HEADLINE = [
    "word_count", "background_model", "windowed_event_counts",
    "sliding_window_counts", "session_windows", "topk_event_types_per_user",
    "semi_join_filter", "revenue_per_nation", "token_counts",
    "quality_scores", "dedup_exact", "dedup_minhash_lsh",
    "ann_cosine_topk", "evolution_edges", "detect_events",
    # round-2 late additions: CEP + relational-depth queries
    "absence_patterns", "timeout_alerts", "funnel_times_within",
    "anti_join_inactive", "grouping_sets_counts", "percent_rank_prices",
    "above_avg_orders", "trailing_value_sums", "value_change_lag",
    "json_props_stats",
    # final round-2 additions: interval/run/rules CEP + quality gate
    "interval_error_purchase", "error_runs", "timeout_rule_alerts",
    "expectation_summary",
    # round-2 continuation: CDC family + MATCH_RECOGNIZE sequences
    "latest_user_state", "scd2_user_history", "seq_matches",
    "seq_rule_matches", "seq_define_matches", "seq_overlap_matches",
    # round 3: icelite table-format queries (build tables then read)
    "icelite_merge_snapshot", "icelite_time_travel",
    "icelite_pruned_scan",
    # round 5: block-GEMM kernel stages (pin_partitions invariant)
    "embedding_near_dups", "semantic_dedup", "ann_binary_hamming",
]


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def plans(spark):
    import __spark_entry__ as entry_mod

    qmap = entry_mod.queries()
    return {name: _formatted_plan(qmap[name](spark, SF_DIR))
            for name in HEADLINE}


def test_no_cartesian_product(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert offenders == []


def test_fact_scans_prune_columns(plans):
    # every ReadSchema on a known-wide table must select a strict
    # subset of its columns (lineitem has 16, orders 9, events 7)
    widths = {"lineitem": 16, "orders": 9, "events": 7}
    for name, plan in plans.items():
        # formatted explain lists one detail block per scan node:
        # "(N) Scan parquet ... Location: ...<table>.parquet ...
        #  ReadSchema: struct<...>"
        for block in re.split(r"\(\d+\) Scan parquet", plan)[1:]:
            loc = re.search(r"Location:.*/(\w+)\.parquet", block)
            schema = re.search(r"ReadSchema: struct<([^>]*)>", block)
            if not loc or not schema:
                continue
            table = loc.group(1)
            if table in widths and schema.group(1):
                ncols = schema.group(1).count(":")
                assert ncols < widths[table], (
                    f"{name}: scan of {table} reads all {ncols} columns")


def _tree_nodes(plan: str):
    """(depth, op, id) for each node line of the formatted-plan tree.

    Tree lines look like ``   +- FlatMapGroupsInPandas (21)`` /
    ``   :     +- Exchange (18)``; depth is the column where the
    operator name starts (strictly increases child-ward)."""
    nodes = []
    for line in plan.splitlines():
        m = re.match(r"^([\s:+*-]*)([A-Za-z][A-Za-z ]*) \((\d+)\)\s*$",
                     line)
        if m:
            nodes.append((len(m.group(1)), m.group(2).strip(),
                          int(m.group(3))))
    return nodes


def test_kernel_exchanges_are_pinned(plans):
    """The CLAUDE.md round-4 invariant, enforced engine-wide: every
    Exchange feeding an ``applyInPandas``/cogroup kernel stage must
    carry an EXPLICIT partition count (``REPARTITION_BY_NUM``) —
    AQE's byte-based coalescing otherwise serializes CPU-bound kernel
    stages onto one task.  ``ENSURE_REQUIREMENTS`` under a kernel node
    means someone forgot ``util.pin_partitions``."""
    kernel_ops = ("FlatMapGroupsInPandas", "FlatMapCoGroupsInPandas")
    offenders = []
    for name, plan in plans.items():
        nodes = _tree_nodes(plan)
        for i, (depth, op, _nid) in enumerate(nodes):
            if not any(op.startswith(k) for k in kernel_ops):
                continue
            # first Exchange in this node's subtree = the kernel's
            # input shuffle (ReusedExchange reuses a checked one)
            for d2, op2, nid2 in nodes[i + 1:]:
                if d2 <= depth:
                    break
                if op2 == "ReusedExchange":
                    break
                if op2 == "Exchange":
                    detail = re.search(
                        r"\(%d\) Exchange\n(?:.+\n)*?Arguments: (.*)"
                        % nid2, plan)
                    if detail and "REPARTITION_BY_NUM" not in detail.group(1):
                        offenders.append(
                            f"{name}: {op} fed by unpinned Exchange "
                            f"({nid2}): {detail.group(1)}")
                    break
    assert offenders == []


def test_broadcast_join_on_small_dims(plans):
    # revenue_per_nation joins 25-row nation / 1.5k-row customer:
    # the big side must never shuffle for it
    plan = plans["revenue_per_nation"]
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
