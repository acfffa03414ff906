"""Report sinks for the small, final result tables.

Parity with the reference's presentation sinks: the Graphviz ``.dot``
evolution-graph writer (S7, ``evolutiongraph/GraphVisualization.java:
37-158``) and the per-theme strength CSV (S8, ``LifeCycleAnalyserSpark.
java:242-266``). Both operate on *result* tables (thousands of rows at
most) — collecting them to the driver is correct here, unlike the
reference's mid-query collects. Large-scale persistence goes through
``df.write.parquet`` / the streaming exactly-once sink instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_evolution_dot(transitions: DataFrame, out_path: str,
                        max_edges: int = 10_000) -> int:
    """Edge table (window1, theme1, window2, theme2, divergence) ->
    Graphviz dot. Nodes are (window, theme); edge weight = divergence.

    Returns the number of edges written. Caps at ``max_edges`` (sorted
    by divergence ascending = strongest links first) to keep the file
    renderable; the full edge table lives in the parquet sink.
    """
    rows = (
        transitions
        .orderBy(F.col("divergence").asc())
        .limit(max_edges)
        .collect()
    )
    def node(w, t):
        return f"\"{w:%Y%m%d%H}_{t}\""

    lines = ["digraph evolution {", "  rankdir=LR;"]
    seen = set()
    for r in rows:
        for w, t in ((r["window1"], r["theme1"]), (r["window2"], r["theme2"])):
            n = node(w, t)
            if n not in seen:
                seen.add(n)
                lines.append(f"  {n} [label=\"{w:%Y-%m-%d} θ{t}\"];")
    for r in rows:
        lines.append(
            f"  {node(r['window1'], r['theme1'])} -> "
            f"{node(r['window2'], r['theme2'])} "
            f"[label=\"{r['divergence']:.2f}\"];")
    lines.append("}")
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    return len(rows)


def write_strength_csv(events: DataFrame, out_dir: str) -> None:
    """Event rows -> one CSV per theme time-series, distributed write
    (partitioned by theme_id; no driver collect — S8 without the
    stdout bottleneck)."""
    (
        events
        .select("theme_id", "source",
                F.unix_timestamp("window_start").alias("ws_epoch"),
                "strength")
        .repartition("theme_id")
        .sortWithinPartitions("ws_epoch")
        .write.mode("overwrite")
        .partitionBy("theme_id")
        .csv(out_dir, header=True)
    )
