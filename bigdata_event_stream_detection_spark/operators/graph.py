"""Link-analysis over candidate-pair graphs.

The dedup operators (LSH / Jaccard / SimHash / embedding) emit pair
graphs; ``dedup.connected_components`` turns them into clusters. This
module adds centrality over the same graphs: PageRank picks CANONICAL
representatives (the most-connected copy of a template is usually the
original; min-id is arbitrary) and ranks boilerplate hubs for audit.

Same distributed discipline as connected_components: edges symmetrize
once and persist, every iteration is ONE key-shuffle join + ONE hash
agg, the driver only orchestrates the loop counter. No GraphX/GraphFrames
dependency — the pair graphs here are shallow and edge-bounded, so the
relational form is fewer moving parts than a Pregel runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    pairs: DataFrame,
    col1: str = "doc1",
    col2: str = "doc2",
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """(node, rank) over the UNDIRECTED graph of ``pairs`` after a
    fixed number of power iterations:

        rank(v) = (1-d)/N + d * sum_{u~v} rank(u) / deg(u)

    Fixed iterations (not a convergence test) keep the result exactly
    reproducible by a single-node recompute — same contract as the
    EM/k-means oracles. Nodes are the pair endpoints; rank mass sums
    to 1 over them (symmetrized graphs have no dangling nodes).

    Scale shape: the degree-weighted adjacency is built once and
    persisted (2|E| rows); each iteration shuffles |E| contribution
    rows into a hash agg keyed by node. Rank state never touches the
    driver.
    """
    e = pairs.select(F.col(col1).alias("src"), F.col(col2).alias("dst"))
    edges = (
        e.union(e.select(F.col("dst").alias("src"),
                         F.col("src").alias("dst")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("_deg"))
    adj = (
        edges.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("_deg")).alias("_w"))
        .persist()
    )
    nodes = adj.select(F.col("src").alias("node")).distinct().persist()
    n = nodes.count()
    if n == 0:
        adj.unpersist()
        nodes.unpersist()
        return nodes.withColumn("rank", F.lit(0.0))
    base = (1.0 - float(damping)) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    prev = None
    for _ in range(int(iterations)):
        contrib = (
            adj.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("_w")).alias("_c"))
            .withColumnRenamed("dst", "node")
        )
        stepped = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base)
                 + F.lit(float(damping)) * F.coalesce("_c", F.lit(0.0)))
                .alias("rank"),
            )
            .persist()
        )
        stepped.count()   # materialize: truncate the per-round lineage
        if prev is not None:
            prev.unpersist()
        prev = stepped
        ranks = stepped
    adj.unpersist()
    nodes.unpersist()
    return ranks
