"""PageRank over pair graphs (operators/graph.py): closed-form checks
on symmetric structures, mass conservation, determinism. Exact
distributed-vs-single-node parity is covered by the driver-contract
oracle (dup_graph_pagerank vs tools/local_oracle.pagerank_rows).
"""

from __future__ import annotations

import pytest

from bigdata_event_stream_detection_spark.operators.graph import pagerank


def test_ring_is_uniform_and_mass_conserves(spark):
    # 5-ring: perfect symmetry -> uniform 1/5 at every iteration
    pairs = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], "doc1 long, doc2 long")
    got = {r["node"]: r["rank"] for r in pagerank(pairs).collect()}
    assert len(got) == 5
    for v in got.values():
        assert v == pytest.approx(0.2, abs=1e-12)


def test_star_center_dominates(spark):
    # star: center sees every leaf's full mass, leaves split the center
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 7)], "doc1 long, doc2 long")
    got = {r["node"]: r["rank"] for r in pagerank(pairs).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    leaves = [got[i] for i in range(1, 7)]
    assert max(leaves) == pytest.approx(min(leaves), abs=1e-12)
    assert got[0] > 3 * max(leaves)


def test_pagerank_deterministic_under_partitioning(spark):
    import random

    rng = random.Random(5)
    pairs = spark.createDataFrame(
        [(rng.randrange(30), rng.randrange(30)) for _ in range(60)],
        "doc1 long, doc2 long").filter("doc1 != doc2")
    a = sorted(map(tuple, pagerank(pairs, iterations=6).collect()))
    b = sorted(map(tuple, pagerank(
        pairs.repartition(7), iterations=6).collect()))
    assert [(n, round(r, 9)) for n, r in a] == [
        (n, round(r, 9)) for n, r in b]


def test_pagerank_empty_pairs(spark):
    pairs = spark.createDataFrame([], "doc1 long, doc2 long")
    assert pagerank(pairs).count() == 0
