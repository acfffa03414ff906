"""Transitive duplicate-cluster assignment (connected components).

The dedup pair generators (LSH / Jaccard / embedding) emit *pairwise*
candidates; applying dedup means resolving them transitively — A~B,
B~C is ONE cluster {A, B, C} even though (A, C) was never a pair.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_event_stream_detection_spark.operators.dedup import (
    connected_components,
    dedup_clusters,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc1 string, doc2 string")


def test_chain_is_one_cluster(spark):
    # a chain a-b-c-d needs multiple propagation rounds (diameter 3)
    cc = connected_components(
        _pairs(spark, [("b", "a"), ("b", "c"), ("c", "d"), ("x", "y")]))
    got = {r["node"]: r["cluster_id"] for r in cc.collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a",
                   "x": "x", "y": "x"}


def test_cluster_id_is_min_reachable_not_min_partner(spark):
    # dedup_keep_first would keep "c" (no smaller direct partner names
    # it as doc2 ... it does via b<c) — the transitive label must be the
    # global min of the component regardless of pair orientation
    cc = connected_components(
        _pairs(spark, [("m", "z"), ("a", "z")]))
    got = {r["node"]: r["cluster_id"] for r in cc.collect()}
    assert got == {"a": "a", "m": "a", "z": "a"}


def test_empty_pairs(spark):
    cc = connected_components(_pairs(spark, []))
    assert cc.count() == 0


def test_nonconvergence_raises(spark):
    # a 6-chain cannot converge in 1 round — must raise, not mislabel
    chain = [(f"d{i}", f"d{i+1}") for i in range(6)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs(spark, chain), max_iterations=1)


def test_dedup_clusters_covers_whole_corpus(spark):
    docs = spark.createDataFrame(
        [(f"doc{i}",) for i in range(6)], "doc_id string")
    pairs = _pairs(spark, [("doc0", "doc1"), ("doc1", "doc2"),
                           ("doc4", "doc5")])
    out = dedup_clusters(docs, pairs)
    rows = {r["doc_id"]: (r["cluster_id"], r["is_representative"])
            for r in out.collect()}
    assert rows == {
        "doc0": ("doc0", 1), "doc1": ("doc0", 0), "doc2": ("doc0", 0),
        "doc3": ("doc3", 1),  # singleton: own cluster, representative
        "doc4": ("doc4", 1), "doc5": ("doc4", 0),
    }
    # exactly one representative per cluster
    reps = (out.groupBy("cluster_id")
            .agg(F.sum("is_representative").alias("n_reps")).collect())
    assert all(r["n_reps"] == 1 for r in reps)


def test_contamination_overlap_counts_shared_shingles(spark):
    from bigdata_event_stream_detection_spark.operators.dedup import (
        contamination_overlap,
    )

    train = spark.createDataFrame(
        [("t0", "the quick brown fox jumps"),   # shares "the quick brown",
                                                # "quick brown fox" with eval
         ("t1", "completely different words here"),
         ("t2", "hi")],                          # <k words: whole-doc shingle
        "doc_id string, text string")
    eval_docs = spark.createDataFrame(
        [("e0", "the quick brown fox"), ("e1", "hi")],
        "doc_id string, text string")
    got = {r["doc_id"]: r
           for r in contamination_overlap(train, eval_docs, k=3).collect()}
    # t0: 3 distinct trigram shingles, 2 in the eval set
    assert got["t0"]["n_shingles"] == 3
    assert got["t0"]["n_contaminated"] == 2
    assert got["t0"]["contaminated_frac"] == round(2 / 3, 6)
    assert got["t1"]["n_contaminated"] == 0
    # short docs fall back to the whole-doc shingle and still match
    assert got["t2"]["n_contaminated"] == 1
    assert got["t2"]["contaminated_frac"] == 1.0


def test_simhash_candidate_pairs_exact_for_hamming_bound(spark):
    from bigdata_event_stream_detection_spark.operators.dedup import (
        simhash,
        simhash_candidate_pairs,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dogs today",  # near-dup
        "completely different subject matter entirely unrelated words",
        "another unrelated document about spark query planning",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    got = {(r["doc1"], r["doc2"]): r["hamming"]
           for r in simhash_candidate_pairs(
               docs, bits=16, bands=4, max_hamming=3).collect()}
    # ground truth: brute-force hamming over the fingerprints
    sig = {r["doc_id"]: r["simhash"] for r in simhash(docs, 16).collect()}
    expect = {}
    ids = sorted(sig)
    for i in ids:
        for j in ids:
            if i < j:
                h = bin(sig[i] ^ sig[j]).count("1")
                if h <= 3:
                    expect[(i, j)] = h
    assert got == expect
    assert (0, 1) in got  # the planted near-dup is found


def test_simhash_candidate_pairs_rejects_bad_params(spark):
    import pytest as _pytest

    from bigdata_event_stream_detection_spark.operators.dedup import (
        simhash_candidate_pairs,
    )

    docs = spark.createDataFrame([(0, "x")], "doc_id int, text string")
    with _pytest.raises(ValueError):
        simhash_candidate_pairs(docs, bits=16, bands=5)
    with _pytest.raises(ValueError):
        simhash_candidate_pairs(docs, bits=16, bands=4, max_hamming=4)


def test_bloom_contamination_one_sided_vs_exact(spark):
    from bigdata_event_stream_detection_spark.operators.dedup import (
        bloom_contamination, contamination_overlap,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    train = docs.filter(F.col("doc_id") % 20 != 0)
    ev = docs.filter(F.col("doc_id") % 20 == 0)

    exact = {r["doc_id"]: r["n_contaminated"]
             for r in contamination_overlap(train, ev, k=3).collect()}
    # tiny filter: false positives live, but NEVER a false negative
    small = {r["doc_id"]: r["n_flagged"]
             for r in bloom_contamination(
                 train, ev, m=512, num_hashes=3).collect()}
    assert set(small) == set(exact)
    assert all(small[d] >= exact[d] for d in exact)
    assert sum(small.values()) > sum(exact.values())   # FPs present

    # huge filter: FP rate ~0 -> Bloom == exact, bit for bit
    big = {r["doc_id"]: r["n_flagged"]
           for r in bloom_contamination(
               train, ev, m=1 << 26, num_hashes=3).collect()}
    assert big == exact
