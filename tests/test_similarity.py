"""Embedding-column relational operators (operators/similarity.py).

The ANN top-k paths are exercised end-to-end by the driver-contract
oracle gate (ann_cosine_topk / ann_lsh_topk / ann_ivf_topk at sf0.01);
this file unit-tests the aggregate surfaces on planted vectors.
"""

from __future__ import annotations

from bigdata_event_stream_detection_spark.operators.similarity import (
    embedding_centroids,
)


def test_embedding_centroids_dimension_wise_mean(spark):
    rows = [
        (0, [1.0, 2.0, 3.0], "a"),
        (1, [3.0, 4.0, 5.0], "a"),
        (2, [10.0, 0.0, -2.0], "b"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id int, embedding array<float>, label string")
    got = {(r["label"], r["dim"]): r["centroid"]
           for r in embedding_centroids(df).collect()}
    assert got == {
        ("a", 0): 2.0, ("a", 1): 3.0, ("a", 2): 4.0,
        ("b", 0): 10.0, ("b", 1): 0.0, ("b", 2): -2.0,
    }
