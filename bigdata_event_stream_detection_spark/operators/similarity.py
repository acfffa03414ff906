"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a crossJoin against a *broadcast*
query set (queries are few; the big side streams through codegen, no
shuffle of the corpus). Scale path: LSH sign-bucketing — corpus and
queries are both hashed to a bucket key, the join is an equi-join on
the bucket, and only same-bucket pairs are scored.

The dot product / norms are built-in higher-order functions
(``zip_with`` + ``aggregate``) — JVM-side, no Python. For genuinely
huge k·d, a pandas UDF over Arrow would batch better; at d≈128 the
codegen expressions win by skipping Python entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textfns import hash60


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast queries × corpus scan.

    Output: (query_id, neighbor_id, rank, cos). Self-matches excluded.
    One shuffle (the top-k window partitioned by query).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine_expr(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos"))
    )


def _sign_bucket(vec: Column, planes: int) -> Column:
    """LSH bucket id: sign bits against `planes` pseudo-random
    hyperplanes. Plane p's coefficient for dimension i is a deterministic
    ±1 from the md5-based hash — portable to the SQL oracle and free of
    stored codebooks."""
    def bit(p: int) -> Column:
        # sum_i coef(p, i) * v_i  with coef = ±1 from hash60(p:i)
        signed = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda v, i: F.when(
                    hash60(F.concat_ws(":", F.lit(str(p)), i.cast("string")))
                    .bitwiseAND(F.lit(1)) == 1,
                    v.cast("double"),
                ).otherwise(-v.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(signed > 0, F.lit(1 << p)).otherwise(F.lit(0))

    out = F.lit(0)
    for p in range(planes):
        out = out + bit(p)
    return out


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: equi-join on the sign-LSH bucket, then exact
    cosine within bucket. 2^planes buckets; recall trades off with
    planes. The join is a plain hash join on the bucket key — this is
    the shape that survives a 10^9-vector corpus (bucket + shuffle),
    unlike the brute-force crossJoin."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("bucket", _sign_bucket(F.col("cv"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("bucket", _sign_bucket(F.col("qv"), planes))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine_expr(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos"))
    )
