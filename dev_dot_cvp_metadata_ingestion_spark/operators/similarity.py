"""Similarity search over embedding columns (beyond-reference).

Two paths, both UDF-free:

* brute-force top-k: broadcast the query vector, fold-based cosine
  against every row, rank. O(n·d) scan — the correctness baseline and
  still the right answer when the query set is small (broadcast join +
  one pass over the table, no shuffle of the embeddings).
* LSH-bucketed top-k: sign-of-random-hyperplane bucket per vector
  (computed map-side from a deterministic pseudo-random hyperplane
  formula), candidates = same bucket as the query, cosine only within
  the bucket. At 100 TB the bucket column is a partition/cluster key:
  the scan prunes to matching buckets instead of reading the corpus.

The fold-based dot product (zip_with + aggregate, left-to-right) is
bit-reproducible against the DuckDB oracle's explicit sequential fold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity

N_PLANES = 8


def hyperplane(j: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane j (identical formula in
    the oracle SQL): r[i] = ((j*2654435761 + i*40503) % 97)/48.5 - 1."""
    return [((j * 2654435761 + i * 40503) % 97) / 48.5 - 1.0 for i in range(dim)]


def lsh_bucket(vec: Column, dim: int, n_planes: int = N_PLANES) -> Column:
    """Sign-bucket: bit j = (dot(vec, r_j) >= 0)."""
    bucket = None
    for j in range(n_planes):
        r = hyperplane(j, dim)
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(v) for v in r]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("long")


def brute_force_topk(
    emb: DataFrame, query_id: int, k: int = 10, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors of ``query_id`` (excluded from results).
    (vec_id, cos, rank) ordered by cos desc with id tie-break."""
    q = emb.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("qvec")
    )
    scored = (
        emb.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col).alias("vec_id"),
            cosine_similarity(F.col(vec_col), F.col("qvec")).alias("cos"),
        )
    )
    w = W.orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("rank")
    )


def lsh_topk(
    emb: DataFrame, query_id: int, dim: int, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Bucketed ANN: brute-force only within the query's sign-bucket."""
    with_bucket = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    q = with_bucket.filter(F.col("vec_id") == query_id).select(
        F.col("vec").alias("qvec"), F.col("bucket").alias("qbucket")
    )
    cands = (
        with_bucket.crossJoin(F.broadcast(q))
        .filter((F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != query_id))
        .select(
            "vec_id",
            "bucket",
            cosine_similarity(F.col("vec"), F.col("qvec")).alias("cos"),
        )
    )
    w = W.orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("rank")
    )
