"""Product-quantization codes: structural invariants beyond the
oracle-hash parity (tests/test_oracle_parity.py covers exact values) —
m rows per vector, codes drawn from the seed-id codebook, and the
per-vector reconstruction error decreasing as codebooks grow."""

from __future__ import annotations

import pyspark.sql.functions as F

from dev_dot_cvp_metadata_ingestion_spark.operators.similarity import pq_codes

SF = "/root/testdata/sf0.001"


def test_shape_and_code_domain(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = e.count()
    out = pq_codes(e, d=64, m=8, k=16, iters=2)
    assert out.count() == n * 8
    assert out.select("vec_id", "subspace").distinct().count() == n * 8
    # codes are seed ids: the 16 smallest vec_ids
    seeds = [r.vec_id for r in e.select("vec_id").orderBy("vec_id").limit(16).collect()]
    assert out.filter(~F.col("code").isin(seeds)).count() == 0
    assert out.filter((F.col("subspace") < 0) | (F.col("subspace") > 7)).count() == 0


def test_more_centroids_reduce_reconstruction_error(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")

    def total_err(k):
        return (
            pq_codes(e, d=64, m=4, k=k, iters=2)
            .agg(F.sum("dist"))
            .first()[0]
        )

    # k=1 (everything in one cell) must be strictly worse than k=16
    assert total_err(16) < total_err(1)
