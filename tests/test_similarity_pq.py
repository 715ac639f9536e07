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


def test_adc_rank_contract(spark):
    from dev_dot_cvp_metadata_ingestion_spark.operators.similarity import (
        pq_adc_topk,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = e.filter(F.col("vec_id") % 97 == 0)
    rows = pq_adc_topk(e, q, d=64, m=8, k_codebook=16, k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append((r.rank, r.adc_dist, r.vec_id))
    assert len(by_q) == q.count()
    for q_id, rs in by_q.items():
        rs.sort()
        assert [x[0] for x in rs] == [1, 2, 3, 4, 5]
        # distance non-decreasing with rank; ties broken by vec_id
        for (r1, d1, v1), (r2, d2, v2) in zip(rs, rs[1:]):
            assert d1 < d2 or (d1 == d2 and v1 < v2)
