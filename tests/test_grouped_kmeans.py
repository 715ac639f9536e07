"""r15 optimization pins: the grouped PQ trainer must be
value-identical to the m-independent-chain form it replaced, and the
narrow-scan rebalance must be a no-op exactly when the scan is
already parallel.

The PQ-family DuckDB oracles already hash-pin end results; these
tests pin the EQUIVALENCE CLAIM itself (grouped kmeans ≡ per-subspace
kmeans_assign, row for row) so a future edit to either trainer that
breaks the other is caught at the operator level, not two layers up.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dev_dot_cvp_metadata_ingestion_spark.operators.similarity import (
    _pq_long_form,
    kmeans_assign,
    kmeans_assign_grouped,
)

from .conftest import SF_SMOKE


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_grouped_kmeans_equals_per_subspace_chains(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    d, m, k, iters, scale = 64, 8, 16, 2, 100_000
    sub = d // m

    x = _pq_long_form(
        emb, d, m, id_out="vec_id", vec_col="embedding", scale=scale
    )
    asg, cents = kmeans_assign_grouped(x, k=k, iters=iters)

    for s in (0, 3, m - 1):  # spot-check three subspaces end to end
        sl = emb.select(
            "vec_id",
            F.slice(F.col("embedding"), s * sub + 1, sub).alias("embedding"),
        )
        ref_asg, ref_cents = kmeans_assign(
            sl, k=k, iters=iters, scale=scale, return_centroids=True
        )
        got_asg = asg.filter(F.col("subspace") == s)
        assert _rows(got_asg, ["vec_id", "cluster", "dist"]) == _rows(
            ref_asg, ["vec_id", "cluster", "dist"]
        ), f"subspace {s}: assignments diverge from the m-chain form"
        got_c = {
            r["cluster"]: list(r["cf"])
            for r in cents.filter(F.col("subspace") == s).collect()
        }
        ref_c = {r["cluster"]: list(r["cf"]) for r in ref_cents.collect()}
        assert got_c == ref_c, f"subspace {s}: centroids diverge"


def test_kmeans_ckpt_flag_is_value_neutral(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    a1, c1 = kmeans_assign(emb, k=8, iters=2, return_centroids=True)
    a2, c2 = kmeans_assign(
        emb, k=8, iters=2, return_centroids=True, ckpt=True
    )
    assert _rows(a1, ["vec_id", "cluster", "dist"]) == _rows(
        a2, ["vec_id", "cluster", "dist"]
    )
    assert _rows(c1, ["cluster"]) == _rows(c2, ["cluster"])


def test_rebalance_narrow_scan_is_scale_adaptive(spark):
    from dev_dot_cvp_metadata_ingestion_spark.functions.relations import (
        rebalance_narrow_scan,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    target = spark.sparkContext.defaultParallelism
    narrow = rebalance_narrow_scan(docs)
    if docs.rdd.getNumPartitions() * 2 <= target:
        assert narrow.rdd.getNumPartitions() == target
        # same rows either way — the exchange is shape-only
        assert narrow.count() == docs.count()
    # an already-parallel relation passes through UNTOUCHED (no new
    # exchange): simulate with a pre-repartitioned frame
    wide = docs.repartition(target)
    assert rebalance_narrow_scan(wide) is wide
