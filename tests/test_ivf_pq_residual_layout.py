"""Persisted RESIDUAL IVF-PQ layout: the prebuilt probe must return
EXACTLY the in-query composed ivf_pq_residual_topk rows (same coarse
chain, same residual re-quantization, same residual codebooks — the
whole fixed-point composition replays), the probe's codes scan must be
partition-pruned to the probed cells and never read an embedding
float, the persisted codebooks must live in RESIDUAL space, and the
empty-corpus layout stays readable."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dev_dot_cvp_metadata_ingestion_spark.operators.similarity import (
    ivf_pq_residual_probe_topk,
    ivf_pq_residual_topk,
)
from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
    read_ivf_pq_residual_layout,
    write_ivf_pq_residual_layout,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def layout(spark, emb, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ivfpqres") / "layout")
    write_ivf_pq_residual_layout(emb, p, n_cells=8, d=64, m=8, k_codebook=16)
    return p


def _rows(df):
    return sorted(
        (r.q_id, r.vec_id, r.adc_dist, r.rank) for r in df.collect()
    )


def test_probe_equals_in_query_residual_form(spark, emb, layout):
    queries = emb.filter(F.col("vec_id") % 13 == 0)
    pre = ivf_pq_residual_probe_topk(spark, layout, queries, nprobe=2, k=4)
    ref = ivf_pq_residual_topk(
        emb, queries, n_cells=8, nprobe=2, d=64, m=8, k_codebook=16, k=4
    )
    got = _rows(pre)
    assert got == _rows(ref)
    assert got


def test_probe_scan_partition_pruned_no_embedding_read(spark, emb, layout):
    queries = emb.filter(F.col("vec_id") % 29 == 0)
    plan = (
        ivf_pq_residual_probe_topk(spark, layout, queries, nprobe=1, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pf = [
        l
        for l in plan.splitlines()
        if "PartitionFilters" in l and "cell" in l and "codes" in l
    ]
    assert pf, plan[:2000]
    # ADC never touches the embeddings table
    assert "embeddings.parquet" not in plan


def test_codebooks_are_residual_space(spark, emb, layout):
    """Residual codebooks must be centered near zero (each cell's
    displacement field), NOT at the corpus position — the observable
    difference from the global-codebook layout. With |x| <= 1 at
    scale 1e5, corpus-position codebooks would carry entries up to
    ~1e5; residual entries live well inside that."""
    codes, coarse, cbs, meta = read_ivf_pq_residual_layout(spark, layout)
    n = emb.count()
    assert codes.count() == n * 8
    assert codes.select("vec_id").distinct().count() == n
    assert coarse.count() == 8
    assert (meta["d"], meta["m"]) == (64, 8)
    # each vector sits in exactly one cell across its 8 code rows
    assert (
        codes.groupBy("vec_id")
        .agg(F.countDistinct("cell").alias("nc"))
        .filter(F.col("nc") != 1)
        .count()
        == 0
    )
    stats = (
        cbs.select(F.explode("cf").alias("v"))
        .agg(
            F.avg(F.abs(F.col("v"))).alias("mean_abs"),
            F.max(F.abs(F.col("v"))).alias("max_abs"),
        )
        .first()
    )
    # the residual field is a fraction of the position field's span
    assert stats["max_abs"] < meta["scale"], stats
    assert stats["mean_abs"] < meta["scale"] / 4, stats


def test_empty_corpus_layout(spark, emb, tmp_path):
    p = str(tmp_path / "ivfpqres")
    write_ivf_pq_residual_layout(emb.limit(0), p, n_cells=4, k_codebook=4)
    codes, coarse, cbs, meta = read_ivf_pq_residual_layout(spark, p)
    assert codes.count() == 0
    q = emb.limit(2)
    assert (
        ivf_pq_residual_probe_topk(spark, p, q, nprobe=2, k=3).collect() == []
    )
