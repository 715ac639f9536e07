"""Persisted IVF-PQ layout: the prebuilt probe must return EXACTLY the
in-query composed ivf_pq_adc_topk rows, the probe's codes scan must be
partition-pruned to the probed cells (static PartitionFilters — the
cell union is collected driver-side) and must never read an embedding
float, and the empty-corpus layout stays readable."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dev_dot_cvp_metadata_ingestion_spark.operators.similarity import (
    ivf_pq_adc_topk,
    ivf_pq_probe_topk,
)
from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
    read_ivf_pq_layout,
    write_ivf_pq_layout,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def layout(spark, emb, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ivfpq") / "layout")
    write_ivf_pq_layout(emb, p, n_cells=8, d=64, m=8, k_codebook=16)
    return p


def _rows(df):
    return sorted(
        (r.q_id, r.vec_id, r.adc_dist, r.rank) for r in df.collect()
    )


def test_probe_equals_in_query_composed_form(spark, emb, layout):
    queries = emb.filter(F.col("vec_id") % 13 == 0)
    pre = ivf_pq_probe_topk(spark, layout, queries, nprobe=2, k=4)
    ref = ivf_pq_adc_topk(
        emb, queries, n_cells=8, nprobe=2, d=64, m=8, k_codebook=16, k=4
    )
    got = _rows(pre)
    assert got == _rows(ref)
    assert got


def test_probe_scan_partition_pruned_no_embedding_read(spark, emb, layout):
    queries = emb.filter(F.col("vec_id") % 29 == 0)
    plan = (
        ivf_pq_probe_topk(spark, layout, queries, nprobe=1, k=3)
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


def test_layout_cells_cover_corpus(spark, emb, layout):
    codes, coarse, cbs, meta = read_ivf_pq_layout(spark, layout)
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


def test_empty_corpus_layout(spark, emb, tmp_path):
    p = str(tmp_path / "ivfpq")
    write_ivf_pq_layout(emb.limit(0), p, n_cells=4, k_codebook=4)
    codes, coarse, cbs, meta = read_ivf_pq_layout(spark, p)
    assert codes.count() == 0
    q = emb.limit(2)
    assert ivf_pq_probe_topk(spark, p, q, nprobe=2, k=3).collect() == []


# r16 fast-tier split (VERDICT r15 item 3): this module is in the SLOW
# tier — long layout/stream/property sweeps excluded from the default
# `-m "not slow"` run (pytest.ini) so the driver's verify-window pytest
# completes; run the FULL suite with `pytest -m ""`.
import pytest as _pytest_r16

pytestmark = _pytest_r16.mark.slow
