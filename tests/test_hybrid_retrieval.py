"""Hybrid retrieval (lexical BM25 + residual IVF-PQ vector search,
RRF-fused): the composed probe over the two persisted layouts must
return EXACTLY the registered in-query ``text_hybrid_rrf`` rows, with
the amortized-serving plan properties both branch families already
pin — zero corpus tokenizes on the lexical side, cell-pruned
codes-not-floats scan on the vector side."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dev_dot_cvp_metadata_ingestion_spark.operators.retrieval import (
    hybrid_probe_topk,
)
from dev_dot_cvp_metadata_ingestion_spark.plans import registry
from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
    load_table,
    write_ivf_pq_residual_layout,
    write_text_index,
)

registry.load_all()


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def layouts(spark, docs, emb, tmp_path_factory):
    base = tmp_path_factory.mktemp("hybrid")
    tp = str(base / "text_index")
    vp = str(base / "vec_layout")
    write_text_index(docs, tp)
    # the registered twin's params (ann family defaults)
    write_ivf_pq_residual_layout(emb, vp, n_cells=8, d=64, m=8,
                                 k_codebook=16, iters=2)
    return tp, vp


def _q(spark):
    from dev_dot_cvp_metadata_ingestion_spark.plans.datapipe import (
        _BM25_QUERIES,
    )

    return spark.createDataFrame(_BM25_QUERIES, "q_id long, term string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _probe(spark, emb, layouts, k=10):
    tp, vp = layouts
    qv = emb.filter(F.col("vec_id").isin(1, 2, 3))
    return hybrid_probe_topk(spark, tp, vp, _q(spark), qv, k=k, nprobe=2)


def test_hybrid_probe_equals_in_query_twin(spark, emb, layouts, sf_dir):
    """Serving from the persisted layouts ≡ the registered in-query
    composition, row-for-row (both branches replay their pinned
    probe ≡ in-query equalities, and RRF is exact integer)."""
    got = _rows(_probe(spark, emb, layouts).orderBy("q_id", "rank"))
    want = _rows(registry.QUERIES["text_hybrid_rrf"](spark, sf_dir))
    assert got == want and got


def test_hybrid_probe_plan_is_amortized_serving(spark, emb, layouts):
    """The composed probe never tokenizes the corpus (lexical branch
    reads only the postings index) and never reads an embedding float
    (vector branch reads cell-pruned codes): the whole plan touches
    PERSISTED layout files only."""
    plan = (
        _probe(spark, emb, layouts)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "documents.parquet" not in plan
    assert "embeddings.parquet" not in plan
    pf = [
        l
        for l in plan.splitlines()
        if "PartitionFilters" in l and "cell" in l and "codes" in l
    ]
    assert pf, plan[:2000]
