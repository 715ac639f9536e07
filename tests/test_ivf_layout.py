"""Persisted IVF layout: the prebuilt probe must return EXACTLY the
in-query ivf_knn_join's rows (same quantizer params ⇒ same centroids ⇒
same candidates, cosines, tie-breaks), and the probe's corpus scan
must be partition-pruned to the probed cells — the index-build-once
trade made real at the file level."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dev_dot_cvp_metadata_ingestion_spark.operators.similarity import (
    ivf_knn_join,
    ivf_probe_join,
)
from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
    read_ivf_layout,
    write_ivf_layout,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def layout(spark, emb, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ivf") / "layout")
    write_ivf_layout(emb, p, n_cells=8, iters=2)
    return p


def _rows(df):
    return sorted(
        (r["q_id"], r["vec_id"], round(r["cos"], 9), r["rank"])
        for r in df.collect()
    )


def test_prebuilt_probe_equals_in_query_join(spark, emb, layout):
    queries = emb.filter(F.col("vec_id") % 7 == 0)
    cells, cents = read_ivf_layout(spark, layout)
    pre = ivf_probe_join(cells, cents, queries, k=3, nprobe=2)
    ref = ivf_knn_join(emb, queries, k=3, n_cells=8, nprobe=2)
    assert _rows(pre) == _rows(ref)


def test_layout_roundtrips_every_vector_once(spark, emb, layout):
    cells, cents = read_ivf_layout(spark, layout)
    assert cells.count() == emb.count()
    assert cells.select("vec_id").distinct().count() == emb.count()
    assert cents.count() == 8
    # every vector landed in a real cell
    assert cells.filter(~F.col("cluster").isin(list(range(8)))).count() == 0


def test_probe_scan_is_partition_pruned(spark, emb, layout):
    """The candidate join keys on the on-disk partition column, so the
    cells scan must carry a partition filter — dynamic partition
    pruning (the probe set is data-dependent), visible in the physical
    plan as a dynamicpruning expression on the scan."""
    queries = emb.filter(F.col("vec_id") % 13 == 0)
    cells, cents = read_ivf_layout(spark, layout)
    pre = ivf_probe_join(cells, cents, queries, k=3, nprobe=1)
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_empty_corpus_layout_roundtrips(spark, tmp_path):
    """An empty embeddings table must still produce a READABLE layout
    (zero-row partitionBy writes no footer; the writer falls back to a
    plain empty write, same contract as write_shuffled_shards)."""
    empty = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(0)
    p = str(tmp_path / "ivf")
    write_ivf_layout(empty, p, n_cells=4)
    cells, cents = read_ivf_layout(spark, p)
    assert cells.count() == 0
    assert "cluster" in cells.columns


def test_empty_and_nonempty_cells_schemas_match(spark, emb, tmp_path):
    """ADVICE r8: the empty fallback must write `cluster` with the
    same (partition-inferred int) type the partitionBy path yields, so
    the read-back schema is identical regardless of input size."""
    pe, pn = str(tmp_path / "e"), str(tmp_path / "n")
    write_ivf_layout(emb.limit(0), pe, n_cells=4)
    write_ivf_layout(emb, pn, n_cells=4)
    se = {
        f.name: f.dataType
        for f in read_ivf_layout(spark, pe)[0].schema.fields
    }
    sn = {
        f.name: f.dataType
        for f in read_ivf_layout(spark, pn)[0].schema.fields
    }
    assert se == sn
