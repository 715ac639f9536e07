"""Persisted pair-graph layout: graph analytics replayed from the
layout must equal the in-query forms row-for-row, and the probe plans
must never re-read document text."""

from __future__ import annotations

import pytest

from dev_dot_cvp_metadata_ingestion_spark.operators.graph import (
    pagerank,
    triangle_stats,
)
from dev_dot_cvp_metadata_ingestion_spark.plans import registry
from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
    read_pair_graph,
    write_pair_graph,
)

registry.load_all()

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def layout(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pair_graph"))
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    write_pair_graph(docs, d)
    return d


def test_pagerank_from_layout_equals_in_query(spark, layout):
    pairs, nodes, params = read_pair_graph(spark, layout)
    assert params == {"num_hashes": 8, "n": 3, "threshold": 0.3}
    got = sorted(tuple(r) for r in pagerank(pairs, nodes).collect())
    ref = sorted(
        tuple(r)
        for r in registry.QUERIES["dedup_pagerank_centrality"](
            spark, SF
        ).collect()
    )
    assert got == ref


def test_triangles_from_layout_equals_in_query(spark, layout):
    pairs, nodes, _ = read_pair_graph(spark, layout)
    got = triangle_stats(pairs, nodes).collect()
    ref = registry.QUERIES["dedup_graph_triangles"](spark, SF).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in ref]


def test_probe_never_reads_document_text(spark, layout):
    pairs, nodes, _ = read_pair_graph(spark, layout)
    for df in (pagerank(pairs, nodes), triangle_stats(pairs, nodes)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "documents.parquet" not in plan
        assert "text" not in plan.lower().replace("context", "")


def test_empty_corpus_layout_roundtrips(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(0)
    write_pair_graph(docs, str(tmp_path / "g"))
    pairs, nodes, _ = read_pair_graph(spark, str(tmp_path / "g"))
    assert pairs.count() == 0 and nodes.count() == 0
    assert pagerank(pairs, nodes).count() == 0
    assert tuple(triangle_stats(pairs, nodes).collect()[0]) == (
        0, 0, 0, 0, 0,
    )
