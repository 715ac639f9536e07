"""pagerank: hand-verifiable fixtures against an exact integer
replica, hub-over-leaf ordering, isolated-node fixpoint, and
partition-count invariance (bit-exact integer arithmetic)."""

from __future__ import annotations

import pytest

from dev_dot_cvp_metadata_ingestion_spark.operators.graph import (
    BASE_PPM,
    DAMP_PPM,
    PPM,
    pagerank,
)
from dev_dot_cvp_metadata_ingestion_spark.plans import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def _replica(pairs, nodes, iters=4):
    """Plain-Python restatement of the ppm recurrence."""
    adj: dict = {n: set() for n in nodes}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    deg = {n: len(v) for n, v in adj.items()}
    pr = {n: PPM for n in nodes}
    for _ in range(iters):
        contrib = {n: 0 for n in nodes}
        for u in nodes:
            if deg[u]:
                share = pr[u] // deg[u]
                for v in adj[u]:
                    contrib[v] += share
        pr = {n: BASE_PPM + (DAMP_PPM * contrib[n]) // PPM for n in nodes}
    return {n: (pr[n], deg[n]) for n in nodes}


def _run(spark, pairs, nodes, iters=4, parts=None):
    pdf = spark.createDataFrame(
        pairs or [(None, None)], "doc_id_a long, doc_id_b long"
    )
    if not pairs:
        pdf = pdf.filter("doc_id_a IS NOT NULL")
    ndf = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    if parts:
        pdf, ndf = pdf.repartition(parts), ndf.repartition(parts)
    out = pagerank(pdf, ndf, iters=iters)
    return {r["doc_id"]: (r["pagerank_ppm"], r["degree"]) for r in out.collect()}


def test_path_graph_matches_replica(spark):
    pairs = [(1, 2), (2, 3)]
    nodes = [1, 2, 3, 9]  # 9 isolated
    got = _run(spark, pairs, nodes)
    assert got == _replica(pairs, nodes)
    # isolated node sits at the teleport floor with zero degree
    assert got[9] == (BASE_PPM, 0)
    # the middle of the path out-ranks the endpoints
    assert got[2][0] > got[1][0] == got[3][0]


def test_star_hub_outranks_leaves(spark):
    pairs = [(0, i) for i in range(1, 8)]
    nodes = list(range(8))
    got = _run(spark, pairs, nodes)
    assert got == _replica(pairs, nodes)
    hub = got[0][0]
    for leaf in range(1, 8):
        assert hub > got[leaf][0]
    assert got[0][1] == 7


def test_partition_count_invariance(spark):
    import random

    rng = random.Random(7)
    nodes = list(range(60))
    pairs = sorted(
        {
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(120)
        }
    )
    ref = _replica(pairs, nodes)
    for parts in (1, 7):
        assert _run(spark, pairs, nodes, parts=parts) == ref


def test_empty_graph_all_nodes_at_floor(spark):
    got = _run(spark, [], [1, 2])
    assert got == {1: (BASE_PPM, 0), 2: (BASE_PPM, 0)}


def test_registered_query_unordered_and_total(spark):
    out = registry.QUERIES["dedup_pagerank_centrality"](spark, SF)
    rows = out.collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == n_docs
    assert all(r["pagerank_ppm"] >= BASE_PPM for r in rows)
