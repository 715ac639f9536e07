"""triangle_stats: closed-form fixtures (K4, star, path), brute-force
replica parity on random graphs, and empty-graph totals."""

from __future__ import annotations

from itertools import combinations

from dev_dot_cvp_metadata_ingestion_spark.operators.graph import (
    triangle_stats,
)
from dev_dot_cvp_metadata_ingestion_spark.plans import registry

registry.load_all()


def _replica(pairs, n_nodes):
    es = {tuple(sorted(p)) for p in pairs}
    adj: dict = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    tris = sum(
        1
        for trio in combinations(sorted(adj), 3)
        if all(tuple(sorted(e)) in es for e in combinations(trio, 2))
    )
    clustering = (3_000_000 * tris) // wedges if wedges else 0
    return (n_nodes, len(es), wedges, tris, clustering)


def _run(spark, pairs, nodes):
    pdf = spark.createDataFrame(
        pairs or [(None, None)], "doc_id_a long, doc_id_b long"
    )
    if not pairs:
        pdf = pdf.filter("doc_id_a IS NOT NULL")
    ndf = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    return tuple(triangle_stats(pdf, ndf).collect()[0])


def test_k4_fully_clustered(spark):
    pairs = list(combinations(range(4), 2))
    got = _run(spark, pairs, list(range(5)))  # one isolated extra
    assert got == (5, 6, 12, 4, 1_000_000)


def test_star_has_wedges_no_triangles(spark):
    pairs = [(0, i) for i in range(1, 6)]
    got = _run(spark, pairs, list(range(6)))
    assert got == (6, 5, 10, 0, 0)


def test_path_graph(spark):
    pairs = [(0, 1), (1, 2), (2, 3)]
    got = _run(spark, pairs, list(range(4)))
    assert got == (4, 3, 2, 0, 0)


def test_random_graph_matches_bruteforce(spark):
    import random

    rng = random.Random(13)
    nodes = list(range(40))
    pairs = sorted(
        {tuple(sorted(rng.sample(nodes, 2))) for _ in range(160)}
    )
    assert _run(spark, pairs, nodes) == _replica(pairs, len(nodes))


def test_empty_graph(spark):
    assert _run(spark, [], [1, 2, 3]) == (3, 0, 0, 0, 0)


def test_registered_single_row(spark):
    rows = registry.QUERIES["dedup_graph_triangles"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_nodes"] == 500
    assert 0 <= r["clustering_ppm"] <= 1_000_000
