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


def test_kcore_planted_structures(spark):
    """2-core of a star is empty (leaves peel, then the center);
    a 4-clique survives with degree 3; a chain peels completely."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.graph import kcore

    pairs = [
        # star center 0, leaves 1-4
        (0, 1), (0, 2), (0, 3), (0, 4),
        # 4-clique on 10-13
        (10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13),
        # chain 20-21-22
        (20, 21), (21, 22),
    ]
    nodes = [(i,) for i in [0, 1, 2, 3, 4, 10, 11, 12, 13, 20, 21, 22, 99]]
    p = spark.createDataFrame(pairs, "doc_id_a long, doc_id_b long")
    n = spark.createDataFrame(nodes, "doc_id long")
    got = {
        r.doc_id: (r.in_core, r.core_degree)
        for r in kcore(p, n, k=2, rounds=4).collect()
    }
    assert len(got) == len(nodes)  # every node reported
    for clique_node in (10, 11, 12, 13):
        assert got[clique_node] == (1, 3)
    for peeled in (0, 1, 2, 3, 4, 20, 21, 22, 99):
        assert got[peeled] == (0, 0)


def test_kcore_k3_keeps_only_clique(spark):
    from dev_dot_cvp_metadata_ingestion_spark.operators.graph import kcore

    pairs = [
        (10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13),
        # a triangle (2-core but not 3-core)
        (1, 2), (2, 3), (1, 3),
    ]
    nodes = [(i,) for i in [1, 2, 3, 10, 11, 12, 13]]
    p = spark.createDataFrame(pairs, "doc_id_a long, doc_id_b long")
    n = spark.createDataFrame(nodes, "doc_id long")
    got = {
        r.doc_id: (r.in_core, r.core_degree)
        for r in kcore(p, n, k=3, rounds=4).collect()
    }
    assert all(got[i] == (1, 3) for i in (10, 11, 12, 13))
    assert all(got[i] == (0, 0) for i in (1, 2, 3))


def test_markov_stationary_matches_replica_and_converges(spark):
    """The floor-ppm power iteration must match a plain-Python integer
    replica exactly, and on a strongly-connected 2-state chain it must
    approach the analytic stationary distribution."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.graph import (
        markov_stationary,
    )

    # chain: a->b 3, a->a 1, b->a 2, b->b 2, plus an absorbing sink c
    # (a->c 0 edges out of c): transitions INTO c drop mass
    trans = spark.createDataFrame(
        [
            ("a", "b", 3),
            ("a", "a", 1),
            ("b", "a", 2),
            ("b", "b", 2),
            ("a", "c", 1),
        ],
        "from_type string, to_type string, c long",
    )
    got = {
        r.event_type: r.pi_ppm
        for r in markov_stationary(trans, rounds=10).collect()
    }
    # replica
    edges = {("a", "b"): 3, ("a", "a"): 1, ("b", "a"): 2, ("b", "b"): 2,
             ("a", "c"): 1}
    rt = {}
    for (a, _b), c in edges.items():
        rt[a] = rt.get(a, 0) + c
    p = {k: (c * 10**6) // rt[k[0]] for k, c in edges.items()}
    s = sorted(rt)
    pi = {t: 10**6 // len(s) for t in s}
    for _ in range(10):
        nxt = {t: 0 for t in s}
        acc = {}
        for (a, b), pp in p.items():
            acc[b] = acc.get(b, 0) + pi[a] * pp
        for t in s:
            nxt[t] = acc.get(t, 0) // 10**6
        pi = nxt
    assert got == pi, (got, pi)
    assert "c" not in got  # absorbing sink is outside the state set
    # strongly-connected control converges near the analytic answer:
    # p(a->b)=0.75, p(b->a)=0.5 -> pi = (0.4, 0.6)
    t2 = spark.createDataFrame(
        [("a", "b", 3), ("a", "a", 1), ("b", "a", 2), ("b", "b", 2)],
        "from_type string, to_type string, c long",
    )
    got2 = {
        r.event_type: r.pi_ppm
        for r in markov_stationary(t2, rounds=10).collect()
    }
    assert abs(got2["a"] - 400_000) < 5_000
    assert abs(got2["b"] - 600_000) < 5_000
