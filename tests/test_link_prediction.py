"""operators/graph.py:link_prediction — common-neighbor prediction of
missing edges. Pins the semantic core on hand-built graphs: a broken
triangle predicts its missing edge, adjacency is rejected, 2-hop-only
evidence counts, and the Jaccard is the exact integer ratio."""

from __future__ import annotations

from dev_dot_cvp_metadata_ingestion_spark.operators.graph import (
    link_prediction,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id_a", "doc_id_b"])


def test_broken_triangle_predicts_missing_edge(spark):
    got = link_prediction(_pairs(spark, [(1, 2), (2, 3)])).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.doc_id_a, r.doc_id_b) == (1, 3)
    assert r.common_neighbors == 1
    assert (r.deg_a, r.deg_b) == (1, 1)
    assert r.neighbor_jaccard == 1.0


def test_existing_edges_never_predicted(spark):
    # full triangle: every pair adjacent, nothing to predict
    assert (
        link_prediction(_pairs(spark, [(1, 2), (2, 3), (1, 3)])).count() == 0
    )


def test_path_ends_without_common_neighbor_not_predicted(spark):
    # 1-2-3-4: (1,3) and (2,4) share a neighbor; (1,4) does not
    got = link_prediction(_pairs(spark, [(1, 2), (2, 3), (3, 4)])).collect()
    assert {(r.doc_id_a, r.doc_id_b) for r in got} == {(1, 3), (2, 4)}


def test_jaccard_counts_full_neighbor_union(spark):
    # star around 2 plus a pendant on 1:
    # N(1) = {2, 9}, N(3) = {2}; cn=1, union = 2 -> 0.5
    got = {
        (r.doc_id_a, r.doc_id_b): r
        for r in link_prediction(
            _pairs(spark, [(1, 2), (2, 3), (1, 9)])
        ).collect()
    }
    r = got[(1, 3)]
    assert r.common_neighbors == 1
    assert (r.deg_a, r.deg_b) == (2, 1)
    assert r.neighbor_jaccard == 0.5


def test_multiple_common_neighbors_accumulate(spark):
    # 1 and 2 both connected to 3 and 4 (no 1-2 edge): cn=2,
    # deg both 2, jaccard = 2/(2+2-2) = 1.0
    got = link_prediction(
        _pairs(spark, [(1, 3), (1, 4), (2, 3), (2, 4)])
    ).collect()
    by_pair = {(r.doc_id_a, r.doc_id_b): r for r in got}
    r = by_pair[(1, 2)]
    assert r.common_neighbors == 2 and r.neighbor_jaccard == 1.0
    # (3,4) is symmetric through 1 and 2
    r = by_pair[(3, 4)]
    assert r.common_neighbors == 2 and r.neighbor_jaccard == 1.0
    assert set(by_pair) == {(1, 2), (3, 4)}


def test_empty_graph(spark):
    empty = spark.createDataFrame(
        [], "doc_id_a long, doc_id_b long"
    )
    assert link_prediction(empty).count() == 0


def test_clustering_coefficients_on_known_graphs(spark):
    from dev_dot_cvp_metadata_ingestion_spark.operators.graph import (
        clustering_coefficients,
    )

    def run(pair_rows, node_ids):
        p = spark.createDataFrame(pair_rows, ["doc_id_a", "doc_id_b"])
        n = spark.createDataFrame([(i,) for i in node_ids], ["doc_id"])
        return {
            r.doc_id: (r.degree, r.triangles, r.clustering_ppm)
            for r in clustering_coefficients(p, n).collect()
        }

    # triangle: every node deg 2, 1 triangle, coefficient 1.0
    got = run([(1, 2), (2, 3), (1, 3)], [1, 2, 3])
    assert got == {i: (2, 1, 1000000) for i in (1, 2, 3)}

    # star: hub deg 3, no closed wedge -> 0; spokes deg 1 -> 0
    got = run([(1, 2), (1, 3), (1, 4)], [1, 2, 3, 4, 9])
    assert got[1] == (3, 0, 0)
    assert got[2] == (1, 0, 0)
    assert got[9] == (0, 0, 0)  # isolated

    # square + one diagonal: nodes on the diagonal close 2 wedges of 3
    got = run([(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)], [1, 2, 3, 4])
    # deg(1)=3, triangles(1)=2 -> 2*2e6/(3*2) = 666666
    assert got[1] == (3, 2, 666666)
    assert got[2] == (2, 1, 1000000)


def test_clustering_coefficients_orientation_and_duplicates(spark):
    # review regression: a triangle supplied with one edge reversed
    # (and once duplicated) must still count its triangles
    from dev_dot_cvp_metadata_ingestion_spark.operators.graph import (
        clustering_coefficients,
    )

    p = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (2, 3)], ["doc_id_a", "doc_id_b"]
    )
    n = spark.createDataFrame([(i,) for i in (1, 2, 3)], ["doc_id"])
    got = {
        r.doc_id: (r.degree, r.triangles, r.clustering_ppm)
        for r in clustering_coefficients(p, n).collect()
    }
    assert got == {i: (2, 1, 1000000) for i in (1, 2, 3)}


def test_link_prediction_max_degree_caps_hub_hinges_only(spark):
    # hub 0 connected to 1..5 (deg 5) + pendant 6-1. Uncapped: every
    # spoke pair is predicted through the hub; capped at 4 the hub
    # generates NO wedges, so only node 1's wedge (0, 6) survives —
    # and its deg_a still reports the TRUE hub degree 5.
    rows = [(0, i) for i in (1, 2, 3, 4, 5)] + [(6, 1)]
    uncapped = link_prediction(_pairs(spark, rows)).collect()
    assert {(r.doc_id_a, r.doc_id_b) for r in uncapped} == {
        (i, j) for i in (1, 2, 3, 4, 5) for j in (1, 2, 3, 4, 5) if i < j
    } | {(0, 6)}
    capped = link_prediction(_pairs(spark, rows), max_degree=4).collect()
    assert {(r.doc_id_a, r.doc_id_b) for r in capped} == {(0, 6)}
    r = capped[0]
    assert (r.deg_a, r.deg_b) == (5, 1)  # true degrees, not capped ones
    assert r.common_neighbors == 1


def test_link_prediction_cap_above_max_degree_is_identity(spark):
    rows = [(1, 2), (2, 3), (1, 9), (3, 4)]
    want = sorted(
        map(tuple, link_prediction(_pairs(spark, rows)).collect())
    )
    got = sorted(
        map(tuple, link_prediction(_pairs(spark, rows), max_degree=10).collect())
    )
    assert got == want


def test_link_prediction_ignores_self_loops_and_dup_orientations(spark):
    """Review regression (r13): a self-loop or a reversed duplicate
    must not inflate degrees — which would corrupt the jaccard
    denominator AND flip the max_degree cap decision while
    hub_cap_report (which canonicalizes) reports nothing dropped."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.graph import (
        link_prediction_ra,
    )

    dirty = [(1, 1), (1, 2), (2, 1), (2, 3), (2, 3)]
    clean = [(1, 2), (2, 3)]
    want = sorted(map(tuple, link_prediction(_pairs(spark, clean)).collect()))
    got = sorted(map(tuple, link_prediction(_pairs(spark, dirty)).collect()))
    assert got == want and got
    # with the self-loop counted, deg(1) would be 2 and max_degree=1
    # would wrongly cap hinge... assert the cap decision matches the
    # clean graph at every cap value
    for cap in (1, 2):
        want_c = sorted(
            map(
                tuple,
                link_prediction(_pairs(spark, clean), max_degree=cap).collect(),
            )
        )
        got_c = sorted(
            map(
                tuple,
                link_prediction(_pairs(spark, dirty), max_degree=cap).collect(),
            )
        )
        assert got_c == want_c
    # same hygiene for the RA form
    want_ra = sorted(
        map(tuple, link_prediction_ra(_pairs(spark, clean)).collect())
    )
    got_ra = sorted(
        map(tuple, link_prediction_ra(_pairs(spark, dirty)).collect())
    )
    assert got_ra == want_ra and got_ra


def test_hub_cap_report_accounting(spark):
    from dev_dot_cvp_metadata_ingestion_spark.operators.graph import (
        hub_cap_report,
    )

    # hub 0 deg 5, node 1 deg 2, others deg 1 — cap 4 catches only the
    # hub; wedges_avoided = C(5,2) = 10. Duplicate + reversed rows
    # must not inflate degrees.
    rows = [(0, i) for i in (1, 2, 3, 4, 5)] + [(6, 1), (1, 0), (0, 1)]
    r = hub_cap_report(_pairs(spark, rows), max_degree=4).collect()[0]
    assert (r.n_nodes, r.n_edges) == (7, 6)
    assert (r.capped_hinges, r.wedges_avoided) == (1, 10)
    # cap above every degree: nothing capped
    r = hub_cap_report(_pairs(spark, rows), max_degree=5).collect()[0]
    assert (r.capped_hinges, r.wedges_avoided) == (0, 0)


def test_clustering_coefficients_match_naive_on_random_graph(spark):
    # the oriented triangle-corner rewrite must agree with a plain
    # Python per-node triangle count on a seeded random graph
    import itertools
    import random

    from dev_dot_cvp_metadata_ingestion_spark.operators.graph import (
        clustering_coefficients,
    )

    rng = random.Random(13)
    n = 60
    edges = sorted(
        {
            (a, b)
            for a, b in (
                tuple(sorted(rng.sample(range(n), 2))) for _ in range(260)
            )
        }
    )
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for v in range(n):
        d = len(adj[v])
        t = sum(
            1
            for x, y in itertools.combinations(sorted(adj[v]), 2)
            if y in adj[x]
        )
        ppm = (2_000_000 * t) // (d * (d - 1)) if d >= 2 else 0
        want[v] = (d, t, ppm)
    p = spark.createDataFrame(edges, ["doc_id_a", "doc_id_b"])
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    got = {
        r.doc_id: (r.degree, r.triangles, r.clustering_ppm)
        for r in clustering_coefficients(p, nodes).collect()
    }
    assert got == want
