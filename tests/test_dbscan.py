"""operators/graph.py:dbscan_labels — DBSCAN over a precomputed
eps-neighbor pair relation. Pins the density semantics on hand-built
graphs: role assignment, cluster labelling by core-component min id,
the rule that clusters connect through CORE points only (a shared
border never bridges two clusters), and noise at -1."""

from __future__ import annotations

from dev_dot_cvp_metadata_ingestion_spark.operators.graph import (
    dbscan_labels,
)


def _run(spark, pairs, node_ids, min_neighbors=3):
    p = spark.createDataFrame(pairs, ["vec_id_a", "vec_id_b"])
    n = spark.createDataFrame([(i,) for i in node_ids], ["vec_id"])
    rows = dbscan_labels(p, n, min_neighbors=min_neighbors).collect()
    return {r.vec_id: (r.role, r.cluster_id) for r in rows}


def test_roles_and_labels_on_one_blob(spark):
    # 1 is adjacent to 2,3,4 (core at min_neighbors=3); 2,3,4 have
    # degree 1 (borders of 1's cluster); 9 is isolated noise
    got = _run(spark, [(1, 2), (1, 3), (1, 4)], [1, 2, 3, 4, 9])
    assert got[1] == ("core", 1)
    for b in (2, 3, 4):
        assert got[b] == ("border", 1)
    assert got[9] == ("noise", -1)


def test_two_separate_blobs_get_distinct_clusters(spark):
    pairs = [(1, 2), (1, 3), (1, 4), (10, 11), (10, 12), (10, 13)]
    got = _run(spark, pairs, [1, 2, 3, 4, 10, 11, 12, 13])
    assert got[1] == ("core", 1)
    assert got[10] == ("core", 10)
    assert got[2][1] == 1 and got[11][1] == 10


def test_core_chain_merges_into_one_cluster(spark):
    # 1 and 5 both core; the 1-5 edge joins them into cluster min=1
    pairs = [(1, 2), (1, 3), (1, 5), (5, 6), (5, 7)]
    got = _run(spark, pairs, [1, 2, 3, 5, 6, 7])
    assert got[1] == ("core", 1)
    assert got[5] == ("core", 1)
    assert got[6] == ("border", 1) and got[2] == ("border", 1)


def test_shared_border_does_not_bridge_clusters(spark):
    # two cores 1 and 10, never adjacent; 99 borders BOTH — classic
    # DBSCAN: 99 joins the minimum-labelled cluster, the clusters
    # stay separate
    pairs = [
        (1, 2), (1, 3), (1, 99),
        (10, 11), (10, 12), (10, 99),
    ]
    got = _run(spark, pairs, [1, 2, 3, 10, 11, 12, 99])
    assert got[1] == ("core", 1)
    assert got[10] == ("core", 10)
    assert got[99] == ("border", 1)  # min over its core neighbors


def test_min_neighbors_threshold(spark):
    # degree-2 node is NOT core at min_neighbors=3, IS at 2
    pairs = [(1, 2), (1, 3)]
    got3 = _run(spark, pairs, [1, 2, 3], min_neighbors=3)
    assert got3[1][0] == "noise" and got3[2][0] == "noise"
    got2 = _run(spark, pairs, [1, 2, 3], min_neighbors=2)
    assert got2[1] == ("core", 1)
    assert got2[2] == ("border", 1) and got2[3] == ("border", 1)


def test_empty_pair_relation_all_noise(spark):
    p = spark.createDataFrame([], "vec_id_a long, vec_id_b long")
    n = spark.createDataFrame([(1,), (2,)], ["vec_id"])
    got = {
        r.vec_id: (r.role, r.cluster_id)
        for r in dbscan_labels(p, n).collect()
    }
    assert got == {1: ("noise", -1), 2: ("noise", -1)}


def test_duplicate_and_reversed_pairs_do_not_inflate_degree(spark):
    # review regression: [(1,2),(1,2),(1,3)] must not make 1 core at
    # min_neighbors=3, and mixed orientation must not double-count
    got = _run(
        spark, [(1, 2), (1, 2), (1, 3)], [1, 2, 3], min_neighbors=3
    )
    assert all(v == ("noise", -1) for v in got.values())
    got2 = _run(
        spark, [(1, 2), (2, 1), (1, 3)], [1, 2, 3], min_neighbors=3
    )
    assert all(v == ("noise", -1) for v in got2.values())
