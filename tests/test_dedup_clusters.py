"""Connected-components clustering over candidate pairs: known graphs,
fixpoint convergence, and singleton handling."""

from __future__ import annotations

import pytest


def test_connected_components_known_graph(spark):
    from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
        connected_components,
    )

    # chain 1-2-3-4 (diameter > 1 forces multiple rounds), triangle
    # 10-11-12, pair 20-21, singletons 30, 31
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_id_a long, doc_id_b long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 12, 20, 21, 30, 31]],
        "doc_id long",
    )
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(pairs, nodes).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
        30: 30, 31: 31,
    }


def test_connected_components_long_chain_converges(spark):
    from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
        connected_components,
    )

    # a 40-node path: pointer jumping must converge well inside the
    # round budget (O(log D), not O(D))
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_id_a long, doc_id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(41)], "doc_id long")
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(pairs, nodes, max_iters=12).collect()
    }
    assert set(got.values()) == {0} and len(got) == 41


def test_connected_components_raises_without_fixpoint(spark):
    from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "doc_id_a long, doc_id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(301)], "doc_id long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(pairs, nodes, max_iters=2)
