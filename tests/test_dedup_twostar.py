"""Large-star/small-star connected components (VERDICT r7 item 8):
output parity with the pointer-jumping form on adversarial graph
shapes, O(log n) round behaviour on a chain (the shape that punishes
diameter-bound algorithms), and empty/singleton robustness.
"""

from __future__ import annotations

import pytest

from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
    connected_components,
    connected_components_twostar,
)


def _pairs_df(spark, edges):
    if not edges:
        return spark.createDataFrame([], "doc_id_a long, doc_id_b long")
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "doc_id_a long, doc_id_b long"
    )


def _nodes_df(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "doc_id long")


def _labels(df):
    return {(r["doc_id"], r["cluster_id"]) for r in df.collect()}


GRAPHS = {
    # chain: worst case for diameter-bound propagation
    "chain64": ([(i, i + 1) for i in range(63)], range(64)),
    # star already in fixpoint shape, plus singletons outside the graph
    "star+singletons": ([(0, i) for i in range(1, 9)], range(12)),
    # two components, edges given in arbitrary (b, a) order
    "two-components": (
        [(5, 3), (3, 9), (20, 22), (22, 21), (9, 5)],
        [3, 5, 9, 20, 21, 22, 40],
    ),
    # binary-tree-ish with cross edges and duplicate/reversed pairs
    "dag-ish": (
        [(1, 2), (2, 1), (2, 4), (4, 8), (8, 3), (3, 1), (10, 11)],
        range(1, 13),
    ),
    "empty": ([], [7, 8, 9]),
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_twostar_matches_pointer_jumping(spark, name):
    edges, ids = GRAPHS[name]
    pairs, nodes = _pairs_df(spark, edges), _nodes_df(spark, list(ids))
    got = _labels(connected_components_twostar(pairs, nodes))
    want = _labels(connected_components(pairs, nodes))
    assert got == want


def test_twostar_seeded_random_graph(spark):
    import random

    rng = random.Random(8)
    n = 200
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(150)
    ]
    pairs, nodes = _pairs_df(spark, edges), _nodes_df(spark, range(n))
    got = _labels(connected_components_twostar(pairs, nodes))
    want = _labels(connected_components(pairs, nodes))
    assert got == want


def test_twostar_chain_rounds_logarithmic(spark):
    """A 256-node chain converges in O(log n) alternating rounds —
    the measured claim from the SoCC'14 paper; a diameter-bound
    algorithm would need ~255 one-hop rounds (path halving cuts that
    to ~log2), and the fingerprint-equality detection costs exactly
    one extra confirming round."""
    n = 256
    edges = [(i, i + 1) for i in range(n - 1)]
    rounds = []
    out = connected_components_twostar(
        _pairs_df(spark, edges), _nodes_df(spark, range(n)), rounds_out=rounds
    )
    labels = _labels(out)
    assert labels == {(i, 0) for i in range(n)}
    assert rounds[0] <= 12, f"expected O(log 256) rounds, got {rounds[0]}"


def test_twostar_singleton_and_self_pairs(spark):
    # self-pairs must not create edges; absent nodes label themselves
    pairs = _pairs_df(spark, [(4, 4), (1, 2)])
    nodes = _nodes_df(spark, [1, 2, 4, 6])
    assert _labels(connected_components_twostar(pairs, nodes)) == {
        (1, 1),
        (2, 1),
        (4, 4),
        (6, 6),
    }


# r16 fast-tier split (VERDICT r15 item 3): this module is in the SLOW
# tier — long layout/stream/property sweeps excluded from the default
# `-m "not slow"` run (pytest.ini) so the driver's verify-window pytest
# completes; run the FULL suite with `pytest -m ""`.
import pytest as _pytest_r16

pytestmark = _pytest_r16.mark.slow
