"""Iterative graph analytics over candidate-pair relations.

``connected_components`` (operators/dedup.py) answers "which docs are
the same"; ``pagerank`` answers "which doc is the HUB" — stationary
importance over the near-duplicate graph, the centrality signal behind
canonical-document election and crawl-frontier weighting. Pure
DataFrame iteration: every round is bounded-size shuffles, no RDDs, no
driver-side data beyond the loop counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000
DAMP_PPM = 850_000          # 0.85 damping, fixed-point
BASE_PPM = PPM - DAMP_PPM   # (1 - d) teleport mass per node


def pagerank(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
    iters: int = 4,
) -> DataFrame:
    """Fixed-iteration PageRank over an UNDIRECTED pair relation, in
    exact ppm integers: r_{t+1}(v) = 150000 + (850000 * S_v) div 1e6
    with S_v = sum over neighbours u of r_t(u) div deg(u), r_0 = 1e6.
    Every quantity is a BIGINT and both division steps are integral,
    so the result is bit-identical across engines and partitionings
    (no float summation order anywhere). Unnormalized form: isolated
    nodes settle at 150000 ppm, hubs rise above 1e6.

    Scale shape: the edge relation (symmetrized, degree-annotated) is
    materialized ONCE via localCheckpoint; each round is one shuffle
    join of the node-sized rank relation with the edges, one groupBy
    on the destination (map-side combine absorbs high-in-degree
    hubs' partial sums), and one left join back onto the node set.
    State per round is node-sized; lineage is truncated per round so
    round k never replans rounds 1..k-1. Nothing corpus-sized is ever
    broadcast or windowed. Overflow headroom: the contribution sum at
    a node is < total mass ~ n * 1e6, and 850000 * S must fit int64 —
    safe through ~1e7-in-degree hubs at ppm scale; beyond that lift
    S to DECIMAL(38,0) (one cast).

    Fixed ``iters`` (default 4) rather than convergence detection:
    near-dup components are shallow, and a deterministic round count
    is what lets the DuckDB oracle restate the recurrence by unrolled
    CTEs. Returns (id_col, pagerank_ppm, degree), one row per node,
    UNORDERED (per-row output contract).
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ew = edges.join(deg, "src").localCheckpoint()

    base = nodes.select(F.col(id_col).alias("node")).localCheckpoint()
    ranks = base.select("node", F.lit(PPM).cast("long").alias("pr"))

    for _ in range(iters):
        contrib = (
            ew.join(ranks, ew.src == ranks.node)
            .select(F.col("dst").alias("node"), F.expr("pr div deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            base.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(BASE_PPM)
                    + F.expr(
                        f"({DAMP_PPM}L * coalesce(c, 0L)) div {PPM}L"
                    )
                ).cast("long").alias("pr"),
            )
            .localCheckpoint()
        )

    node_deg = base.join(
        deg.select(F.col("src").alias("node"), "deg"), "node", "left"
    ).select("node", F.coalesce("deg", F.lit(0)).cast("long").alias("degree"))
    return ranks.join(node_deg, "node").select(
        F.col("node").alias(id_col),
        F.col("pr").alias("pagerank_ppm"),
        "degree",
    )
