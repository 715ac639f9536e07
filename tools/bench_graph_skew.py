"""Mirror-farm-hub skew measurement for the round-9 graph operators.

The adversarial shape: ONE template document near-duplicated by h
mirrors (a star hub of degree h in the pair graph) on top of a sparse
random background. The claims under test:

- triangle_stats: degree orientation bounds every node's out-degree,
  so the hub contributes wedges only from its (tiny) out-
  neighbourhood — time must stay ~flat as h quadruples. The A/B
  control is the NAIVE wedge join (src-grouped without orientation),
  whose intermediate grows as C(h, 2) ~ h^2 — measured here so the
  contrast is recorded, not argued.
- pagerank: the hub's in-contributions collapse in the map-side
  partial sum of the destination groupBy; time per iteration must
  scale with |E|, not with the hub's in-degree distribution.
- clustering_coefficients (round 13): rewritten on the oriented
  triangle join + corner explode — per-node counts at the oriented
  cost; time must stay ~flat as h quadruples (the r12 naive hinge
  form grew ~h^2).
- link_prediction (round 13): with max_degree set, the hub generates
  no wedges, so time tracks the background graph; the uncapped form
  is the C(h,2) control, run only at the smallest hub size.

Usage: python tools/bench_graph_skew.py [hub_sizes...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def hub_graph(spark, hub: int, background: int):
    """Star of degree ``hub`` at node 0 + ``background`` md5-random
    edges over 8*hub nodes — generated distributed, deterministic."""
    n_nodes = 8 * hub
    star = spark.range(1, hub + 1).select(
        F.lit(0).cast("long").alias("doc_id_a"),
        F.col("id").alias("doc_id_b"),
    )

    def h(col, salt):
        return F.abs(
            F.conv(F.substring(F.md5(F.concat_ws(":", col, F.lit(salt))), 1, 15),
                   16, 10).cast("long")
        )

    bg = (
        spark.range(background)
        .select(
            (h(F.col("id").cast("string"), "a") % n_nodes).alias("x"),
            (h(F.col("id").cast("string"), "b") % n_nodes).alias("y"),
        )
        .filter(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("doc_id_a"),
            F.greatest("x", "y").alias("doc_id_b"),
        )
        .distinct()
    )
    pairs = star.unionByName(bg).distinct()
    nodes = spark.range(n_nodes).select(F.col("id").alias("doc_id"))
    return pairs, nodes


def naive_triangles(pairs):
    """A/B control: id-ordered wedge join WITHOUT degree orientation —
    the hub's wedge set is C(h, 2)-sized."""
    can = pairs.select(F.col("doc_id_a").alias("a"), F.col("doc_id_b").alias("b"))
    e1 = can.select(F.col("a").alias("u"), F.col("b").alias("v"))
    e2 = can.select(F.col("a").alias("u"), F.col("b").alias("w"))
    wedges = e1.join(e2, "u").filter(F.col("v") < F.col("w"))
    closing = can.select(F.col("a").alias("v"), F.col("b").alias("w"))
    return wedges.join(closing, ["v", "w"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def main() -> None:
    from dev_dot_cvp_metadata_ingestion_spark.operators.graph import (
        clustering_coefficients,
        hub_cap_report,
        link_prediction,
        pagerank,
        triangle_stats,
    )
    from dev_dot_cvp_metadata_ingestion_spark.session import get_spark

    hubs = [int(s) for s in sys.argv[1:]] or [2_000, 8_000, 32_000]
    spark = get_spark("graph-skew", shuffle_partitions=32)
    results: dict[str, list[float]] = {
        "triangles_oriented": [],
        "triangles_naive": [],
        "pagerank_4it": [],
        "coefficients_oriented": [],
        "link_pred_capped": [],
    }
    cap = 64
    for i, hub in enumerate(hubs):
        pairs, nodes = hub_graph(spark, hub, background=4 * hub)
        pairs = pairs.localCheckpoint()
        nodes = nodes.localCheckpoint()
        m = pairs.count()

        t0 = time.time()
        tri = triangle_stats(pairs, nodes).collect()[0]
        dt_o = time.time() - t0
        results["triangles_oriented"].append(dt_o)

        t0 = time.time()
        ntri = naive_triangles(pairs).collect()[0]["n_triangles"]
        dt_n = time.time() - t0
        results["triangles_naive"].append(dt_n)
        assert ntri == tri["n_triangles"], (ntri, tri)

        t0 = time.time()
        pr = pagerank(pairs, nodes, iters=4)
        pr.agg(F.sum("pagerank_ppm")).collect()
        dt_p = time.time() - t0
        results["pagerank_4it"].append(dt_p)

        t0 = time.time()
        cc = clustering_coefficients(pairs, nodes)
        cc_sum = cc.agg(
            F.sum("triangles").alias("t"), F.sum("degree").alias("d")
        ).collect()[0]
        dt_c = time.time() - t0
        results["coefficients_oriented"].append(dt_c)
        # per-node counts sum to 3x the global triangle count
        assert cc_sum["t"] == 3 * tri["n_triangles"], (cc_sum, tri)

        t0 = time.time()
        lp = link_prediction(pairs, max_degree=cap)
        n_pred = lp.count()
        dt_l = time.time() - t0
        results["link_pred_capped"].append(dt_l)
        rep = hub_cap_report(pairs, max_degree=cap).collect()[0]

        # the C(h,2) control, priced only once at the smallest hub
        dt_lu = float("nan")
        if i == 0:
            t0 = time.time()
            link_prediction(pairs).count()
            dt_lu = time.time() - t0

        print(
            f"hub={hub:6d} |E|={m:7d} tri={tri['n_triangles']:6d} "
            f"oriented={dt_o:6.2f}s naive={dt_n:6.2f}s "
            f"pagerank={dt_p:6.2f}s coeffs={dt_c:6.2f}s "
            f"linkpred_cap={dt_l:6.2f}s (pred={n_pred}, "
            f"capped_hinges={rep['capped_hinges']}, "
            f"wedges_avoided={rep['wedges_avoided']}) "
            f"linkpred_uncapped={dt_lu:6.2f}s",
            flush=True,
        )
    for name, ts in results.items():
        factors = [round(b / a, 2) for a, b in zip(ts, ts[1:])]
        print(f"{name}: per-4x-hub growth factors = {factors}")
    spark.stop()


if __name__ == "__main__":
    main()
