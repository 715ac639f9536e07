"""Amortization measurement for the persisted pair-graph layout:
in-query graph analytics (each query re-derives LSH pairs from text)
vs build-once + replay (pairs computed once, pagerank AND triangles
replayed from the compact pairs table).

Usage: python tools/bench_pair_graph.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from dev_dot_cvp_metadata_ingestion_spark.operators.graph import (
        pagerank,
        triangle_stats,
    )
    from dev_dot_cvp_metadata_ingestion_spark.plans import registry
    from dev_dot_cvp_metadata_ingestion_spark.session import get_spark
    from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
        read_pair_graph,
        write_pair_graph,
    )

    registry.load_all()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("pair-graph-bench", shuffle_partitions=32)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # in-query forms: each re-derives the pair relation from text
    t0 = time.time()
    registry.QUERIES["dedup_pagerank_centrality"](spark, sf_dir).count()
    t_pr = time.time() - t0
    t0 = time.time()
    registry.QUERIES["dedup_graph_triangles"](spark, sf_dir).count()
    t_tri = time.time() - t0

    with tempfile.TemporaryDirectory() as d:
        t0 = time.time()
        write_pair_graph(docs, d)
        t_build = time.time() - t0
        pairs, nodes, _ = read_pair_graph(spark, d)
        t0 = time.time()
        pagerank(pairs, nodes).count()
        t_pr2 = time.time() - t0
        t0 = time.time()
        triangle_stats(pairs, nodes).count()
        t_tri2 = time.time() - t0

    print(
        f"in-query: pagerank={t_pr:.2f}s triangles={t_tri:.2f}s "
        f"total={t_pr + t_tri:.2f}s"
    )
    print(
        f"layout:   build={t_build:.2f}s pagerank={t_pr2:.2f}s "
        f"triangles={t_tri2:.2f}s replay_total={t_pr2 + t_tri2:.2f}s"
    )
    print(
        f"per-analytics-pass speedup: "
        f"{(t_pr + t_tri) / max(t_pr2 + t_tri2, 1e-9):.1f}x "
        f"(build amortized over every future pass)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
