"""A/B the r16 graph-family optimizations (VERDICT item 4): degree
relation checkpointed once + pinned shuffle-hash joins, old (git HEAD)
vs new (working tree) implementations, interleaved in one session.

Usage: git show HEAD:dev_dot_cvp_metadata_ingestion_spark/operators/graph.py > /tmp/graph_old.py
       SPARK_GRAFT_CPUS=32 python tools/ab_graph.py
"""

from __future__ import annotations

import importlib.util
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"
QUERIES = [
    "dedup_link_prediction",
    "dedup_link_prediction_capped",
    "dedup_link_prediction_ra",
    "dedup_pagerank_centrality",
    "dedup_graph_kcore",
    "dedup_graph_triangles",
    "dedup_clustering_coefficients",
]
FUNCS = [
    "link_prediction",
    "link_prediction_ra",
    "pagerank",
    "kcore",
    "triangle_stats",
    "clustering_coefficients",
    "hub_cap_report",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from dev_dot_cvp_metadata_ingestion_spark.operators import graph as gnew
    from dev_dot_cvp_metadata_ingestion_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "graph_old", "/tmp/graph_old.py"
    )
    gold = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gold)

    new_impl = {f: getattr(gnew, f) for f in FUNCS}
    old_impl = {f: getattr(gold, f) for f in FUNCS}

    qs = entrymod.queries()
    spark = get_spark("ab-graph")
    cores = spark.sparkContext.defaultParallelism

    for q in QUERIES:
        qs[q](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    best: dict[tuple[str, str], float] = {}
    for _round in range(3):
        for mode, impl in [("old", old_impl), ("new", new_impl)]:
            for f, fn in impl.items():
                setattr(gnew, f, fn)
            for q in QUERIES:
                t0 = time.perf_counter()
                qs[q](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                key = (q, mode)
                best[key] = min(best.get(key, dt), dt)
    for f, fn in new_impl.items():
        setattr(gnew, f, fn)
    for q in QUERIES:
        o = best[(q, "old")]
        n = best[(q, "new")]
        print(
            f"cores={cores} {q:35s} old={o:.2f}s new={n:.2f}s "
            f"({o / n:.2f}x)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
