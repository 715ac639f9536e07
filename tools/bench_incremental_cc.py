"""Incremental connected-components maintenance measurement (VERDICT
r13 item 5).

The claim under test: folding an ingest batch into the maintained
``labels/`` table (``append_pair_graph``'s contracted-graph merge)
costs ~flat time as the CORPUS doubles — it scales with the batch's
cluster footprint — while the full-CC recompute the monitoring query
previously re-ran grows with the corpus.

The layout is assembled directly (pairs/nodes/meta parquet dirs in the
documented shape) so corpus size is a generator parameter instead of
an LSH build: clusters of 5 chained by 4 edges each, plus a fixed-size
batch of new nodes each linking to one existing cluster.

Partition sizing is the lever the claim rides on: ``n_parts`` must
scale with the corpus (fixed rows-per-partition, like any hive
layout), keeping the batch below the partition count — then the merge
rewrites ~batch partitions of fixed size, so maintenance cost is
O(batch), corpus-free. The bench sizes n_parts = corpus/rows_per_part.

Usage: python tools/bench_incremental_cc.py [corpus [batch [rows_per_part]]]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def make_layout(spark, path: str, n_nodes: int) -> None:
    """Chained clusters of 64 (diameter 63 — realistic near-dup
    clusters are shallow, but monitoring corpora accumulate long
    mirror chains; depth is what full CC re-pays per run, ~log2(D)
    corpus-scale join shuffles), documented layout dirs."""
    nodes = spark.range(n_nodes).select(F.col("id").alias("doc_id"))
    pairs = (
        spark.range(n_nodes)
        .filter(F.col("id") % 64 != 63)
        .select(
            F.col("id").alias("doc_id_a"),
            (F.col("id") + 1).alias("doc_id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    pairs.write.mode("overwrite").parquet(f"{path}/pairs")
    nodes.write.mode("overwrite").parquet(f"{path}/nodes")
    spark.createDataFrame(
        [(8, 3, 0.3)], "num_hashes int, n int, threshold double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def batch_relations(spark, n_nodes: int, batch: int):
    """``batch`` new nodes (ids above the corpus), each pairing with
    one existing doc spread across clusters."""
    new_nodes = spark.range(batch).select(
        (F.col("id") + 10_000_000_000).alias("doc_id")
    )
    new_pairs = spark.range(batch).select(
        ((F.col("id") * 5) % n_nodes).alias("doc_id_a"),
        (F.col("id") + 10_000_000_000).alias("doc_id_b"),
        F.lit(1.0).alias("jaccard"),
    )
    return new_nodes, new_pairs


def main() -> None:
    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    rows_per_part = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000

    import shutil
    import tempfile

    from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
        connected_components,
    )
    from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
        append_pair_graph,
        read_cluster_labels,
        read_pair_graph,
        write_cluster_labels,
    )
    from dev_dot_cvp_metadata_ingestion_spark.session import get_spark

    spark = get_spark("bench-incremental-cc")

    # warm the JVM + Python workers on a throwaway tiny layout so the
    # first measured size doesn't carry compilation/classloading costs
    warm = tempfile.mkdtemp(prefix="bench_cc_warm_")
    try:
        make_layout(spark, warm, 10_000)
        write_cluster_labels(spark, warm, n_parts=8)
        wn, wp = batch_relations(spark, 10_000, 50)
        append_pair_graph(spark, warm, wn, wp)
        read_cluster_labels(spark, warm).count()
    finally:
        shutil.rmtree(warm, ignore_errors=True)

    out: dict = {"batch_nodes": n_batch, "rows_per_part": rows_per_part,
                 "sizes": {}}
    for n in (n_corpus // 2, n_corpus):
        tmp = tempfile.mkdtemp(prefix="bench_cc_")
        try:
            make_layout(spark, tmp, n)
            write_cluster_labels(
                spark, tmp, n_parts=max(32, n // rows_per_part)
            )
            new_nodes, new_pairs = batch_relations(spark, n, n_batch)
            new_nodes = new_nodes.localCheckpoint()
            new_pairs = new_pairs.localCheckpoint()

            t0 = time.perf_counter()
            append_pair_graph(spark, tmp, new_nodes, new_pairs)
            incr_sec = round(time.perf_counter() - t0, 3)

            # the monitoring query's old cost: full CC over the grown graph
            pairs, nodes, _ = read_pair_graph(spark, tmp)
            t0 = time.perf_counter()
            n_labels = connected_components(pairs, nodes).count()
            full_sec = round(time.perf_counter() - t0, 3)

            maintained = read_cluster_labels(spark, tmp).count()
            assert maintained == n_labels == n + n_batch, (
                maintained, n_labels, n + n_batch,
            )
            out["sizes"][str(n)] = {
                "corpus_nodes": n,
                "incremental_append_sec": incr_sec,
                "full_cc_sec": full_sec,
            }
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    small, big = (out["sizes"][k] for k in sorted(out["sizes"], key=int))
    out["incremental_scale"] = round(
        big["incremental_append_sec"]
        / max(small["incremental_append_sec"], 1e-9), 2,
    )
    out["full_cc_scale"] = round(
        big["full_cc_sec"] / max(small["full_cc_sec"], 1e-9), 2
    )
    out["incremental_speedup_at_full"] = round(
        big["full_cc_sec"] / max(big["incremental_append_sec"], 1e-9), 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
