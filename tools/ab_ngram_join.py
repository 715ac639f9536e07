"""A/B the ngram posting self-join strategy (r15 VERDICT item 1).

Times ngram_jaccard_pairs variants — posting self-join pinned to
shuffle_merge (r15 shipped), shuffle_hash, or unhinted — on BOTH the
realistic Zipf corpus (where the driver measured the r15 regression)
and the sf0.1 documents table (where the r15 pin won), at the session's
core count. min-of-2 consecutive noop-sink runs, same as bench.py.

Usage: SPARK_GRAFT_CPUS=32 python tools/ab_ngram_join.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from dev_dot_cvp_metadata_ingestion_spark.functions.relations import (
    rebalance_narrow_scan,
)
from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import shingles
from dev_dot_cvp_metadata_ingestion_spark.session import get_spark
from tools.bench_realistic_text import zipf_corpus


def pairs_variant(docs, strategy: str, rebalance: bool = True):
    src = rebalance_narrow_scan(docs) if rebalance else docs
    sh = src.select(
        F.col("source").alias("block"),
        F.col("doc_id"),
        shingles(F.col("text"), 2).alias("sh"),
    )
    posts = sh.select("block", "doc_id", F.explode("sh").alias("gram"))
    sizes = posts.groupBy("block", "doc_id").agg(
        F.count(F.lit(1)).alias("sz")
    )
    a = posts.alias("a")
    b = (posts if strategy == "none" else posts.hint(strategy)).alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.block").alias("block"),
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    la = sizes.select(
        "block", F.col("doc_id").alias("doc_id_a"), F.col("sz").alias("la")
    )
    lb = sizes.select(
        "block", F.col("doc_id").alias("doc_id_b"), F.col("sz").alias("lb")
    )
    denom = F.col("la") + F.col("lb") - F.col("i")
    return (
        inter.join(la, ["block", "doc_id_a"])
        .join(lb, ["block", "doc_id_b"])
        .select(
            "block",
            "doc_id_a",
            "doc_id_b",
            (F.col("i").cast("double") / denom).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.05)
    )


def timed(fn, runs=2):
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    spark = get_spark("ab-ngram")
    cores = spark.sparkContext.defaultParallelism
    tmp = "/tmp/ab_zipf_docs"
    zipf_corpus(spark, 20_000).select(
        "doc_id",
        "text",
        F.concat(F.lit("s"), (F.col("doc_id") % 8).cast("string")).alias(
            "source"
        ),
    ).write.mode("overwrite").parquet(tmp)
    rdocs = spark.read.parquet(tmp)

    from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
        load_table,
    )

    sdocs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text", "source"
    )

    # warm
    pairs_variant(rdocs, "none").write.format("noop").mode(
        "overwrite"
    ).save()

    for label, docs in [("realistic", rdocs), ("sf0.1", sdocs)]:
        for strat in ["shuffle_merge", "shuffle_hash", "none"]:
            for reb in [True, False]:
                dt = timed(lambda: pairs_variant(docs, strat, reb))
                print(
                    f"cores={cores} {label:10s} strat={strat:13s} "
                    f"rebalance={reb} {dt:.2f}s",
                    flush=True,
                )
    spark.stop()


if __name__ == "__main__":
    main()
