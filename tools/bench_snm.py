"""Standing measurement for the sorted-neighborhood family: candidate
LINEARITY and wall-time vs the df-capped posting-list join on a
realistic Zipf corpus (the bench_realistic_text.py generator — the
sf* tables' ~32-word vocabulary makes every similarity family look
artificially dense, posting joins included).

What this demonstrates, at two corpus sizes:

* SNM candidate count is EXACTLY n·w minus block tails — by
  construction, independent of text content — while the posting
  join's candidate volume is Σ_g df(g)², a content property that the
  df cap must hold down. Doubling the corpus doubles SNM's work;
  growth beyond linear is the posting join's.
* Wall-time: one block-partitioned sort + one rank equi-join vs
  posting explode + self-join + verify rejoin.

Recall is NOT symmetric (SNM sees prefix/suffix-aligned near-dups
inside its window; the posting join sees any shared-gram pair), so
this is a COST comparison of blocking strategies, not a quality
ranking — pick by duplicate geometry, pay accordingly.

Usage: python tools/bench_snm.py [n_docs...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 100_000]

    from tools.bench_realistic_text import zipf_corpus

    from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
        ngram_jaccard_pairs_capped,
        sorted_neighborhood_candidates,
        sorted_neighborhood_pairs,
    )
    from dev_dot_cvp_metadata_ingestion_spark.session import get_spark

    spark = get_spark("bench-snm")
    print(
        "n_docs\tsnm_cands\tsnm_sec\tsnm_pairs\tposting_sec\tposting_pairs"
    )
    for n in sizes:
        # 20 blocks, mirroring the sf tables' source blocking
        docs = zipf_corpus(spark, n).withColumn(
            "source", F.concat(F.lit("src"), (F.col("doc_id") % 20))
        )
        docs = docs.localCheckpoint()

        n_cands = sorted_neighborhood_candidates(
            docs, "doc_id", "text", "source"
        ).count()

        t0 = time.time()
        snm = sorted_neighborhood_pairs(
            docs, "doc_id", "text", "source", threshold=0.05
        )
        snm.write.format("noop").mode("overwrite").save()
        t_snm = time.time() - t0
        n_snm = snm.count()

        t0 = time.time()
        post = ngram_jaccard_pairs_capped(
            docs, "doc_id", "text", "source", n=2, threshold=0.05,
            max_doc_freq=50,
        )
        post.write.format("noop").mode("overwrite").save()
        t_post = time.time() - t0
        n_post = post.count()

        print(
            f"{n}\t{n_cands}\t{t_snm:.2f}\t{n_snm}\t{t_post:.2f}\t{n_post}"
        )


if __name__ == "__main__":
    main()
