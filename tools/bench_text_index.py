"""Amortization measurement for the persisted text index
(write_text_index / bm25_probe_index) on a REALISTIC vocabulary.

The sf* documents tables have ~32 distinct words, so every query term
matches nearly every document and an index can prune nothing — on
those tables probe ≈ in-query (measured 0.9x at sf0.1; recorded
honestly in SCALE.md). The regime an inverted index exists for is the
opposite: a web-scale vocabulary where any query's terms touch a tiny
fraction of postings. This harness builds that corpus distributed:
n_docs × 40 tokens, ~98% md5-unique tail, 2% drawn from 20 "topic"
words; queries ask for 3 topic words.

Measured: index build (once), in-query bm25_topk (pays the full
tokenize + corpus aggregates every time), indexed probe (reads only
the query terms' hash buckets). Equality asserted before timing.

Usage: python tools/bench_text_index.py [n_docs...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def corpus(spark, n_docs: int):
    """Deterministic distributed corpus: token j of doc d is a topic
    word when md5(d:j) lands in 2% of hash space, else a unique-ish
    md5 tail token."""
    def tok(j: int):
        h = F.md5(
            F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(str(j)))
        )
        bucket = F.conv(F.substring(h, 1, 4), 16, 10).cast("long")
        topic = F.concat(F.lit("topic"), (bucket % 20).cast("string"))
        return F.when(bucket % 50 == 0, topic).otherwise(
            F.substring(h, 1, 12)
        )

    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[tok(j) for j in range(40)]).alias("text"),
    )


def main() -> None:
    from dev_dot_cvp_metadata_ingestion_spark.operators.retrieval import (
        bm25_probe_index,
        bm25_topk,
    )
    from dev_dot_cvp_metadata_ingestion_spark.session import get_spark
    from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
        write_text_index,
    )

    sizes = [int(s) for s in sys.argv[1:]] or [50_000, 200_000, 800_000]
    spark = get_spark("text-index-bench", shuffle_partitions=32)
    q = spark.createDataFrame(
        [(1, "topic3"), (1, "topic7"), (2, "topic11")], "q_id long, term string"
    )
    for n in sizes:
        docs_path = f"/tmp/textidx_docs_{n}"
        corpus(spark, n).write.mode("overwrite").parquet(docs_path)
        docs = spark.read.parquet(docs_path)
        idx = f"/tmp/textidx_bench_{n}"
        t0 = time.monotonic()
        write_text_index(docs, idx, n_buckets=64)
        t_build = time.monotonic() - t0

        a = sorted(map(tuple, bm25_topk(docs, q, k=10).collect()))
        b = sorted(map(tuple, bm25_probe_index(spark, idx, q, k=10).collect()))
        assert a == b, f"probe != in-query at n={n}"

        t0 = time.monotonic()
        bm25_topk(docs, q, k=10).collect()
        t_full = time.monotonic() - t0
        t0 = time.monotonic()
        bm25_probe_index(spark, idx, q, k=10).collect()
        t_probe = time.monotonic() - t0
        print(
            f"n_docs={n:>8,}  build={t_build:5.1f}s  "
            f"in-query={t_full:5.2f}s  probe={t_probe:5.2f}s  "
            f"amortization={t_full / t_probe:4.1f}x"
        )
    spark.stop()


if __name__ == "__main__":
    main()
