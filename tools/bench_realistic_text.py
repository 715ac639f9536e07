"""Standing realistic-vocabulary measurement for the text-index family
(r11 VERDICT item 7 — SCALE.md's per-round probe numbers previously
had to caveat the sf* tables' ~32-word synthetic vocabulary, where
every term hashes into nearly every bucket and an inverted index can
prune nothing).

Corpus: deterministic Zipf-distributed vocabulary, generated
distributed with index algebra (no RNG): token j of doc d draws a
32-bit uniform from md5(d:j) and maps it through the log-uniform
inverse CDF ``rank = floor(exp(u · ln V))`` — rank frequency ∝ 1/rank,
the classic Zipf s=1 web-text shape — over a V=20,000-word vocabulary,
60 tokens per doc. Queries hit mid-rank words; the phrase query uses
the two most frequent words (adjacency occurs by chance at a realistic
~25% doc rate).

Measured, after asserting probe ≡ in-query row-for-row: the three
retrieval families' amortized probes against ONE positional text index
(BM25 top-k, exact phrase search, two-pass PRF) vs their in-query
forms that pay the corpus tokenize every time. Results feed the
standing SCALE.md table each round.

Usage: python tools/bench_realistic_text.py [n_docs...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

VOCAB = 20_000
DOC_LEN = 60


def zipf_corpus(spark, n_docs: int):
    """token j of doc d = 'w<rank>' with rank log-uniform in
    [1, VOCAB] — deterministic, distributed, no RNG."""
    lnv = math.log(VOCAB)

    def tok(j: int):
        h = F.md5(
            F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(str(j)))
        )
        u = F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / float(
            1 << 32
        )
        rank = F.least(
            F.floor(F.exp(u * F.lit(lnv))).cast("long"), F.lit(VOCAB)
        )
        return F.concat(F.lit("w"), rank.cast("string"))

    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[tok(j) for j in range(DOC_LEN)]).alias("text"),
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _timed(fn):
    t0 = time.monotonic()
    n = len(fn().collect())
    return time.monotonic() - t0, n


def main() -> None:
    from dev_dot_cvp_metadata_ingestion_spark.operators.retrieval import (
        bm25_prf_probe_index,
        bm25_prf_topk,
        bm25_probe_index,
        bm25_topk,
        phrase_probe_index,
        phrase_search_topk,
    )
    from dev_dot_cvp_metadata_ingestion_spark.session import get_spark
    from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
        write_text_index,
    )

    sizes = [int(s) for s in sys.argv[1:]] or [200_000]
    spark = get_spark("realistic-text-bench", shuffle_partitions=32)
    q = spark.createDataFrame(
        [(1, "w157"), (1, "w912"), (2, "w43"), (2, "w2048"), (3, "w311")],
        "q_id long, term string",
    )
    phrase = spark.createDataFrame(
        [(1, 1, "w1"), (1, 2, "w2")], "q_id long, term_pos long, term string"
    )
    for n in sizes:
        docs_path = f"/tmp/zipf_docs_{n}"
        zipf_corpus(spark, n).write.mode("overwrite").parquet(docs_path)
        docs = spark.read.parquet(docs_path)
        idx = f"/tmp/zipf_idx_{n}"
        t0 = time.monotonic()
        write_text_index(docs, idx, n_buckets=64, positional=True)
        t_build = time.monotonic() - t0

        cases = [
            (
                "bm25",
                lambda: bm25_topk(docs, q, k=10),
                lambda: bm25_probe_index(spark, idx, q, k=10),
            ),
            (
                "phrase",
                lambda: phrase_search_topk(docs, phrase, k=10),
                lambda: phrase_probe_index(spark, idx, phrase, k=10),
            ),
            (
                "prf",
                lambda: bm25_prf_topk(docs, q, k=10),
                lambda: bm25_prf_probe_index(spark, idx, q, k=10),
            ),
        ]
        print(f"n_docs={n:,}  vocab={VOCAB:,}  build={t_build:.1f}s")
        for name, in_query, probe in cases:
            assert _rows(in_query()) == _rows(probe()), name
            t_full, _ = _timed(in_query)
            t_probe, nr = _timed(probe)
            print(
                f"  {name:<7} in-query={t_full:6.2f}s  "
                f"probe={t_probe:6.2f}s  speedup={t_full / t_probe:5.1f}x  "
                f"rows={nr}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
