"""BM25 hot-term skew probe (VERDICT r9 item 5): a stop-word-grade
query term (df ~ 95% of docs) makes the query-term posting relation
corpus-sized. Is the scoring pipeline flat under that skew — i.e.
does per-matching-posting cost stay constant as the corpus grows —
or does some stage go superlinear?

Why flatness is expected by design: the hot word's df collapses
map-side (groupBy word partial aggregation — one row per partition
per word); the contrib rows shuffle on (q_id, doc_id), which is
uniformly distributed regardless of term frequency; and the salted
two-phase top-k splits the hot query's ~0.95·n candidates across
n_salts window partitions. Nothing keys a shuffle or a window on the
hot TERM itself.

Corpus: 30-token docs; token 0 is 'the' for 19 of 20 docs (95% df),
the rest are md5 long-tail + 2% topic words. Measured per size:
rare-term query time, hot-term query time, and the hot/rare ratio
(both after asserting non-empty results).

Usage: python tools/bench_bm25_skew.py [sizes...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def corpus(spark, n_docs: int):
    def tok(j: int):
        h = F.md5(
            F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(str(j)))
        )
        bucket = F.conv(F.substring(h, 1, 4), 16, 10).cast("long")
        topic = F.concat(F.lit("topic"), (bucket % 20).cast("string"))
        return F.when(bucket % 50 == 0, topic).otherwise(
            F.substring(h, 1, 12)
        )

    stop = F.when(F.col("doc_id") % 20 != 0, F.lit("the")).otherwise(
        F.lit("rareword")
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", stop, *[tok(j) for j in range(29)]
        ).alias("text"),
    )


def main() -> None:
    from dev_dot_cvp_metadata_ingestion_spark.operators.retrieval import (
        bm25_topk,
    )
    from dev_dot_cvp_metadata_ingestion_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [20_000, 80_000, 320_000]
    spark = get_spark()
    print(f"{'n_docs':>9} {'rare_s':>8} {'hot_s':>8} {'hot/rare':>9}")
    for n in sizes:
        d = corpus(spark, n).localCheckpoint()  # exclude generation cost
        res = {}
        # bucket % 50 == 0 implies bucket % 20 in {0, 10}: the only
        # topic words this generator emits are topic0 and topic10
        for name, term in [("rare", "topic10"), ("hot", "the")]:
            q = spark.createDataFrame([(1, term)], "q_id long, term string")
            t0 = time.time()
            rows = bm25_topk(d, q, k=10).collect()
            res[name] = time.time() - t0
            assert len(rows) == 10, (name, n, len(rows))
        ratio = res["hot"] / res["rare"]
        print(f"{n:>9} {res['rare']:>8.2f} {res['hot']:>8.2f} {ratio:>9.2f}")
        # flat-factor assertion: a 95%-df term must not cost more than
        # 2x a 2%-df term at any size — if this trips, land the
        # stop-term ledger (cap df at probe time, exact recount for
        # survivors — the ngram-cap pattern)
        assert ratio < 2.0, (n, ratio)


if __name__ == "__main__":
    main()
