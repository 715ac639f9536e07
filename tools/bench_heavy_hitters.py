"""Scaling measurement for the Misra-Gries two-phase heavy hitters:
does the sketch path actually beat the naive full-vocabulary
aggregate where it claims to — LARGE vocabulary, few hot keys?

Corpus: n_tokens rows where 5% of rows are one of 10 hot words and
95% are md5-derived long-tail words (vocabulary ~ n_tokens * 0.95
distinct values — the "billions of grouping keys to keep a few
thousand" regime in miniature). Generated distributed (spark.range),
deterministic.

Measured per size: wall time of (a) the MG two-phase operator at
threshold 1000 ppm and (b) the naive groupBy-all-then-filter, plus
the candidate-union size (how much the sketch pruned). Both outputs
are asserted EQUAL first — the race only counts if the results match.

Usage: python tools/bench_heavy_hitters.py [sizes...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def corpus(spark, n_tokens: int):
    hot = F.concat(
        F.lit("hot"), ((F.col("id") / 20).cast("long") % 10).cast("string")
    )
    tail = F.md5(F.col("id").cast("string"))
    return spark.range(n_tokens).select(
        F.when(F.col("id") % 20 == 0, hot).otherwise(tail).alias("word")
    )


def naive(items, threshold_ppm: int):
    total = items.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        items.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .filter(
            F.col("n_occurrences") * F.lit(1_000_000)
            > F.lit(threshold_ppm) * F.col("n_total")
        )
        .select(
            "word",
            "n_occurrences",
            F.expr("n_occurrences * 1000000L div n_total").alias("freq_ppm"),
        )
    )


def main() -> None:
    from dev_dot_cvp_metadata_ingestion_spark.operators.heavy_hitters import (
        heavy_hitters,
        mg_candidates,
    )
    from dev_dot_cvp_metadata_ingestion_spark.session import get_spark

    sizes = [int(s) for s in sys.argv[1:]] or [1_000_000, 4_000_000, 16_000_000]
    spark = get_spark("heavy-hitters-bench", shuffle_partitions=32)
    thr = 1000
    for n in sizes:
        items = corpus(spark, n).repartition(32).localCheckpoint()
        a = sorted(map(tuple, heavy_hitters(items, "word", thr).collect()))
        b = sorted(map(tuple, naive(items, thr).collect()))
        assert a == b, f"mismatch at n={n}"
        n_cand = mg_candidates(items, "word", 1000).distinct().count()

        t0 = time.monotonic()
        heavy_hitters(items, "word", thr).collect()
        t_mg = time.monotonic() - t0
        t0 = time.monotonic()
        naive(items, thr).collect()
        t_naive = time.monotonic() - t0
        # the 100 TB constraint is DATA MOTION, not local CPU: the
        # naive plan's aggregate exchange carries ~|vocab| rows (the
        # unique tail defeats partial aggregation), the sketch path's
        # carries |candidates|
        n_vocab = items.distinct().count()
        print(
            f"n={n:>10,}  hitters={len(a)}  "
            f"shuffled: naive~{n_vocab:,} rows vs mg={n_cand} rows  "
            f"mg={t_mg:5.1f}s  naive={t_naive:5.1f}s  "
            f"ratio={t_naive / t_mg:4.2f}x"
        )
    spark.stop()


if __name__ == "__main__":
    main()
