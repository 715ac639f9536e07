"""Adversarial-skew scaling measurement for the round-8 segment
operators (VERDICT r8 item 5): a corpus where ONE boilerplate segment
opens 50% of all documents — the same skew pattern the ngram stop-gram
cap was proven against — at 5k / 20k / 80k docs.

The claim under test: both plans absorb duplicate-segment mass in
MAP-SIDE partial aggregation (min_by for first-occurrence, distinct+
count for the hot set), so a segment repeated 40k times moves one row
per input partition through the shuffle, never a 40k-row group — time
must scale ~linearly with corpus size (flat factor per 4x step), not
quadratically like an uncapped posting-list self-join would.

Usage: python tools/bench_segment_skew.py [sizes...]
Prints one line per (operator, n_docs) and the per-4x growth factors.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def skewed_corpus(spark, n_docs: int):
    """n_docs docs of 5 exact 10-token segments; docs with even id open
    with the SAME boilerplate segment (50% duplicated-segment mass).
    Segments are md5-derived so the corpus is deterministic and
    generated distributed (no driver-side list)."""
    boiler = " ".join(f"bb{i}" for i in range(10))

    def seg(j: int):
        h = F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(str(j))))
        return F.concat_ws(
            " ", *[F.substring(h, 1 + 3 * i, 3) for i in range(10)]
        )

    first = F.when(F.col("doc_id") % 2 == 0, F.lit(boiler)).otherwise(seg(0))
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", first, seg(1), seg(2), seg(3), seg(4)).alias("text"),
    )


def main() -> None:
    from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
        segment_boilerplate_removal,
        segment_first_occurrence_dedup,
    )
    from dev_dot_cvp_metadata_ingestion_spark.plans.datapipe import (
        _scrub_plan_over,
    )
    from dev_dot_cvp_metadata_ingestion_spark.session import get_spark

    sizes = [int(s) for s in sys.argv[1:]] or [5_000, 20_000, 80_000]
    spark = get_spark("segment-skew", shuffle_partitions=32)
    results: dict[str, list[float]] = {
        "first_occurrence": [],
        "boilerplate": [],
        "substring_scrub": [],
    }
    for n in sizes:
        docs = skewed_corpus(spark, n).localCheckpoint()  # gen cost excluded
        for name, fn in (
            ("first_occurrence", segment_first_occurrence_dedup),
            ("boilerplate", segment_boilerplate_removal),
            ("substring_scrub", None),
        ):
            t0 = time.time()
            frame = (
                _scrub_plan_over(docs)
                if fn is None
                else fn(docs, "doc_id", "text", seg_tokens=10)
            )
            out = (
                frame.agg(
                    F.count(F.lit(1)).alias("docs"),
                    F.sum("n_removed").alias("removed"),
                )
                .collect()[0]
            )
            dt = time.time() - t0
            results[name].append(dt)
            print(
                f"{name:18s} n={n:6d} time={dt:6.2f}s "
                f"docs={out['docs']} removed={out['removed']}",
                flush=True,
            )
    for name, ts in results.items():
        factors = [
            round(b / a, 2) for a, b in zip(ts, ts[1:])
        ]
        print(f"{name}: per-step growth factors (4x data each) = {factors}")
    spark.stop()


if __name__ == "__main__":
    main()
