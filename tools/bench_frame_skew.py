"""Boilerplate-media skew measurement for the frame posting joins.

The adversarial shape: every document carries a few UNIQUE frames plus
ONE ubiquitous frame (the black frame / network-logo intro / silence
chunk every real media corpus has). The uncapped posting self-join
enumerates df² candidate pairs on that fingerprint — quadratic in the
corpus — while the stop-fingerprint cap
(operators/dedup.py:fingerprint_set_jaccard_pairs_capped) generates
candidates only from sub-cap fingerprints and re-scores found pairs
exactly. Claims under test:

- capped: time grows ~linearly with the corpus as the ubiquitous
  frame's df quadruples (cold posting volume is linear; the hot frame
  contributes zero candidates).
- uncapped control (fingerprint_set_jaccard_pairs), priced only at
  the smallest size: df²-shaped growth.
- correctness: planted exact-duplicate pairs (unique frames copied)
  surface at jaccard 1.0 in BOTH forms, with identical scores.

Usage: python tools/bench_frame_skew.py [n_docs...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def media_posts(spark, n_docs: int):
    """Per doc: 3 unique frame fingerprints + the ubiquitous frame;
    every 100th doc is duplicated (re-keyed) so real near-dup pairs
    exist. Deterministic md5 index algebra, no RNG."""
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    uniq = base.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.md5(F.concat_ws(":", F.col("doc_id").cast("string"),
                                  F.lit(str(j))))
                for j in range(3)
            ])
        ).alias("fp"),
    )
    dups = uniq.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "fp"
    )
    all_uniq = uniq.unionByName(dups)
    ubiq = (
        all_uniq.select("doc_id")
        .distinct()
        .select("doc_id", F.md5(F.lit("__black_frame__")).alias("fp"))
    )
    return all_uniq.unionByName(ubiq)


def main() -> None:
    from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
        fingerprint_set_jaccard_pairs,
        fingerprint_set_jaccard_pairs_capped,
    )
    from dev_dot_cvp_metadata_ingestion_spark.session import get_spark

    sizes = [int(s) for s in sys.argv[1:]] or [5_000, 20_000, 80_000]
    spark = get_spark("frame-skew", shuffle_partitions=32)
    capped_times: list[float] = []
    for i, n in enumerate(sizes):
        posts = media_posts(spark, n).localCheckpoint()

        t0 = time.time()
        capped = fingerprint_set_jaccard_pairs_capped(
            posts, id_col="doc_id", fp_col="fp", threshold=0.5,
            max_doc_freq=50,
        )
        rows_c = capped.count()
        dt_c = time.time() - t0
        capped_times.append(dt_c)

        dt_u, rows_u = float("nan"), -1
        if i == 0:
            # the df² control is affordable only at the smallest size
            t0 = time.time()
            uncapped = fingerprint_set_jaccard_pairs(
                posts, id_col="doc_id", fp_col="fp", threshold=0.5
            )
            rows_u = uncapped.count()
            dt_u = time.time() - t0
            got_c = sorted(map(tuple, capped.collect()))
            got_u = sorted(map(tuple, uncapped.collect()))
            # capped keeps exactly the pairs sharing >=1 cold frame,
            # scored identically; here every true dup pair shares 3
            # cold frames, and NO pair rides only the black frame at
            # threshold 0.5, so the relations must be equal
            assert got_c == got_u, (len(got_c), len(got_u))

        n_pairs_expected = (n + 99) // 100
        assert rows_c == n_pairs_expected, (rows_c, n_pairs_expected)
        print(
            f"n_docs={n:7d} ubiq_df={n + n_pairs_expected:7d} "
            f"capped={dt_c:6.2f}s (pairs={rows_c}) "
            f"uncapped={dt_u:6.2f}s (pairs={rows_u})",
            flush=True,
        )
    factors = [round(b / a, 2) for a, b in zip(capped_times, capped_times[1:])]
    print(f"capped per-4x-corpus growth factors = {factors}")
    spark.stop()


if __name__ == "__main__":
    main()
