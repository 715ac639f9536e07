"""Production-vocabulary BPE: k=32768 merges, schedule-pinned to the
plain-Python reference (VERDICT r8 "what's missing" item 2 — the one
trained artifact previously below production scale; 30k+ merges is
deployable-tokenizer territory).

The 3k-word pytest pin corpus tops out near ~22k possible merges
(Σ(len−1) over words, minus sharing), so this run trains on the same
deterministic generator at 12k words (~100k merge inventory). The
batched Spark schedule (adaptive batch growth + candidate window,
operators/bpe.py) must learn the IDENTICAL merge table as the
reference — asserted rank-for-rank before any timing is reported.

Too slow for the pytest suite (the reference alone is minutes); run
manually, results recorded in SCALE.md.

Usage: python tools/bench_bpe_32k.py [k] [n_words] [recount|incremental|auto]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.test_bpe import _python_bpe_batched, _rich_word_freqs


def main() -> None:
    from dev_dot_cvp_metadata_ingestion_spark.operators.bpe import (
        bpe_merges_batched,
    )
    from dev_dot_cvp_metadata_ingestion_spark.session import get_spark

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 32_768
    n_words = int(sys.argv[2]) if len(sys.argv) > 2 else 12_000
    mode = sys.argv[3] if len(sys.argv) > 3 else "recount"
    incremental = {"recount": False, "incremental": True, "auto": "auto"}[mode]

    wf = _rich_word_freqs(n_words)
    t0 = time.monotonic()
    expected = _python_bpe_batched(
        wf, k=k, batch=16, max_batch=1024, window_mult=16
    )
    t_ref = time.monotonic() - t0
    print(f"python reference: {len(expected)} merges in {t_ref:.1f}s")

    spark = get_spark("bpe-32k", shuffle_partitions=32)
    docs = spark.createDataFrame(
        [(" ".join([w] * f),) for w, f in wf.items()], ["text"]
    )
    t0 = time.monotonic()
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_count, r.round)
        for r in bpe_merges_batched(
            docs,
            k=k,
            batch=16,
            max_batch=1024,
            window_mult=16,
            incremental=incremental,
        )
        .orderBy("rank")
        .collect()
    ]
    t_spark = time.monotonic() - t0
    assert len(got) == len(expected) == k, (len(got), len(expected), k)
    assert got == expected, "schedule diverged from the reference"
    rounds = max(r[5] for r in got)
    print(
        f"spark[{mode}]: k={k} in {rounds} counting rounds, "
        f"{t_spark:.1f}s wall (vocab {n_words} words)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
