"""A/B localCheckpoint-pinning of the curation diamond boundaries
(r15 VERDICT item 8 — documents_training_shards was the most expensive
untouched curation row).

The pure _curated_plan re-evaluates scored/clean/quality_pass once per
downstream consumer (column-pruned, but the tokenize+quality projection
re-runs each time — 122 Exchanges in documents_training_shards_before).
This times each registered consumer with pin=identity (shipped) vs
pin=localCheckpoint (the MMR/PQ materialization device, same rows).

Usage: SPARK_GRAFT_CPUS=32 python tools/ab_curated_pin.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dev_dot_cvp_metadata_ingestion_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
QUERIES = [
    "documents_curated",
    "documents_curation_funnel",
    "documents_training_examples",
    "documents_training_shards",
    "documents_training_shards_packed",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from dev_dot_cvp_metadata_ingestion_spark.plans import datapipe

    qs = entrymod.queries()
    spark = get_spark("ab-curated")
    cores = spark.sparkContext.defaultParallelism

    orig = datapipe._curated_plan

    def pinned(d, pin=None):
        # force the diamond boundaries through localCheckpoint no
        # matter what the caller passes (the funnel passes a capturing
        # pin — compose so its stage list still fills)
        caller_pin = pin or (lambda df: df)

        def ck(df):
            return caller_pin(df.localCheckpoint())

        return orig(d, pin=ck)

    # warm
    for q in QUERIES:
        qs[q](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    best: dict[tuple[str, str], float] = {}
    for _round in range(3):
        for mode, fn in [("identity", orig), ("ckpt", pinned)]:
            datapipe._curated_plan = fn
            for q in QUERIES:
                t0 = time.perf_counter()
                qs[q](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                key = (q, mode)
                best[key] = min(best.get(key, dt), dt)
    datapipe._curated_plan = orig
    for q in QUERIES:
        i = best[(q, "identity")]
        c = best[(q, "ckpt")]
        print(
            f"cores={cores} {q:35s} identity={i:.2f}s ckpt={c:.2f}s "
            f"winner={'ckpt' if c < i else 'identity'}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
