"""Property tests for winnowing fingerprints (operators/dedup.py).

The winnowing guarantee (Schleimer/Wilkerson/Aiken, SIGMOD'03): with
gram size n and window w, any two documents sharing a contiguous run
of at least n + w - 1 tokens select at least one common fingerprint.
Randomized pairs with implanted shared runs verify it end-to-end
through the Spark expression; unrelated random docs (disjoint token
alphabets) verify the converse direction has no spurious guarantees
broken (distinct alphabets can share no gram, hence no fingerprint).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
    winnow_fingerprints,
)

N, W = 4, 5
SHARED_RUN = N + W - 1  # 8 tokens


def _fps(spark, docs: dict[int, str]) -> dict[int, set[int]]:
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], ["doc_id", "text"]
    )
    out = winnow_fingerprints(df, "text", n=N, w=W).select(
        "doc_id", "fingerprints"
    )
    return {r.doc_id: set(r.fingerprints) for r in out.collect()}


def test_shared_run_guarantees_common_fingerprint(spark):
    rng = random.Random(1234)
    docs: dict[int, str] = {}
    pair_ids = []
    for p in range(12):
        run = [f"run{p}_{i}" for i in range(SHARED_RUN)]
        a = [f"a{p}_{i}" for i in range(rng.randint(0, 30))]
        b = [f"b{p}_{i}" for i in range(rng.randint(0, 30))]
        c = [f"c{p}_{i}" for i in range(rng.randint(0, 30))]
        d = [f"d{p}_{i}" for i in range(rng.randint(0, 30))]
        docs[2 * p] = " ".join(a + run + b)
        docs[2 * p + 1] = " ".join(c + run + d)
        pair_ids.append((2 * p, 2 * p + 1))
    fps = _fps(spark, docs)
    for x, y in pair_ids:
        assert fps[x] & fps[y], f"pair ({x},{y}) shares an {SHARED_RUN}-token run but no fingerprint"


def test_disjoint_alphabets_share_nothing(spark):
    rng = random.Random(99)
    docs = {
        0: " ".join(f"x{rng.randint(0, 50)}" for _ in range(60)),
        1: " ".join(f"y{rng.randint(0, 50)}" for _ in range(60)),
    }
    fps = _fps(spark, docs)
    assert fps[0] and fps[1]
    assert not (fps[0] & fps[1])


def test_short_doc_conventions(spark):
    docs = {
        0: "a b c",          # < n tokens: no grams -> no fingerprints
        1: "a b c d",        # exactly one gram -> its hash
        2: "a b c d e f g",  # 4 grams (< w) -> single global min
    }
    fps = _fps(spark, docs)
    assert fps[0] == set()
    assert len(fps[1]) == 1
    assert len(fps[2]) == 1


def test_fingerprints_subset_of_gram_hashes(spark):
    """Every fingerprint is the hash of some actual gram of the doc."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
        base_hash,
        ordered_grams,
    )

    text = " ".join(f"t{i % 7}" for i in range(40))
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    all_hashes = {
        r[0]
        for r in df.select(
            F.explode(F.transform(ordered_grams(F.col("text"), N), base_hash))
        ).collect()
    }
    fps = _fps(spark, {0: text})[0]
    assert fps and fps <= all_hashes
