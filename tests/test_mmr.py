"""MMR diversity rerank: the greedy fixed-point selection must match
a plain-Python replica of the same algebra, the first pick must be
the plain nearest, and with a redundant candidate pool the picked set
must actually diversify (differ from plain top-k)."""

from __future__ import annotations

import pyspark.sql.functions as F

from dev_dot_cvp_metadata_ingestion_spark.operators.similarity import (
    mmr_rerank,
)

SCALE = 100_000


def _replica(vecs, q_ids, k=5, n_cand=20, lam=500_000):
    import math

    import numpy as np

    # the table stores array<float>: quantization sees the FLOAT32
    # value widened to double, not the Python double literal
    xf = {
        i: [int(math.floor(float(np.float32(v)) * SCALE)) for v in vec]
        for i, vec in vecs.items()
    }

    def d(a, b):
        return sum((x - y) * (x - y) for x, y in zip(xf[a], xf[b]))

    out = []
    for q in q_ids:
        cand = sorted(xf, key=lambda c: (d(c, q), c))[:n_cand]
        sel = [min(cand, key=lambda c: (d(c, q), c))]
        while len(sel) < k and len(sel) < len(cand):
            rem = [c for c in cand if c not in sel]
            sel.append(
                min(
                    rem,
                    key=lambda c: (
                        lam * d(c, q)
                        - (1_000_000 - lam) * min(d(c, s) for s in sel),
                        c,
                    ),
                )
            )
        out += [(q, c, d(c, q), i + 1) for i, c in enumerate(sel)]
    return sorted(out)


def _run(spark, vecs, q_ids, k=5, n_cand=20):
    e = spark.createDataFrame(
        [(i, list(map(float, v))) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    q = e.filter(F.col("vec_id").isin(list(q_ids)))
    return sorted(
        (r.q_id, r.vec_id, r.dq, r.pick)
        for r in mmr_rerank(e, q, k=k, n_cand=n_cand).collect()
    )


def test_matches_python_replica_clustered(spark):
    # two tight clusters + scattered points: MMR must hop clusters
    vecs = {
        0: [0.10, 0.10], 1: [0.11, 0.10], 2: [0.10, 0.11],  # cluster A
        3: [0.80, 0.80], 4: [0.81, 0.80], 5: [0.80, 0.81],  # cluster B
        6: [0.45, 0.45], 7: [0.20, 0.70], 8: [0.70, 0.20],
        9: [0.12, 0.12],
    }
    got = _run(spark, vecs, [0], k=4, n_cand=10)
    want = _replica(vecs, [0], k=4, n_cand=10)
    assert got == want
    # pick 1 is the query itself (dq = 0, plain nearest)
    assert got[0] == (0, 0, 0, 1)
    # diversity property needs a diversity-leaning lambda: with the
    # in-corpus query selected first and lam=0.5, round 2 is a pure
    # tie (dmin == dq for every candidate). At lam=0.2 the greedy
    # must hop out of cluster A, where plain top-4 by distance stays
    # inside A u {9}.
    e = spark.createDataFrame(
        [(i, list(map(float, v))) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    q = e.filter(F.col("vec_id") == 0)
    div = sorted(
        (r.q_id, r.vec_id, r.dq, r.pick)
        for r in mmr_rerank(e, q, k=4, n_cand=10, lam_ppm=200_000).collect()
    )
    assert div == _replica(vecs, [0], k=4, n_cand=10, lam=200_000)
    picked = {v for (_, v, _, _) in div}
    assert not picked <= {0, 1, 2, 9}, picked


def test_matches_python_replica_randomized(spark):
    import random

    rnd = random.Random(11)
    vecs = {
        i: [rnd.uniform(-0.5, 0.5) for _ in range(8)] for i in range(40)
    }
    q_ids = [0, 13, 27]
    assert _run(spark, vecs, q_ids, k=5, n_cand=12) == _replica(
        vecs, q_ids, k=5, n_cand=12
    )


def test_lambda_one_is_plain_topk(spark):
    import random

    rnd = random.Random(3)
    vecs = {i: [rnd.uniform(-0.5, 0.5) for _ in range(4)] for i in range(25)}
    e = spark.createDataFrame(
        [(i, list(map(float, v))) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    q = e.filter(F.col("vec_id") == 0)
    got = sorted(
        (r.vec_id, r.pick)
        for r in mmr_rerank(e, q, k=5, n_cand=10, lam_ppm=1_000_000).collect()
    )
    want = _replica(vecs, [0], k=5, n_cand=10, lam=1_000_000)
    assert got == sorted((v, p) for (_, v, _, p) in want)
