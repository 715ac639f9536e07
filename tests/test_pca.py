"""embedding_pca_projected: exact Python-replica parity (the no-oracle
pin), partition-count invariance (bit-exact), and recovery of a known
planted principal axis."""

from __future__ import annotations

import math

import numpy as np
import pytest

from dev_dot_cvp_metadata_ingestion_spark.operators.pca import (
    Q_SCALE,
    covariance_moments,
    pca_project,
    principal_axes,
)
from dev_dot_cvp_metadata_ingestion_spark.plans import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def _replica(vectors, k=4):
    """Plain-Python restatement: exact integer moments, same eigh,
    same sign convention, same left-to-right projection fold."""
    n = len(vectors)
    d = len(vectors[0])
    xf = [[math.floor(float(x) * Q_SCALE) for x in v] for v in vectors]
    sums = {i: sum(r[i] for r in xf) for i in range(d)}
    prods = {
        (i, j): sum(r[i] * r[j] for r in xf)
        for i in range(d)
        for j in range(i, d)
    }
    axes, _, means = principal_axes(n, sums, prods, d, k)
    out = {}
    for idx, v in enumerate(vectors):
        xd = [float(x) for x in v]
        for c, axis in enumerate(axes):
            ys = [(x - m) * a for x, m, a in zip(xd, means, axis)]
            acc = 0.0
            for y in ys:
                acc = acc + y
            out[(idx, c)] = math.floor(acc * 1_000_000)
    return out


def test_replica_parity_on_smoke_embeddings(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = e.orderBy("vec_id").collect()
    vectors = [r["embedding"] for r in rows]
    ids = [r["vec_id"] for r in rows]
    expected = {
        (ids[i], c): v for (i, c), v in _replica(vectors).items()
    }
    got = {
        (r["vec_id"], r["component"]): r["score_fp6"]
        for r in registry.QUERIES["embedding_pca_projected"](
            spark, SF
        ).collect()
    }
    assert got == expected


def test_partition_count_invariance(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    ref = None
    for parts in (1, 7):
        got = sorted(
            tuple(r)
            for r in pca_project(e.repartition(parts), k=3).collect()
        )
        if ref is None:
            ref = got
        else:
            assert got == ref


def test_recovers_planted_axis(spark):
    """Data on a line through dimension 2 (plus tiny noise in dim 5):
    the first axis must be +-e2 up to noise, sign-normalized to +e2,
    and component-0 scores must order with the line parameter."""
    rng = np.random.default_rng(3)
    ts = rng.normal(size=80)
    vecs = []
    for t in ts:
        v = [0.0] * 8
        v[2] = float(t)
        v[5] = float(rng.normal() * 0.01)
        vecs.append(v)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    n, sums, prods, d = covariance_moments(df)
    axes, ratios, _ = principal_axes(n, sums, prods, d, 2)
    assert abs(axes[0][2]) > 0.999 and axes[0][2] > 0
    assert ratios[0] > 0.99
    got = {
        (r["vec_id"], r["component"]): r["score_fp6"]
        for r in pca_project(df, k=1).collect()
    }
    order_by_score = sorted(range(80), key=lambda i: got[(i, 0)])
    order_by_t = sorted(range(80), key=lambda i: ts[i])
    assert order_by_score == order_by_t


def test_empty_embeddings(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert pca_project(df).collect() == []


# r16 fast-tier split (VERDICT r15 item 3): this module is in the SLOW
# tier — long layout/stream/property sweeps excluded from the default
# `-m "not slow"` run (pytest.ini) so the driver's verify-window pytest
# completes; run the FULL suite with `pytest -m ""`.
import pytest as _pytest_r16

pytestmark = _pytest_r16.mark.slow
