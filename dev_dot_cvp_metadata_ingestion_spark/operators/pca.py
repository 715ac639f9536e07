"""PCA over an embedding column — whitening / dimensionality
reduction ahead of ANN indexing (the OPQ-style rotation step of a
vector pipeline), built so the distributed half is EXACT.

Split of labour: covariance moments are accumulated as exact
fixed-point integers on the cluster (order-independent, so the result
is bit-identical under any partitioning); the eigendecomposition runs
driver-side on the d x d matrix (config-scale — 64 x 64 here, never
data-scale); projection is a row-local deterministic left fold. The
only non-SQL-expressible step is the eigensolve, which is why the
registered query carries a Python-replica pin instead of a DuckDB
oracle (plans/registry.py no-oracle convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q_BITS = 20
Q_SCALE = 1 << Q_BITS  # input quantization: floor(x * 2^20)


def covariance_moments(emb: DataFrame, vec_col: str = "embedding"):
    """Exact integer moment relations for mean/covariance: returns
    (n, sums, prods) where ``n`` is the row count, ``sums`` is
    {i: sum_fp} and ``prods`` is {(i, j): sum of x_i_fp * x_j_fp} for
    i <= j. Inputs are quantized floor(x * 2^20) (exact for float32
    sources — the cast to double and the power-of-two scale are both
    lossless), products are accumulated as DECIMAL(38, 0), so the sum
    can never overflow or lose a bit regardless of corpus size — the
    100 TB-safe version of the int64 accumulator, which caps out near
    8M rows at this quantization.

    Shape: one map-side quantization, a d-row and a d(d+1)/2-row
    aggregate (both collapse map-side to config-sized partials per
    partition — the upper-triangle explode is Generate + partial
    HashAggregate, never a corpus-sized shuffle). Driver receives
    d(d+1)/2 + d + 1 scalars.
    """
    head = emb.select(F.size(vec_col).alias("d")).first()
    if head is None:  # empty input: no moments, caller short-circuits
        return 0, {}, {}, 0
    d = head["d"]
    # NOT rebalanced (r15 A/B): the moment relations are consumed by
    # THREE separate driver actions (count + two collects), and each
    # action would re-pay a rebalance exchange — measured 2.7 → 12.7 s
    # at sf0.1, the one site where the narrow-scan rebalance loses
    x = emb.select(
        F.expr(
            f"transform({vec_col}, v -> CAST(floor(CAST(v AS DOUBLE)"
            f" * {Q_SCALE}) AS BIGINT))"
        ).alias("xf")
    )
    n = x.count()
    rows_i = x.select(F.posexplode("xf").alias("i", "xi"), F.col("xf"))
    sums = {
        r["i"]: int(r["s"])
        for r in rows_i.groupBy("i")
        .agg(F.sum(F.col("xi").cast("decimal(38,0)")).alias("s"))
        .collect()
    }
    cells = rows_i.select(
        "i",
        "xi",
        F.expr(f"posexplode(slice(xf, i + 1, {d} - i))").alias("jo", "xj"),
    ).select(
        "i",
        (F.col("i") + F.col("jo")).alias("j"),
        (
            F.col("xi").cast("decimal(38,0)")
            * F.col("xj").cast("decimal(38,0)")
        ).alias("p"),
    )
    prods = {
        (r["i"], r["j"]): int(r["s"])
        for r in cells.groupBy("i", "j").agg(F.sum("p").alias("s")).collect()
    }
    return n, sums, prods, d


def principal_axes(n: int, sums, prods, d: int, k: int):
    """Top-k eigenvectors (+ explained-variance ratios) of the exact
    covariance implied by the integer moments. cov_ij is formed as
    the EXACT integer n*S_ij - M_i*M_j (one float division at the
    end), so the matrix handed to the eigensolver is identical no
    matter how the cluster partitioned the data. Sign convention:
    each axis's largest-|coordinate| entry (first on ties) is made
    positive, removing the eigenvector sign ambiguity."""
    import numpy as np

    cov = [[0.0] * d for _ in range(d)]
    denom = float(n) * n * (Q_SCALE * Q_SCALE)
    for (i, j), s in prods.items():
        c = (n * s - sums[i] * sums[j]) / denom  # exact int -> one division
        cov[i][j] = c
        cov[j][i] = c
    w, v = np.linalg.eigh(np.array(cov))
    order = list(np.argsort(w)[::-1][:k])
    total = float(sum(max(x, 0.0) for x in w)) or 1.0
    axes = []
    ratios = []
    for c in order:
        vec = v[:, c]
        pivot = int(np.argmax(np.abs(vec)))
        if vec[pivot] < 0:
            vec = -vec
        axes.append([float(x) for x in vec])
        ratios.append(float(max(w[c], 0.0)) / total)
    means = [sums[i] / (float(n) * Q_SCALE) for i in range(d)]
    return axes, ratios, means


def pca_project(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
) -> DataFrame:
    """Project every vector onto the top-k principal axes, LONG form
    (id, component, score_fp6) — driver-canon-safe scalars, score as
    floor(score * 1e6). The projection is a row-local zip_with +
    left-fold over doubles (fixed operation order), so together with
    the exact moments the whole operator is partition-invariant
    bit-for-bit. One corpus scan for moments, one for projection."""
    n, sums, prods, d = covariance_moments(emb, vec_col)
    if n == 0:
        return emb.select(
            F.col(id_col),
            F.lit(0).alias("component"),
            F.lit(0).cast("long").alias("score_fp6"),
        ).limit(0)
    axes, _, means = principal_axes(n, sums, prods, d, k)
    xd = F.expr(f"transform({vec_col}, v -> CAST(v AS DOUBLE))")
    m_arr = F.array(*[F.lit(m).cast("double") for m in means])
    base = emb.select(F.col(id_col), xd.alias("xd"))

    def score(axis):
        v_arr = F.array(*[F.lit(a).cast("double") for a in axis])
        terms = F.zip_with(
            F.zip_with(F.col("xd"), m_arr, lambda x, m: x - m),
            v_arr,
            lambda y, v: y * v,
        )
        acc = F.aggregate(
            terms, F.lit(0.0).cast("double"), lambda a, y: a + y
        )
        return F.floor(acc * 1_000_000).cast("long")

    # all k scores in ONE projection + posexplode — a single corpus
    # scan, not k unioned scans
    return base.select(
        F.col(id_col),
        F.posexplode(F.array(*[score(a) for a in axes])).alias(
            "component", "score_fp6"
        ),
    )
