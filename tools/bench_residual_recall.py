"""Recall@k comparison: residual vs global-codebook IVF-PQ (VERDICT r9
item 3 evidence). Ground truth = exact integer squared-L2 top-k at the
coarse scale. Queries are a denser slice (vec_id % QMOD == 0) than the
registered queries' % 97 so the recall estimate has support.

Usage: python tools/bench_residual_recall.py [sf_dir] [qmod]
"""

import sys
import time

from pyspark.sql import functions as F

from dev_dot_cvp_metadata_ingestion_spark.session import get_spark
from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import load_table
from dev_dot_cvp_metadata_ingestion_spark.operators.similarity import (
    ivf_pq_adc_topk,
    ivf_pq_residual_topk,
)


def exact_topk(e, q, k):
    xf = lambda c: F.transform(
        F.col(c), lambda v: F.floor(v.cast("double") * 10_000_000).cast("long")
    )
    corpus = e.select(F.col("vec_id"), xf("embedding").alias("vf"))
    qs = q.select(F.col("vec_id").alias("q_id"), xf("embedding").alias("qf"))
    d2 = F.aggregate(
        F.zip_with("vf", "qf", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, y: acc + y,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy("d2", "vec_id")
    return (
        corpus.crossJoin(F.broadcast(qs))
        .select("q_id", "vec_id", d2.alias("d2"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    qmod = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    k = 5
    spark = get_spark()
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % qmod == 0)
    nq = q.count()
    truth = {
        (r.q_id, r.vec_id)
        for r in exact_topk(e, q, k).collect()
    }
    out = {}
    for name, fn in [
        ("global", ivf_pq_adc_topk),
        ("residual", ivf_pq_residual_topk),
    ]:
        t0 = time.time()
        got = {
            (r.q_id, r.vec_id)
            for r in fn(
                e, q, n_cells=8, nprobe=2, d=64, m=8,
                k_codebook=16, k=k, iters=2,
            ).collect()
        }
        dt = time.time() - t0
        hit = len(got & truth)
        out[name] = (hit, len(truth), hit / len(truth), dt)
        print(
            f"{name:9s} recall@{k} = {hit}/{len(truth)} = "
            f"{hit / len(truth):.3f}   ({dt:.1f}s, {nq} queries)"
        )
    # The coarse pruning (nprobe/n_cells) is shared by both variants
    # and dominates absolute recall at toy scale. The residual
    # encoding's actual claim is CODEBOOK quality, so also measure the
    # total squared reconstruction error of the 8x16 codebooks over
    # raw slices (global) vs residual slices (residual) — same
    # fixed-point units (scale 1e5), directly comparable.
    from dev_dot_cvp_metadata_ingestion_spark.operators.similarity import (
        kmeans_assign,
        pq_codes,
    )

    g_err = (
        pq_codes(e, d=64, m=8, k=16, iters=2, scale=100_000)
        .agg(F.sum("dist").alias("e"))
        .collect()[0]
        .e
    )
    # residual reconstruction error: rebuild the residual relation the
    # operator uses and sum the per-subspace assignment distances
    coarse_asg, coarse_cents = kmeans_assign(
        e, k=8, iters=2, scale=10_000_000, return_centroids=True
    )
    requant = (
        "transform(zip_with(xf, cf, (a, b) -> a - b), "
        "r -> ((r + 40000000L) div 100L) - 400000L)"
    )
    xr = (
        e.select(
            "vec_id",
            F.transform(
                F.col("embedding"),
                lambda v: F.floor(v.cast("double") * 10_000_000).cast("long"),
            ).alias("xf"),
        )
        .join(coarse_asg.select("vec_id", F.col("cluster").alias("cell")), "vec_id")
        .join(
            F.broadcast(coarse_cents.select(F.col("cluster").alias("cell"), "cf")),
            "cell",
        )
        .select("vec_id", F.expr(requant).alias("rf"))
        .localCheckpoint()
    )
    r_err = 0
    for s in range(8):
        sl = xr.select(
            "vec_id", F.slice("rf", s * 8 + 1, 8).alias("rslice")
        )
        asg = kmeans_assign(
            sl, k=16, iters=2, vec_col="rslice", scale=100_000, prescaled=True
        )
        r_err += asg.agg(F.sum("dist").alias("e")).collect()[0].e
    print(f"reconstruction error: global={g_err}  residual={r_err}  "
          f"ratio={g_err / r_err:.2f}x")
    return out


if __name__ == "__main__":
    main()
