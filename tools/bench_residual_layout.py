"""Amortization measurement for the persisted RESIDUAL IVF-PQ layout
(write_ivf_pq_residual_layout / ivf_pq_residual_probe_topk) at a
given sf dir — the residual twin of the r9 global-layout measurement
(SCALE.md: build 17.7 s once, in-query 9.39 s vs probe 2.62 s).

The in-query ``ivf_pq_residual_topk`` self-contains the coarse chain,
the corpus residual projection, AND the training of m residual
codebooks (a registered query must be a pure function of
(spark, sf_dir)); the layout pays all three once. Equality is
asserted before timing (probe rows == in-query rows at the build
params), then each form is timed on a fresh action.

Usage: python tools/bench_residual_layout.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def main() -> None:
    import shutil
    import tempfile

    from dev_dot_cvp_metadata_ingestion_spark.operators.similarity import (
        ivf_pq_residual_probe_topk,
        ivf_pq_residual_topk,
    )
    from dev_dot_cvp_metadata_ingestion_spark.session import get_spark
    from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
        write_ivf_pq_residual_layout,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 97 == 0).localCheckpoint()
    nq = queries.count()
    params = dict(n_cells=8, d=64, m=8, k_codebook=16)

    root = tempfile.mkdtemp(prefix="ivfpqres_bench_")
    layout = f"{root}/layout"
    try:
        t0 = time.time()
        write_ivf_pq_residual_layout(emb, layout, **params)
        t_build = time.time() - t0

        t0 = time.time()
        ref = ivf_pq_residual_topk(emb, queries, k=5, nprobe=2, **params)
        ref_rows = sorted(
            (r.q_id, r.vec_id, r.adc_dist, r.rank) for r in ref.collect()
        )
        t_inquery = time.time() - t0

        t0 = time.time()
        pre = ivf_pq_residual_probe_topk(spark, layout, queries, nprobe=2, k=5)
        pre_rows = sorted(
            (r.q_id, r.vec_id, r.adc_dist, r.rank) for r in pre.collect()
        )
        t_probe = time.time() - t0

        assert pre_rows == ref_rows and pre_rows, (
            len(pre_rows), len(ref_rows)
        )
        print(
            f"sf_dir={sf_dir} n_queries={nq} rows={len(pre_rows)}\n"
            f"build (once):  {t_build:6.2f} s\n"
            f"in-query:      {t_inquery:6.2f} s\n"
            f"probe:         {t_probe:6.2f} s\n"
            f"amortization:  {t_inquery / t_probe:6.2f}x per batch"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
