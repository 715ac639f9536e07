"""Focused value-neutrality pins for the r16 optimizations: each
changed operator internal must produce row-identical results with the
optimization on and off (the hash oracle pins the registered forms;
these pin the operator-level equivalences directly)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_curated_plan_ckpt_pin_matches_pure(spark, sf_dir):
    # r16: the default pin is localCheckpoint at the diamond
    # boundaries; it must be row-identical to the pass-through form
    from dev_dot_cvp_metadata_ingestion_spark.plans.datapipe import (
        _curated_plan,
    )
    from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
        load_table,
    )

    d = load_table(spark, sf_dir, "documents")
    ckpt = _rows(_curated_plan(d))
    pure = _rows(_curated_plan(d, pin=lambda df: df))
    assert ckpt == pure and len(ckpt) > 0


def test_knn_join_rebalance_is_value_neutral(spark, sf_dir):
    # r16: knn_join rebalances the corpus side of the broadcast-query
    # scoring pass; the result (incl. the float cosine, computed
    # per-row by the same sequential fold) must not depend on the
    # input partitioning
    from dev_dot_cvp_metadata_ingestion_spark.operators.similarity import (
        knn_join,
    )
    from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
        load_table,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3)
    one = _rows(knn_join(e.coalesce(1), q, k=4))
    many = _rows(knn_join(e.repartition(13), q, k=4))
    assert one == many and len(one) == 3 * 4


def test_grouped_kmeans_x_ckpt_is_value_neutral(spark, sf_dir):
    # r16: kmeans_assign_grouped materializes its long-form input once
    # (rebalanced localCheckpoint); assignments and centroids must be
    # identical to training over the raw un-materialized relation —
    # pinned against the plain per-subspace trainer like the r15
    # equivalence test, but across input partitionings
    from dev_dot_cvp_metadata_ingestion_spark.operators.similarity import (
        _pq_long_form,
        kmeans_assign_grouped,
    )
    from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
        load_table,
    )

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 64)
    lf1 = _pq_long_form(
        e.coalesce(1), d=64, m=4, id_out="vec_id",
        vec_col="embedding", scale=10_000_000,
    )
    lf2 = _pq_long_form(
        e.repartition(7), d=64, m=4, id_out="vec_id",
        vec_col="embedding", scale=10_000_000,
    )
    a1, c1 = kmeans_assign_grouped(lf1, k=4, iters=2)
    a2, c2 = kmeans_assign_grouped(lf2, k=4, iters=2)
    assert _rows(a1.select("subspace", "vec_id", "cluster", "dist")) == _rows(
        a2.select("subspace", "vec_id", "cluster", "dist")
    )
    assert _rows(c1) == _rows(c2)
