"""CCNet-style perplexity buckets: tie safety, scoped-equals-pure,
and the scoped form's single-scan materialization."""

from __future__ import annotations

import pyspark.sql.functions as F

from dev_dot_cvp_metadata_ingestion_spark.plans import registry
from dev_dot_cvp_metadata_ingestion_spark.plans.datapipe import (
    perplexity_buckets_scoped,
)

registry.load_all()

SF = "/root/testdata/sf0.001"
Q = "documents_perplexity_buckets"


def test_equal_scores_share_a_bucket(spark):
    out = registry.QUERIES[Q](spark, SF)
    per_score = out.groupBy("lang", "score_fp").agg(
        F.countDistinct("bucket").alias("n")
    )
    assert per_score.filter(F.col("n") > 1).count() == 0


def test_thirds_are_roughly_balanced(spark):
    """With mostly-distinct scores each lang's head/middle/tail must
    each hold >= 1/6 of the lang's docs (exact thirds modulo ties)."""
    out = registry.QUERIES[Q](spark, SF)
    counts = {
        (r["lang"], r["bucket"]): r["c"]
        for r in out.groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    langs = {k[0] for k in counts}
    for lang in langs:
        n = sum(v for (lg, _), v in counts.items() if lg == lang)
        if n < 12:
            continue
        for b in ("head", "middle", "tail"):
            assert counts.get((lang, b), 0) >= n // 6, (lang, b, counts)


def test_scoped_equals_registered(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    ref = sorted(
        tuple(r) for r in registry.QUERIES[Q](spark, SF).collect()
    )
    with perplexity_buckets_scoped(d) as scoped:
        got = sorted(tuple(r) for r in scoped.collect())
        plan = scoped._jdf.queryExecution().executedPlan().toString()
    assert got == ref
    assert "InMemoryTableScan" in plan  # the diamonds are materialized
