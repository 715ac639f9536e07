"""Near-dup cluster representative selection: the kept member must be
the cluster's highest-quality doc (ties to smaller doc_id), member
counts must close, singletons represent themselves, and selection is
an aggregate — no window over the cluster."""

from __future__ import annotations

import pyspark.sql.functions as F

from dev_dot_cvp_metadata_ingestion_spark.plans import registry

registry.load_all()

Q = "dedup_cluster_representatives"


def _run(spark, rows, tmp_path):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return {
        r["cluster_id"]: r for r in registry.QUERIES[Q](spark, d).collect()
    }


def test_highest_quality_member_represents(spark, tmp_path):
    # docs 0-2 are near-identical (one token differs); doc 2 has extra
    # stopword-rich content → higher quality score, so it must win.
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    rows = [
        (0, base + "tail0", "en", "s", 1),
        (1, base + "tail1", "en", "s", 1),
        (2, base + "the of and to in is it for on the", "en", "s", 1),
        (9, "completely different text with nothing shared at all here", "en", "s", 1),
    ]
    out = _run(spark, rows, tmp_path)
    # cluster of 0/1/2 is labelled by min doc_id = 0
    assert 0 in out
    cluster = out[0]
    assert cluster["n_members"] == 3
    assert cluster["rep_id"] == 2  # stopword-rich member scores highest
    # singleton represents itself
    assert out[9]["rep_id"] == 9 and out[9]["n_members"] == 1


def test_tie_breaks_to_smaller_doc_id(spark, tmp_path):
    text = "mirror mirror on the wall who is the fairest of them all"
    rows = [(5, text, "en", "s", 1), (3, text, "en", "s", 1)]
    out = _run(spark, rows, tmp_path)
    assert list(out) == [3]
    assert out[3]["rep_id"] == 3 and out[3]["n_members"] == 2


def test_member_counts_close_over_corpus(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = registry.QUERIES[Q](spark, sf_dir)
    assert out.agg(F.sum("n_members")).first()[0] == d.count()
    # exactly one representative per cluster, reps are members
    assert out.select("cluster_id").distinct().count() == out.count()


def test_selection_is_aggregate_not_window(spark, sf_dir):
    plan = (
        registry.QUERIES[Q](spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the representative argmax must not introduce a Window node
    # (the CC labels themselves are window-free iterative joins)
    assert "min_by" in plan or "Window" not in plan
