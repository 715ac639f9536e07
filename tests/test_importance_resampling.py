"""DSIR-shaped importance resampling: docs whose hashed-bigram mass
sits in target-heavy buckets must score above parity and be kept;
docs whose features only ever appear in the raw/non-target mass must
fall below parity; featureless docs are never kept; ratios are
clamped; the model side of the plan is a broadcast."""

from __future__ import annotations

import pyspark.sql.functions as F

from dev_dot_cvp_metadata_ingestion_spark.plans import registry

registry.load_all()

Q = "documents_importance_resampled"


def _run(spark, rows, tmp_path):
    """Write a documents table and run the registered query on it."""
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return {
        r["doc_id"]: r for r in registry.QUERIES[Q](spark, d).collect()
    }


def test_target_like_doc_kept_offtarget_dropped(spark, tmp_path):
    # target (en) docs establish the target distribution over bigrams
    # "aa bb" etc.; doc 10 (non-en) reuses EXACTLY the en bigrams so
    # its every bucket is target-heavy; doc 11 uses bigrams seen only
    # in non-en docs, so its buckets carry zero target mass.
    # enough mass that the +1024 Laplace floor doesn't swamp the
    # distributions (at corpus scale smoothing is negligible; a
    # 6-row corpus would be all smoothing)
    en_text = "aa bb cc dd ee ff"
    zh_only = "zz yy xx ww vv uu"
    rows = (
        [(i, en_text, "en", "s", 1) for i in range(300)]
        + [(1000, en_text, "zh", "s", 1)]
        + [(2000 + i, zh_only, "zh", "s", 1) for i in range(300)]
    )
    out = _run(spark, rows, tmp_path)
    assert out[1000]["kept"] is True
    assert out[1000]["mean_ratio_ppm"] > 1_000_000
    assert out[2000]["kept"] is False
    assert out[2000]["mean_ratio_ppm"] < 1_000_000
    # the target docs themselves score target-like
    assert out[0]["kept"] is True


def test_featureless_docs_never_kept(spark, tmp_path):
    rows = [
        (0, "aa bb cc", "en", "s", 1),
        (1, "single", "en", "s", 1),  # 1 token -> 0 bigrams
        (2, "", "zh", "s", 1),
    ]
    out = _run(spark, rows, tmp_path)
    for i in (1, 2):
        assert out[i]["n_bigrams"] == 0
        assert out[i]["weight_ppm"] == 0
        assert out[i]["kept"] is False


def test_ratio_clip_bounds_weights(spark, tmp_path):
    # extreme target concentration: per-bucket ratio is clipped at
    # 1e9 ppm (1000x), so weight_ppm <= n_bigrams * 1e9 always holds
    rows = [(i, "aa bb cc dd", "en", "s", 1) for i in range(50)] + [
        (99, "qq rr", "zh", "s", 1)
    ]
    out = _run(spark, rows, tmp_path)
    for r in out.values():
        assert r["weight_ppm"] <= r["n_bigrams"] * 1_000_000_000


def test_model_is_broadcast_no_corpus_broadcast(spark, sf_dir):
    """The 1024-row ratio table must reach the scoring join as a
    broadcast; the plan must contain at least one broadcast join and
    the explode->bucket aggregate must partial-aggregate map-side."""
    plan = (
        registry.QUERIES[Q](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # two-phase hash aggregation on the bucket counts
    assert plan.count("HashAggregate") >= 2
