"""Gopher rule battery: each rule must fire on a planted violation and
pass on a compliant doc; the plan must be a zero-shuffle projection."""

from __future__ import annotations

import pyspark.sql.functions as F

from dev_dot_cvp_metadata_ingestion_spark.plans import registry

registry.load_all()

Q = "documents_gopher_rules"

# 72 words, mean word length 4.17 (the all-short-words version of this
# fixture scored 2.81 and legitimately FAILED the mean-length rule),
# no symbols, 5 distinct stopword hits
GOOD = (
    "the quick brown foxes jumped over those lazy sleeping dogs "
    "while it is raining for all of us " * 4
).strip()


def _run(spark, rows, tmp_path):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return {r["doc_id"]: r for r in registry.QUERIES[Q](spark, d).collect()}


def test_each_rule_fires_on_its_violation(spark, tmp_path):
    rows = [
        (0, GOOD, "en", "s", 1),
        (1, "too short", "en", "s", 1),                       # word count
        (2, " ".join(["xx"] * 60), "en", "s", 1),             # mean len < 3
        (3, GOOD + " " + "#" * 1 + " #### ## # # # # # #", "en", "s", 1),  # symbols
        (4, " ".join(["12345"] * 60), "en", "s", 1),          # alpha fraction
        (5, " ".join(["alpha"] * 60), "en", "s", 1),          # stopwords < 2
    ]
    out = _run(spark, rows, tmp_path)
    assert out[0]["gopher_pass"] is True
    assert out[1]["rule_word_count"] is False
    assert out[2]["rule_mean_word_length"] is False
    assert out[3]["rule_symbol_ratio"] is False
    assert out[4]["rule_alpha_fraction"] is False
    assert out[5]["rule_stopwords"] is False
    for i in range(1, 6):
        assert out[i]["gopher_pass"] is False


def test_plan_is_zero_shuffle_projection(spark, sf_dir):
    plan = (
        registry.QUERIES[Q](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
