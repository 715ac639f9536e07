"""Segment-level boilerplate removal: hand-planted repeated segments
must vanish from every document, unique text must survive byte-for-
byte, and the hot-set side of the anti-join must be broadcast."""

from __future__ import annotations

import pyspark.sql.functions as F

from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
    segment_boilerplate_removal,
)

BOILER = "all rights reserved click here to subscribe now ok"  # 10 tokens
UNIQUE = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    "one two three four five six seven eight nine ten",
    "red orange yellow green blue indigo violet black white gray",
    "cat dog bird fish horse cow sheep goat pig duck",
]


def test_planted_boilerplate_removed_everywhere(spark):
    # 4 docs: each = its unique 10-token segment + the shared boilerplate
    rows = [(i, f"{UNIQUE[i]} {BOILER}") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in segment_boilerplate_removal(
            df, "doc_id", "text", seg_tokens=10, max_df=2
        ).collect()
    }
    for i in range(4):
        assert out[i]["text_clean"] == UNIQUE[i]
        assert out[i]["n_segments"] == 2
        assert out[i]["n_removed"] == 1


def test_below_threshold_segments_survive(spark):
    # boilerplate in only 2 docs with max_df=2: nothing removed
    rows = [(0, f"{UNIQUE[0]} {BOILER}"), (1, f"{UNIQUE[1]} {BOILER}")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = segment_boilerplate_removal(df, "doc_id", "text", 10, 2)
    assert out.agg(F.sum("n_removed")).first()[0] == 0


def test_all_boilerplate_doc_and_empty_doc(spark):
    rows = [
        (0, BOILER),
        (1, BOILER),
        (2, BOILER),
        (3, ""),
        (4, UNIQUE[0]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in segment_boilerplate_removal(df, "doc_id", "text", 10, 2).collect()
    }
    for i in range(3):  # every segment was hot -> empty clean text
        assert out[i]["text_clean"] == "" and out[i]["n_removed"] == 1
    assert out[3]["text_clean"] == "" and out[3]["n_segments"] == 0
    assert out[4]["text_clean"] == UNIQUE[0] and out[4]["n_removed"] == 0


def test_partial_tail_segment_and_order(spark):
    # 25 tokens -> segments of 10/10/5; middle segment planted hot
    mid = "shared shared shared shared shared shared shared shared shared shared"
    a = f"{UNIQUE[0]} {mid} front mid back tail end"
    b = f"{UNIQUE[1]} {mid} other words go right here"
    c = f"{UNIQUE[2]} {mid} more filler text sits here"
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in segment_boilerplate_removal(df, "doc_id", "text", 10, 2).collect()
    }
    assert out[0]["text_clean"] == f"{UNIQUE[0]} front mid back tail end"
    assert out[0]["n_segments"] == 3 and out[0]["n_removed"] == 1


def test_hot_set_join_is_shuffle_hash_and_no_doc_join(spark, sf_dir):
    """The ONLY join in the plan is the hot-set mark join, pinned to a
    SHUFFLED hash join (r16, ADVICE r15: the hot set grows with the
    corpus, so a forced broadcast is the corpus-derived-broadcast
    shape that OOMs at 100 TB — and the pinned shuffle measured
    faster than the broadcast locally anyway). Reassembly and removal
    counts still ride one groupBy, nothing doc-sized is broadcast,
    and the corpus parquet is scanned exactly twice (hot build +
    reassembly)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        segment_boilerplate_removal(d, "doc_id", "text", 10, 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Join") == 1 and "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert plan.count("Scan parquet") == 2
