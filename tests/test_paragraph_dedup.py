"""First-occurrence segment dedup (C4 span rule): the first copy of a
repeated segment must survive at its min-(doc_id, pos) site, every
later copy must vanish, singletons are untouched, and the plan must
not broadcast the corpus-sized firsts relation."""

from __future__ import annotations

import pyspark.sql.functions as F

from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
    segment_first_occurrence_dedup,
)

SHARED = "the quick brown fox jumps over the lazy dog again"  # 10 tokens
UNIQUE = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    "one two three four five six seven eight nine ten",
    "red orange yellow green blue indigo violet black white gray",
]


def test_first_copy_survives_later_copies_removed(spark):
    # doc 0 carries the segment first; docs 1 and 2 repeat it
    rows = [
        (0, f"{SHARED} {UNIQUE[0]}"),
        (1, f"{UNIQUE[1]} {SHARED}"),
        (2, f"{SHARED} {UNIQUE[2]}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in segment_first_occurrence_dedup(
            df, "doc_id", "text", seg_tokens=10
        ).collect()
    }
    assert out[0]["text_clean"] == f"{SHARED} {UNIQUE[0]}"
    assert out[0]["n_removed"] == 0
    assert out[1]["text_clean"] == UNIQUE[1] and out[1]["n_removed"] == 1
    assert out[2]["text_clean"] == UNIQUE[2] and out[2]["n_removed"] == 1


def test_within_doc_repeat_keeps_earliest_position(spark):
    # the same segment twice INSIDE one doc: pos 0 survives, pos 1 goes
    df = spark.createDataFrame(
        [(0, f"{SHARED} {SHARED}")], "doc_id long, text string"
    )
    r = segment_first_occurrence_dedup(df, "doc_id", "text", 10).first()
    assert r["text_clean"] == SHARED
    assert r["n_segments"] == 2 and r["n_removed"] == 1


def test_singletons_and_empty_doc_untouched(spark):
    rows = [(0, UNIQUE[0]), (1, UNIQUE[1]), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in segment_first_occurrence_dedup(df, "doc_id", "text", 10).collect()
    }
    assert out[0]["text_clean"] == UNIQUE[0] and out[0]["n_removed"] == 0
    assert out[1]["text_clean"] == UNIQUE[1] and out[1]["n_removed"] == 0
    assert out[2]["text_clean"] == "" and out[2]["n_segments"] == 0


def test_order_preserved_around_removed_middle(spark):
    # 30 tokens: unique / shared / unique — the shared middle is a
    # repeat of doc 0's opener, so doc 1 keeps its flanks in order
    a = f"{SHARED} {UNIQUE[0]} {UNIQUE[1]}"
    b = f"{UNIQUE[2]} {SHARED} {UNIQUE[1]}"
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in segment_first_occurrence_dedup(df, "doc_id", "text", 10).collect()
    }
    assert out[0]["n_removed"] == 0
    # doc 1: SHARED (seen in doc 0) and UNIQUE[1] (seen in doc 0) go
    assert out[1]["text_clean"] == UNIQUE[2]
    assert out[1]["n_segments"] == 3 and out[1]["n_removed"] == 2


def test_total_mass_conserved(spark, sf_dir):
    """Segment accounting closes: kept + removed == total segments, and
    every distinct segment survives exactly once corpus-wide."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = segment_first_occurrence_dedup(d, "doc_id", "text", 10)
    agg = out.agg(
        F.sum("n_segments").alias("total"), F.sum("n_removed").alias("rm")
    ).first()
    from dev_dot_cvp_metadata_ingestion_spark.functions.text import tokens

    n_distinct = (
        d.select(
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.greatest(
                            F.ceil(F.size(tokens(F.col("text"))) / 10.0)
                            .cast("int")
                            - 1,
                            F.lit(0),
                        ),
                    ),
                    lambda i: F.concat_ws(
                        " ", F.slice(tokens(F.col("text")), i * 10 + 1, 10)
                    ),
                )
            ).alias("seg")
        )
        .filter(F.col("seg") != "")
        .distinct()
        .count()
    )
    assert agg["total"] - agg["rm"] == n_distinct


def test_firsts_join_is_not_broadcast(spark, sf_dir):
    """The firsts relation has one row per DISTINCT segment — corpus-
    sized, never broadcast-safe. Pin the shuffle join so a future
    'optimization' can't reintroduce a 100 TB broadcast."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        segment_first_occurrence_dedup(d, "doc_id", "text", 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" not in plan
