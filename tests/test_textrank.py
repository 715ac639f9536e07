"""text_textrank_keywords — PageRank over the word co-occurrence
graph. The registered query is hash-oracled by the parity sweep; these
pin the SEMANTICS on a planted corpus: a connective hub word outranks
peripheral words, isolated words settle at the teleport floor, and
self-adjacent repetition creates no self-edge."""

from __future__ import annotations

from pyspark.sql import functions as F

from dev_dot_cvp_metadata_ingestion_spark.functions.text import (
    ascii_lower,
    tokens,
)
from dev_dot_cvp_metadata_ingestion_spark.operators.graph import pagerank


def _rank_words(spark, texts):
    docs = spark.createDataFrame([(t,) for t in texts], ["text"])
    toks = docs.select(tokens(ascii_lower(F.col("text"))).alias("t"))
    words = toks.select(F.explode("t").alias("word")).distinct()
    n = F.size("t")
    bg = (
        toks.filter(n >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("t", 1, n - 1).alias("w1"),
                    F.slice("t", 2, n - 1).alias("w2"),
                )
            ).alias("z")
        )
        .select(F.col("z.w1").alias("a"), F.col("z.w2").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("w1"), F.greatest("a", "b").alias("w2")
        )
        .distinct()
    )
    rows = pagerank(
        bg, words, id_col="word", a_col="w1", b_col="w2", iters=4
    ).collect()
    return {r.word: (r.pagerank_ppm, r.degree) for r in rows}


def test_hub_word_outranks_spokes(spark):
    # "core" is adjacent to every spoke; spokes only touch "core"
    got = _rank_words(
        spark, ["core alpha", "core beta", "core gamma", "core delta"]
    )
    assert got["core"][1] == 4
    for w in ("alpha", "beta", "gamma", "delta"):
        assert got[w][1] == 1
        assert got["core"][0] > got[w][0]


def test_isolated_word_sits_at_teleport_floor(spark):
    got = _rank_words(spark, ["pair words", "loner"])
    assert got["loner"] == (150000, 0)


def test_repetition_creates_no_self_edge(spark):
    got = _rank_words(spark, ["echo echo echo"])
    assert got["echo"] == (150000, 0)
