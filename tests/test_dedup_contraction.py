"""Exact-contraction CC must equal plain CC — including on a corpus
with injected exact-duplicate groups, where contraction actually
collapses something (the testdata corpora are nearly dup-free)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
    clusters_with_exact_contraction,
    connected_components,
    lsh_near_duplicates,
)
from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import load_table

from .conftest import SF_SMOKE


def _dup_injected(spark):
    base = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    # 3 exact copies of every 7th doc, plus byte-identical twins of two
    # near-dup partners, so contracted groups participate in near-dup
    # components too
    dups = (
        base.filter(F.col("doc_id") % 7 == 0)
        .crossJoin(spark.range(1, 4).withColumnRenamed("id", "copy"))
        .select(
            (F.col("doc_id") + F.col("copy") * 100000).alias("doc_id"),
            "text",
        )
    )
    return base.unionByName(dups)


def test_contracted_clusters_equal_plain(spark):
    docs = _dup_injected(spark).localCheckpoint()
    plain = connected_components(
        lsh_near_duplicates(docs, "doc_id", "text", num_hashes=8, n=3,
                            threshold=0.3),
        docs.select("doc_id"),
    )
    contracted = clusters_with_exact_contraction(
        docs, "doc_id", "text", num_hashes=8, n=3, threshold=0.3
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, contracted.collect()))
    assert a == b
    # sanity: the injected copies actually cluster with their original
    lab = dict(b)
    originals = [i for i in lab if i < 100000 and i % 7 == 0]
    assert originals
    for o in originals:
        assert lab[o + 100000] == lab[o] == lab[o + 300000]


def test_contraction_shrinks_lsh_input(spark):
    """The point of the operator: the LSH stage sees one rep per exact
    group, not every copy."""
    docs = _dup_injected(spark)
    n_docs = docs.count()
    n_reps = (
        docs.select(
            F.md5(
                F.concat_ws(
                    "\x1f",
                    F.filter(F.split("text", r"\s+"), lambda t: t != ""),
                )
            ).alias("k")
        )
        .distinct()
        .count()
    )
    assert n_reps < n_docs


def test_capped_ngram_pairs_semantics(spark):
    """The stop-gram cap must (1) equal the uncapped form when no gram
    exceeds the cap, (2) drop ONLY pairs whose every shared gram is
    ubiquitous, while still reporting EXACT similarity for kept pairs
    (full-array verify, not capped-posting counts)."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_capped,
    )

    hot = "common boiler plate sentence"
    rows = [
        # a near-dup pair sharing plenty of cold grams (plus the hot
        # sentence, so its exact jaccard INCLUDES hot grams)
        (1, hot + " unique alpha beta gamma delta", "s"),
        (2, hot + " unique alpha beta gamma epsilon", "s"),
        # docs related ONLY through the hot sentence — capped must drop
        (3, hot + " zeta eta", "s"),
        (4, hot + " theta iota", "s"),
        (5, hot + " kappa lmbda", "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    uncapped = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", "source", n=2, threshold=0.05
        ).collect()
    }
    capped = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in ngram_jaccard_pairs_capped(
            docs, "doc_id", "text", "source", n=2, threshold=0.05,
            max_doc_freq=4,
        ).collect()
    }
    # cap=4 makes the 5-doc hot bigrams ubiquitous: boilerplate-only
    # pairs disappear, the real near-dup pair stays with its EXACT
    # (hot-gram-inclusive) jaccard
    assert (1, 2) in capped
    assert capped[(1, 2)] == uncapped[(1, 2)]
    assert all(a == 1 and b == 2 for (a, b) in capped)
    assert (3, 4) in uncapped  # sanity: uncapped did pair them
    # cap high enough -> identical output
    relaxed = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in ngram_jaccard_pairs_capped(
            docs, "doc_id", "text", "source", n=2, threshold=0.05,
            max_doc_freq=100,
        ).collect()
    }
    assert relaxed == uncapped


# r16 fast-tier split (VERDICT r15 item 3): this module is in the SLOW
# tier — long layout/stream/property sweeps excluded from the default
# `-m "not slow"` run (pytest.ini) so the driver's verify-window pytest
# completes; run the FULL suite with `pytest -m ""`.
import pytest as _pytest_r16

pytestmark = _pytest_r16.mark.slow
