"""SimHash banded pairs: the 4-band candidate scheme must find EVERY
pair within hamming <= 3 (pigeonhole guarantee, verified against an
all-pairs brute force over the real corpus), report exact distances,
and never report a pair beyond the threshold."""

from __future__ import annotations

import itertools

import pyspark.sql.functions as F
import pytest

from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
    simhash60,
    simhash_pairs,
)


def test_matches_brute_force_over_corpus(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hashes = {
        r["doc_id"]: r["simhash"]
        for r in simhash60(d, "doc_id", "text").collect()
    }
    expect = {
        (a, b): bin(hashes[a] ^ hashes[b]).count("1")
        for a, b in itertools.combinations(sorted(hashes), 2)
        if bin(hashes[a] ^ hashes[b]).count("1") <= 3
    }
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["hamming"]
        for r in simhash_pairs(d, "doc_id", "text", max_hamming=3).collect()
    }
    assert got == expect


def test_beyond_guarantee_raises(spark):
    d = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_pairs(d, "doc_id", "text", max_hamming=4)


def test_identical_docs_distance_zero(spark):
    text = "the quick brown fox jumps over the lazy dog"
    d = spark.createDataFrame(
        [(0, text), (1, text), (2, "entirely different words everywhere")],
        "doc_id long, text string",
    )
    rows = simhash_pairs(d, "doc_id", "text").collect()
    pairs = {(r["doc_id_a"], r["doc_id_b"]): r["hamming"] for r in rows}
    assert pairs.get((0, 1)) == 0
