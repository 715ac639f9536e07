"""text_spelling_correction — SymSpell deletion-key matching. The
registered query is hash-oracled by the parity sweep; these pin the
matching GUARANTEE on a controlled corpus written as a documents
table: all three edit-1 types are found through key collision, the
argmax prefers the higher-count word with alphabetical tiebreak, and
dictionary words are never planted as typos."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dev_dot_cvp_metadata_ingestion_spark.plans import registry

registry.load_all()


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("spelling_sf")
    # counts: spark x10, park x5, sparks x2 — "spark"'s planted typo
    # "sark" is 1 insertion from "spark", 1 substitution from "park",
    # and 2 edits from "sparks"
    words = ["spark"] * 10 + ["park"] * 5 + ["sparks"] * 2
    text = " ".join(words)
    spark.createDataFrame(
        [(0, text, "en", "s", len(text))],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


def _result(spark, corpus_dir):
    rows = registry.QUERIES["text_spelling_correction"](
        spark, corpus_dir
    ).collect()
    return {r.typo: (r.correction, r.corr_count) for r in rows}


def test_planted_typos_resolve_to_argmax_correction(spark, corpus_dir):
    got = _result(spark, corpus_dir)
    # "sark" (from spark): candidates spark(10, insertion) and
    # park(5, substitution) — argmax picks spark; sparks is distance 2
    # and must NOT appear even though it key-collides
    assert got["sark"] == ("spark", 10)
    # "prk" (from park): only park is within distance 1
    assert got["prk"] == ("park", 5)
    # "sarks" (from sparks): sparks by insertion
    assert got["sarks"] == ("sparks", 2)
    assert set(got) == {"sark", "prk", "sarks"}


def test_typos_never_identical_to_dictionary_words(spark, corpus_dir):
    got = _result(spark, corpus_dir)
    assert all(t not in {"spark", "park", "sparks"} for t in got)
    assert all(c != t for t, (c, _) in got.items())
