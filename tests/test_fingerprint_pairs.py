"""operators/dedup.py:fingerprint_set_jaccard_pairs — the
modality-agnostic posting-list Jaccard tail (video frames, winnowed
fingerprints, audio chunks all ride it). Pins exact set semantics on
hand-built posting relations and the real-decode video path's
agreement with the registered fake-form query's scoring."""

from __future__ import annotations

from pyspark.sql import functions as F

from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
    fingerprint_set_jaccard_pairs,
)


def _posts(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "fingerprint"])


def test_identical_sets_score_one(spark):
    got = fingerprint_set_jaccard_pairs(
        _posts(spark, [(1, "a"), (1, "b"), (2, "a"), (2, "b")])
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.doc_id_a, r.doc_id_b) == (1, 2)
    assert (r.shared, r.size_a, r.size_b, r.jaccard) == (2, 2, 2, 1.0)


def test_partial_overlap_exact_ratio(spark):
    # {a,b,c,d} vs {b,c,d,e}: 3 / 5
    rows = [(1, x) for x in "abcd"] + [(2, x) for x in "bcde"]
    got = fingerprint_set_jaccard_pairs(
        _posts(spark, rows), threshold=0.0
    ).collect()
    assert len(got) == 1
    assert got[0].jaccard == 0.6


def test_duplicate_postings_collapse_to_sets(spark):
    # repeated (doc, fp) rows must not inflate counts
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "a")]
    got = fingerprint_set_jaccard_pairs(
        _posts(spark, rows), threshold=0.0
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.shared, r.size_a, r.size_b) == (1, 2, 1)
    assert r.jaccard == 0.5


def test_threshold_excludes_weak_pairs(spark):
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "x"), (2, "y")]
    # jaccard = 1/5 = 0.2
    assert (
        fingerprint_set_jaccard_pairs(
            _posts(spark, rows), threshold=0.25
        ).count()
        == 0
    )


def test_disjoint_sets_produce_no_pair(spark):
    rows = [(1, "a"), (2, "b")]
    assert (
        fingerprint_set_jaccard_pairs(
            _posts(spark, rows), threshold=0.0
        ).count()
        == 0
    )


def test_custom_id_column_name(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a")], ["vid", "fingerprint"])
    got = fingerprint_set_jaccard_pairs(df, id_col="vid").collect()
    assert got[0].asDict() == {
        "vid_a": 1,
        "vid_b": 2,
        "shared": 1,
        "size_a": 1,
        "size_b": 1,
        "jaccard": 1.0,
    }


def test_weighted_jaccard_matches_python_model(spark, sf_dir):
    # dedup_tfidf_weighted_jaccard vs a plain-Python tf-idf-lift
    # Ruzicka recomputation at sf0.001 (threshold dropped to 0 via the
    # registered query's own filter being >= 0.5: we recompute only
    # the emitted rows' values)
    from collections import Counter

    from dev_dot_cvp_metadata_ingestion_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["dedup_tfidf_weighted_jaccard"](
        spark, sf_dir
    ).collect()
    assert rows, "sf0.001 weighted-jaccard pairs unexpectedly empty"

    docs = {
        r.doc_id: (r.source, [w for w in r.text.split() if w])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    n_docs = len(docs)
    df = Counter()
    tf = {}
    for did, (_, toks) in docs.items():
        c = Counter(toks)
        tf[did] = c
        df.update(c.keys())

    def weights(did):
        return {
            t: c * ((n_docs * 1000000) // df[t]) for t, c in tf[did].items()
        }

    for r in rows:
        wa, wb = weights(r.doc_id_a), weights(r.doc_id_b)
        smin = sum(min(wa[t], wb[t]) for t in wa.keys() & wb.keys())
        want = smin / (sum(wa.values()) + sum(wb.values()) - smin)
        assert abs(r.wjaccard - want) < 1e-12
        assert want >= 0.5
        assert docs[r.doc_id_a][0] == docs[r.doc_id_b][0] == r.block
