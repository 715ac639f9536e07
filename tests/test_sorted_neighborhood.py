"""Sorted-neighborhood dedup (operators/dedup.py:
sorted_neighborhood_candidates and its two verifies).

The SNM contract worth pinning is the CANDIDATE SET, not just the
verified output: candidates are exactly the rank-adjacent pairs
(gap 1..window) under the prefix sort — planted prefix-aligned
near-dups must surface, docs more than `window` sort positions apart
must NOT, and blocks never mix. The two verifies are then pinned
against plain-Python recomputations (set Jaccard / classic DP
Levenshtein) on the candidate relation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
    sorted_neighborhood_candidates,
    sorted_neighborhood_edit_pairs,
    sorted_neighborhood_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def _py_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _py_bigram_jaccard(a: str, b: str) -> float:
    def sh(t):
        w = [x for x in t.split() if x]
        return {" ".join(w[i : i + 2]) for i in range(len(w) - 1)}

    sa, sb = sh(a), sh(b)
    i = len(sa & sb)
    return i / (len(sa) + len(sb) - i) if (sa or sb) else 0.0


def test_candidates_are_rank_adjacent_within_block(spark):
    # sort key = 24-char prefix: aaa* docs sort together, zzz* apart
    rows = [
        (1, "aaa alpha common tail words here", "s"),
        (2, "aaa alpha common tail words here too", "s"),
        (3, "mmm middle text entirely different", "s"),
        (4, "zzz omega far end of the ordering", "s"),
        (5, "aaa alpha common tail words herd", "t"),  # other block
    ]
    cand = sorted_neighborhood_candidates(
        _docs(spark, rows), "doc_id", "text", "source", window=1
    ).collect()
    got = {(r.block, r.doc_id_a, r.doc_id_b) for r in cand}
    # window=1: only sort-adjacent pairs; block t has a single doc
    assert got == {("s", 1, 2), ("s", 2, 3), ("s", 3, 4)}
    assert all(r.rank_gap == 1 for r in cand)


def test_window_bounds_candidate_count(spark):
    rows = [(i, f"{chr(97 + i)} word {i}", "s") for i in range(10)]
    for w in (1, 3, 5):
        n = sorted_neighborhood_candidates(
            _docs(spark, rows), "doc_id", "text", "source", window=w
        ).count()
        # exactly n*w minus the tail shortfall: sum_{g=1..w} (10-g)
        assert n == sum(10 - g for g in range(1, w + 1))


def test_planted_near_duplicates_surface(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (100, base, "s"),
        (101, base + " extra", "s"),  # same prefix -> sort-adjacent
        # far-away filler that can't sort between the two, with no
        # shared bigrams among fillers (each word unique per doc)
        *[(i, f"zz{i} w{i}a w{i}b w{i}c", "s") for i in range(20)],
    ]
    pairs = sorted_neighborhood_pairs(
        _docs(spark, rows), "doc_id", "text", "source", threshold=0.3
    ).collect()
    assert {(p.doc_id_a, p.doc_id_b) for p in pairs} == {(100, 101)}


def test_jaccard_matches_python_model(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = sorted_neighborhood_pairs(
        d, "doc_id", "text", "source", threshold=0.05
    )
    texts = {r.doc_id: r.text for r in d.select("doc_id", "text").collect()}
    rows = pairs.collect()
    assert rows, "sf0.001 SNM jaccard pairs unexpectedly empty"
    for r in rows:
        want = _py_bigram_jaccard(texts[r.doc_id_a], texts[r.doc_id_b])
        assert abs(r.jaccard - want) < 1e-12, (r.doc_id_a, r.doc_id_b)


def test_edit_distance_matches_python_model(spark):
    rows = [
        (1, "shared prefix one typo hxre", "s"),
        (2, "shared prefix one typo here", "s"),
        (3, "shared prefix but then a totally different long tail", "s"),
        (4, "unrelated start of sort order", "s"),
    ]
    got = sorted_neighborhood_edit_pairs(
        _docs(spark, rows), "doc_id", "text", "source", max_distance=1000
    ).collect()
    texts = dict((r[0], r[1]) for r in rows)
    assert got
    for r in got:
        assert r.edit_distance == _py_levenshtein(
            texts[r.doc_id_a], texts[r.doc_id_b]
        )


def test_edit_distance_threshold_filters(spark):
    rows = [
        (1, "aaa bbb ccc ddd", "s"),
        (2, "aaa bbb ccc dde", "s"),  # distance 1
        (3, "aaa completely different everything", "s"),
    ]
    got = sorted_neighborhood_edit_pairs(
        _docs(spark, rows), "doc_id", "text", "source", max_distance=2
    ).collect()
    assert {(r.doc_id_a, r.doc_id_b, r.edit_distance) for r in got} == {
        (1, 2, 1)
    }


def test_blocks_never_mix(spark):
    rows = [
        (1, "identical text", "s"),
        (2, "identical text", "t"),
    ]
    assert (
        sorted_neighborhood_candidates(
            _docs(spark, rows), "doc_id", "text", "source"
        ).count()
        == 0
    )


def test_candidate_plan_has_no_global_window(spark, sf_dir):
    # the rank window must be partitioned by block — a global window
    # (empty partition spec) would serialize the corpus onto one task
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = sorted_neighborhood_candidates(
        d, "doc_id", "text", "source", materialize=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            assert "block" in line, f"global window in SNM plan: {line}"


def test_multipass_catches_suffix_aligned_dups(spark):
    from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
        sorted_neighborhood_multipass_pairs,
    )

    shared_tail = "common ending words that dominate the bigram set"
    rows = [
        # corrupted FIRST token: pass 1 sorts these far apart, pass 2
        # (reversed key) sorts them adjacent
        (100, "aardvark " + shared_tail, "s"),
        (101, "zebra " + shared_tail, "s"),
        # filler with unique words, sorting between them in pass 1
        *[(i, f"m{i:02d} u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f", "s")
          for i in range(20)],
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    single = sorted_neighborhood_pairs(
        docs, "doc_id", "text", "source", threshold=0.5
    )
    multi = sorted_neighborhood_multipass_pairs(
        docs, "doc_id", "text", "source", threshold=0.5
    )
    assert (100, 101) not in {
        (r.doc_id_a, r.doc_id_b) for r in single.collect()
    }
    assert {(r.doc_id_a, r.doc_id_b) for r in multi.collect()} == {(100, 101)}


def test_multipass_verifies_each_pair_once(spark):
    from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
        sorted_neighborhood_multipass_pairs,
    )

    # identical docs are adjacent under BOTH keys; the union-distinct
    # must still emit the pair exactly once
    rows = [(1, "same text twice over", "s"), (2, "same text twice over", "s")]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = sorted_neighborhood_multipass_pairs(
        docs, "doc_id", "text", "source", threshold=0.5
    ).collect()
    assert [(r.doc_id_a, r.doc_id_b, r.jaccard) for r in got] == [(1, 2, 1.0)]


def test_match_scores_channels_disagree_correctly(spark):
    from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
        match_scores,
    )

    rows = [
        # word-order shuffle: token Jaccard high, edit similarity low
        (1, "alpha beta gamma delta epsilon zeta", "s"),
        (2, "zeta epsilon delta gamma beta alpha", "s"),
        # same prefix so they're SNM-adjacent in pass 1
        (3, "alpha beta gamma delta epsilon zets", "s"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {
        (r.doc_id_a, r.doc_id_b): r
        for r in match_scores(docs, "doc_id", "text", "source").collect()
    }
    # (1,3): one-char typo — both channels high, match
    r13 = got[(1, 3)]
    assert r13.edit_sim_ppm > 900000
    assert r13.is_match
    # (1,2): full reversal — unigram sets identical but BIGRAMS all
    # differ and characters are shuffled: both channels low, no match
    r12 = got[(1, 2)]
    assert r12.jaccard_ppm == 0
    assert not r12.is_match
    # integer mean pin
    for r in got.values():
        assert r.score_ppm == (r.jaccard_ppm + r.edit_sim_ppm) // 2


def test_match_scores_empty_bigram_union_is_no_evidence(spark):
    # review regression: two UNRELATED single-token docs (both bigram
    # sets empty) must not match — the token channel scores 0 on no
    # evidence, and edit similarity alone can't clear the threshold
    from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
        match_scores,
    )

    rows = [(1, "apple", "s"), (2, "zzzzz", "s")]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = match_scores(docs, "doc_id", "text", "source").collect()
    assert len(got) == 1
    r = got[0]
    assert r.jaccard_ppm == 0
    assert not r.is_match
    # identical short docs still match through the edit channel alone
    rows2 = [(1, "apple", "s"), (2, "apple", "s")]
    docs2 = spark.createDataFrame(rows2, ["doc_id", "text", "source"])
    r2 = match_scores(docs2, "doc_id", "text", "source").collect()[0]
    assert r2.edit_sim_ppm == 1000000 and r2.is_match
