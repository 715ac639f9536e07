"""Integer-BM25 retrieval: scores match a plain-Python replica of the
same fixed-point algebra, single-term ordering is identical to
float log-idf BM25 (monotone transform), ties break by doc_id, and
absent terms contribute nothing."""

from __future__ import annotations

import math
import random

from dev_dot_cvp_metadata_ingestion_spark.operators.retrieval import bm25_topk

DOCS = [
    (0, "spark join join window"),
    (1, "spark spark spark filter sort"),
    (2, "window window window window filter"),
    (3, "vector sort sort join spark window"),
    (4, "filter"),
    (5, "the quick brown fox jumps over the lazy dog"),
]


def _replica(docs, queries, k=10):
    """Plain-Python restatement of the integer BM25 in
    operators/retrieval.py — same floor-division points, same order."""
    toks = {d: t.split() for d, t in docs}
    dl = {d: len(ws) for d, ws in toks.items()}
    n_docs = len(dl)
    t_tokens = sum(dl.values())
    terms = {t for _, t in queries}
    tf = {}
    for d, ws in toks.items():
        for w in ws:
            if w in terms:
                tf[(d, w)] = tf.get((d, w), 0) + 1
    df = {}
    for (d, w) in tf:
        df[w] = df.get(w, 0) + 1
    avgdl_milli = t_tokens * 1000 // n_docs
    scores = {}
    for q_id, term in queries:
        for (d, w), f in tf.items():
            if w != term:
                continue
            idf = ((n_docs - df[w]) * 2 + 1) * 1000000 // (df[w] * 2 + 1)
            norm = 250000 + (750000 * dl[d] * 1000) // avgdl_milli
            sat = (f * 2200000 * 1000000) // (
                f * 1000000 + (1200000 * norm) // 1000000
            )
            contrib = idf * sat // 1000000
            scores[(q_id, d)] = scores.get((q_id, d), 0) + contrib
    out = {}
    for (q_id, d), s in scores.items():
        out.setdefault(q_id, []).append((d, s))
    ranked = {}
    for q_id, rows in out.items():
        rows.sort(key=lambda x: (-x[1], x[0]))
        ranked[q_id] = [
            (q_id, d, s, r + 1) for r, (d, s) in enumerate(rows[:k])
        ]
    return sorted(x for rows in ranked.values() for x in rows)


def _run(spark, docs, queries, k=10):
    d = spark.createDataFrame(docs, "doc_id long, text string")
    q = spark.createDataFrame(queries, "q_id long, term string")
    return sorted(
        (r.q_id, r.doc_id, r.score_ppm, r.rank)
        for r in bm25_topk(d, q, k=k).collect()
    )


def test_matches_python_replica(spark):
    queries = [(1, "spark"), (1, "join"), (2, "window"), (3, "vector")]
    assert _run(spark, DOCS, queries) == _replica(DOCS, queries)


def test_matches_replica_randomized(spark):
    rng = random.Random(47)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(1, 12))))
        for i in range(40)
    ]
    queries = [(1, "aa"), (1, "bb"), (2, "cc"), (2, "dd"), (2, "ee")]
    assert _run(spark, docs, queries, k=7) == _replica(docs, queries, k=7)


def test_single_term_order_equals_log_idf_bm25(spark):
    """For one term the integer odds-ratio idf is a per-query constant,
    so ranking must equal textbook log-idf BM25 (float) exactly."""
    queries = [(9, "window")]
    got = [
        (d, r)
        for (_, d, _, r) in sorted(
            _run(spark, DOCS, queries), key=lambda x: x[3]
        )
    ]
    # float reference
    toks = {d: t.split() for d, t in DOCS}
    dl = {d: len(ws) for d, ws in toks.items()}
    n, avg = len(dl), sum(dl.values()) / len(dl)
    dfw = sum(1 for ws in toks.values() if "window" in ws)
    idf = math.log(1 + (n - dfw + 0.5) / (dfw + 0.5))
    ref = []
    for d, ws in toks.items():
        f = ws.count("window")
        if not f:
            continue
        s = idf * f * 2.2 / (f + 1.2 * (0.25 + 0.75 * dl[d] / avg))
        ref.append((d, s))
    ref.sort(key=lambda x: (-x[1], x[0]))
    assert got == [(d, i + 1) for i, (d, _) in enumerate(ref)]


def test_absent_term_returns_nothing(spark):
    assert _run(spark, DOCS, [(5, "nonexistent")]) == []


def test_tie_break_by_doc_id(spark):
    docs = [(10, "zz yy"), (11, "zz yy"), (12, "zz yy")]
    rows = _run(spark, docs, [(1, "zz")])
    assert [(d, r) for (_, d, _, r) in rows] == [(10, 1), (11, 2), (12, 3)]
    # identical docs → identical scores
    assert len({s for (_, _, s, _) in rows}) == 1


def test_conjunctive_is_and_filtered_disjunctive(spark):
    """Conjunctive ranking == disjunctive scoring restricted to docs
    containing every query term, re-ranked (scores unchanged)."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.retrieval import (
        bm25_topk_conjunctive,
    )

    queries = [(1, "spark"), (1, "join"), (2, "window"), (2, "filter")]
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(queries, "q_id long, term string")
    got = sorted(
        (r.q_id, r.doc_id, r.score_ppm, r.rank)
        for r in bm25_topk_conjunctive(d, q, k=10).collect()
    )
    # reference: disjunctive replica + AND filter + re-rank
    full = _replica(DOCS, queries, k=100)
    toks = {dd: t.split() for dd, t in DOCS}
    qterms = {}
    for q_id, t in queries:
        qterms.setdefault(q_id, set()).add(t)
    kept = [
        (q_id, dd, s)
        for (q_id, dd, s, _) in full
        if qterms[q_id] <= set(toks[dd])
    ]
    expect = []
    for q_id in sorted({x[0] for x in kept}):
        rows = sorted(
            [(dd, s) for qq, dd, s in kept if qq == q_id],
            key=lambda x: (-x[1], x[0]),
        )
        expect += [(q_id, dd, s, r + 1) for r, (dd, s) in enumerate(rows)]
    assert got == sorted(expect)
    # q1 = spark AND join: docs 0 and 3 contain both, doc 1 lacks join
    assert {dd for (qq, dd, _, _) in got if qq == 1} == {0, 3}


def test_rrf_fusion_matches_python(spark):
    """Fused ranking == plain-Python RRF over the two rankers'
    replica rankings (same floor weights, same tie order)."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_conjunctive,
        rrf_fuse,
    )

    queries = [(1, "spark"), (1, "join"), (2, "window"), (2, "filter")]
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(queries, "q_id long, term string")
    dis = bm25_topk(d, q, k=10)
    con = bm25_topk_conjunctive(d, q, k=10)
    got = sorted(
        (r.q_id, r.doc_id, r.rrf_micro, r.rank)
        for r in rrf_fuse([dis, con], k=10).collect()
    )

    scores = {}
    for df in (dis, con):
        for r in df.collect():
            key = (r.q_id, r.doc_id)
            scores[key] = scores.get(key, 0) + 1_000_000 // (60 + r.rank)
    expect = []
    by_q = {}
    for (q_id, doc_id), s in scores.items():
        by_q.setdefault(q_id, []).append((doc_id, s))
    for q_id, rows in by_q.items():
        rows.sort(key=lambda x: (-x[1], x[0]))
        expect += [
            (q_id, doc_id, s, i + 1) for i, (doc_id, s) in enumerate(rows[:10])
        ]
    assert got == sorted(expect)
    # a doc present in BOTH rankings outscores one present in only one
    # at comparable ranks: doc 3 (spark AND join) must beat doc 1
    # (spark only) for q1
    q1 = {doc: rk for (qq, doc, _, rk) in got if qq == 1}
    assert q1[3] < q1[1]


def test_contrib_headroom_no_int64_wrap(spark):
    """ADVICE r9 regression: the naive idf_ppm * tf_factor product
    wraps int64 once n_docs/df exceeds ~6.3e6 (rare term in a >=1e7
    doc corpus). The split-multiplication identity
    floor(a*b/1e6) == (a div 1e6)*b + ((a mod 1e6)*b) div 1e6
    must match exact Python integers (which never wrap) at magnitudes
    far past the old wrap point, up to the documented ~4e12 bound."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.retrieval import (
        _CONTRIB,
    )
    from pyspark.sql import functions as F

    cases = [
        # (n_docs, df, tf, dl, t_tokens)
        (10_000_000, 1, 5, 100, 2_000_000_000),      # old wrap point
        (1_000_000_000, 1, 3, 50, 500_000_000_000),  # 1e9 docs, df=1
        (100_000_000_000, 2, 7, 400, 50_000_000_000_000),  # ~100 TB
        (4_000_000_000_000, 1, 1, 1, 4_000_000_000_000),   # doc bound
        (10_000_000, 9_999_999, 2, 10, 2_000_000_000),     # stop term
    ]
    df_in = spark.createDataFrame(
        cases, "n_docs long, df long, tf long, dl long, t_tokens long"
    )
    got = [
        r.contrib
        for r in df_in.select(F.expr(_CONTRIB).alias("contrib"))
        .collect()
    ]

    def py(n_docs, df, tf, dl, t_tokens):
        idf = ((n_docs - df) * 2 + 1) * 1000000 // (df * 2 + 1)
        avgdl_milli = t_tokens * 1000 // n_docs
        norm = 250000 + (750000 * dl * 1000) // avgdl_milli
        sat = (tf * 2200000 * 1000000) // (
            tf * 1000000 + (1200000 * norm) // 1000000
        )
        return idf * sat // 1000000  # Python ints: exact, no wrap

    want = [py(*c) for c in cases]
    assert got == want, list(zip(cases, got, want))
    # every expected value is non-negative and within int64 — the
    # documented headroom holds at these magnitudes (a stop-grade
    # term with df ~ n_docs floors idf_ppm, hence contrib, to 0)
    assert all(0 <= w < 2**63 for w in want)
    assert want[-1] == 0 and all(w > 0 for w in want[:-1])


def _phrase_rows(spark, docs, phrases, k=10):
    from dev_dot_cvp_metadata_ingestion_spark.operators.retrieval import (
        phrase_search_topk,
    )
    from pyspark.sql import functions as F2  # noqa: F401

    d = spark.createDataFrame(docs, "doc_id long, text string")
    p = spark.createDataFrame(phrases, "q_id long, term_pos long, term string")
    return sorted(
        (r.q_id, r.doc_id, r.n_occurrences, r.rank)
        for r in phrase_search_topk(d, p, k=k).collect()
    )


def _phrase_replica(docs, phrases, k=10):
    from collections import defaultdict

    byq = defaultdict(list)
    for q_id, term_pos, term in phrases:
        byq[q_id].append((term_pos, term))
    out = []
    for q_id, terms in byq.items():
        terms.sort()
        seq = [t for _, t in terms]
        scores = []
        for doc_id, text in docs:
            toks = text.split()
            n = sum(
                1
                for s in range(len(toks) - len(seq) + 1)
                if toks[s : s + len(seq)] == seq
            )
            if n:
                scores.append((doc_id, n))
        scores.sort(key=lambda x: (-x[1], x[0]))
        out += [
            (q_id, d, n, r + 1) for r, (d, n) in enumerate(scores[:k])
        ]
    return sorted(out)


def test_phrase_search_matches_replica(spark):
    docs = [
        (0, "spark join spark join window"),
        (1, "spark window join"),
        (2, "a a a a"),
        (3, "join spark"),
        (4, "the spark join the"),
    ]
    phrases = [
        (1, 1, "spark"), (1, 2, "join"),
        (2, 1, "a"), (2, 2, "a"),          # duplicate term, overlaps
        (3, 1, "join"), (3, 2, "window"),
    ]
    got = _phrase_rows(spark, docs, phrases)
    want = _phrase_replica(docs, phrases)
    assert got == want
    # overlapping occurrences counted: "a a a a" has 3 starts of "a a"
    assert (2, 2, 3, 1) in got
    # adjacency required, not co-occurrence: doc 1 has spark and join
    # but never adjacent
    assert not any(q == 1 and d == 1 for q, d, *_ in got)


def test_phrase_search_randomized_replica(spark):
    import random

    rnd = random.Random(7)
    vocab = ["a", "b", "c", "d"]
    docs = [
        (i, " ".join(rnd.choice(vocab) for _ in range(30))) for i in range(40)
    ]
    phrases = [
        (1, 1, "a"), (1, 2, "b"),
        (2, 1, "c"), (2, 2, "c"), (2, 3, "d"),
        (3, 1, "b"),
    ]
    assert _phrase_rows(spark, docs, phrases, k=7) == _phrase_replica(
        docs, phrases, k=7
    )


# r16 fast-tier split (VERDICT r15 item 3): this module is in the SLOW
# tier — long layout/stream/property sweeps excluded from the default
# `-m "not slow"` run (pytest.ini) so the driver's verify-window pytest
# completes; run the FULL suite with `pytest -m ""`.
import pytest as _pytest_r16

pytestmark = _pytest_r16.mark.slow
