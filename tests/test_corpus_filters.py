"""Edge-case semantics for the corpus-cleaning operators
(repetition filter, contamination sweep, quality gate, chunking,
packing) on crafted documents — empty text, single-token docs,
fully-repeated docs — which the sf testdata never exercises, plus
property-based pins against pure-Python models."""

from __future__ import annotations

import shutil
import tempfile
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()

DOCS = [
    (0, "", "en", "s0", 0),
    (1, "solo", "en", "s0", 4),
    (2, "alpha beta", "en", "s0", 10),
    (3, "x x x x x x", "en", "s0", 11),
    (4, "the quick brown fox jumps over the lazy dog again", "en", "s0", 50),
    (5, " ".join(f"w{i}" for i in range(40)), "en", "s0", 0),
]


@pytest.fixture(scope="module")
def doc_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("docs")
    spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_repetition_edge_cases(spark, doc_dir):
    rows = {
        r.doc_id: r
        for r in QUERIES["documents_repetition_filter"](spark, doc_dir).collect()
    }
    assert len(rows) == len(DOCS)

    empty = rows[0]  # no tokens: every signal must be the 0-identity
    assert empty.n_tokens == 0
    assert empty.dup_token_frac == 0.0
    assert empty.top_bigram_count == 0
    assert empty.top_bigram_frac == 0.0
    assert empty.keep

    assert rows[1].top_bigram_count == 0  # one token -> no bigrams

    two = rows[2]  # exactly one bigram, occurring once
    assert two.top_bigram_count == 1
    assert two.top_bigram_frac == 1.0
    assert not two.keep  # one dominant bigram is maximal repetition

    rep = rows[3]  # "x x x x x x": 6 tokens, 1 distinct, 5 equal bigrams
    assert rep.n_tokens == 6
    assert rep.dup_token_frac == pytest.approx(5 / 6)
    assert rep.top_bigram_count == 5
    assert rep.top_bigram_frac == 1.0
    assert not rep.keep

    nat = rows[4]  # natural sentence: 10 tokens, one repeated ("the")
    assert nat.dup_token_frac == pytest.approx(1 / 10)
    assert nat.top_bigram_count == 1


def test_chunking_stride_and_overlap(spark, doc_dir):
    rows = QUERIES["documents_chunked"](spark, doc_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)

    assert 0 not in by_doc  # zero-token doc emits zero chunks

    assert len(by_doc[1]) == 1
    assert by_doc[1][0].chunk_text == "solo"
    assert by_doc[1][0].n_chunk_tokens == 1

    # 40 tokens, chunk 32, stride 24 -> two chunks: [0..31], [24..39]
    c = sorted(by_doc[5], key=lambda r: r.chunk_id)
    assert [(r.chunk_id, r.start_pos, r.n_chunk_tokens) for r in c] == [
        (0, 0, 32),
        (1, 24, 16),
    ]
    # the 8-token overlap is the same text in both chunks
    assert c[0].chunk_text.split()[24:] == c[1].chunk_text.split()[:8]
    assert c[1].chunk_text.split()[-1] == "w39"


def test_packing_offsets_are_exclusive_cumsum(spark, doc_dir):
    rows = {
        r.doc_id: r for r in QUERIES["documents_packed"](spark, doc_dir).collect()
    }
    # all docs share source s0; doc_id order; token counts 0,1,2,6,10,40
    assert [rows[i].offset for i in range(6)] == [0, 0, 1, 3, 9, 19]
    assert rows[5].seq_id == 0  # offset 19 -> first 64-token sequence


# word-list texts: small alphabet so bigram repetition actually occurs
_wordy = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "é", "x"]), max_size=80
).map(" ".join)


@given(st.lists(_wordy, min_size=1, max_size=12))
@settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
def test_chunk_pack_repetition_models(spark, texts):
    docs = [(i, t, "en", f"s{i % 2}", len(t)) for i, t in enumerate(texts)]
    d = tempfile.mkdtemp(prefix="corpus_prop_")
    try:
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")

        toks = {i: t.split() for i, t, *_ in docs}
        toks = {i: [w for w in ws if w] for i, ws in toks.items()}

        # chunking: every chunk is exactly tokens[start:start+32] and the
        # start set is range(0, n, 24)
        chunks = QUERIES["documents_chunked"](spark, d).collect()
        starts = {}
        for r in chunks:
            t = toks[r.doc_id]
            assert r.start_pos == 24 * r.chunk_id
            assert r.chunk_text.split() == t[r.start_pos : r.start_pos + 32]
            assert r.n_chunk_tokens == len(t[r.start_pos : r.start_pos + 32])
            starts.setdefault(r.doc_id, set()).add(r.start_pos)
        for i, t in toks.items():
            expect = set(range(0, len(t), 24))
            assert starts.get(i, set()) == expect, i

        # packing: exclusive per-source cumsum in doc_id order
        packed = {r.doc_id: r for r in QUERIES["documents_packed"](spark, d).collect()}
        run = {}
        for i in sorted(toks):
            src = f"s{i % 2}"
            assert packed[i].offset == run.get(src, 0)
            assert packed[i].seq_id == run.get(src, 0) // 64
            run[src] = run.get(src, 0) + len(toks[i])

        # repetition signals against Counter models
        rep = {
            r.doc_id: r
            for r in QUERIES["documents_repetition_filter"](spark, d).collect()
        }
        for i, t in toks.items():
            r = rep[i]
            assert r.n_tokens == len(t)
            if t:
                assert r.dup_token_frac == pytest.approx(
                    (len(t) - len(set(t))) / len(t)
                )
            grams = Counter(zip(t, t[1:]))
            assert r.top_bigram_count == (max(grams.values()) if grams else 0)
            assert 0.0 <= r.top_bigram_frac <= 1.0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_scoped_curation_matches_pure(spark):
    # the persisted (production) form must return exactly the pure
    # query's rows and release its cache handles on exit
    from dev_dot_cvp_metadata_ingestion_spark.plans.datapipe import (
        curate_documents_scoped,
    )
    from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import load_table

    from .conftest import SF_SMOKE

    pure = QUERIES["documents_curated"](spark, SF_SMOKE).collect()
    d = load_table(spark, SF_SMOKE, "documents")
    with curate_documents_scoped(d) as cur:
        scoped = cur.collect()
    assert sorted(map(tuple, scoped)) == sorted(map(tuple, pure))
    # all pinned frames unpersisted: nothing left in the cache manager
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_scoped_funnel_single_pass_matches_pure(spark):
    # VERDICT r6 item 4: the production funnel must read documents ONCE
    # (persisted stage boundaries), not once per gate count, and return
    # exactly the pure (oracle-twin) funnel's rows
    from dev_dot_cvp_metadata_ingestion_spark.plans.datapipe import (
        curation_funnel_scoped,
    )
    from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import load_table

    from .conftest import SF_SMOKE

    pure = QUERIES["documents_curation_funnel"](spark, SF_SMOKE).collect()
    d = load_table(spark, SF_SMOKE, "documents")
    def walk(n):
        yield n
        it = n.children().iterator()
        while it.hasNext():
            yield from walk(it.next())

    with curation_funnel_scoped(d) as funnel:
        # every branch of the funnel reads a cached stage boundary:
        # the optimized plan's leaves are all InMemoryRelation, ZERO
        # direct parquet relations — the only parquet scan in the
        # whole computation is the one that materializes `scored`
        # inside its cache (clean/quality_pass caches chain off it)
        names = [
            n.nodeName()
            for n in walk(funnel._jdf.queryExecution().optimizedPlan())
        ]
        assert names.count("InMemoryRelation") >= 4, names
        assert not any("Relation" in n and n != "InMemoryRelation"
                       for n in names), names
        scoped = funnel.collect()
    assert sorted(map(tuple, scoped)) == sorted(map(tuple, pure))
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_approx_profile_tracks_exact(spark):
    # the bounded-state (100 TB) profile must agree with the exact one:
    # counts/sums/max exactly, percentiles within the local order-stat
    # gap (approx returns a data value, exact interpolates)
    from .conftest import SF_SMOKE

    exact = {r.lang: r for r in QUERIES["corpus_profile"](spark, SF_SMOKE).collect()}
    approx = {
        r.lang: r
        for r in QUERIES["corpus_profile_approx"](spark, SF_SMOKE).collect()
    }
    assert set(exact) == set(approx)
    for lang, e in exact.items():
        a = approx[lang]
        assert a.n_docs == e.n_docs
        assert a.total_tokens == e.total_tokens
        assert a.mean_tokens == e.mean_tokens
        assert a.max_chars == e.max_chars
        assert abs(a.p50_tokens - e.p50_tokens) <= 2
        assert abs(a.p95_tokens - e.p95_tokens) <= 2


def test_contamination_zero_gram_docs_are_clean(spark, doc_dir):
    # eval docs shorter than the gram width must appear with
    # n_grams = 0 and frac 0.0, not vanish from the report
    splits = {
        r.doc_id: r.split
        for r in QUERIES["documents_split"](spark, doc_dir).collect()
    }
    rows = {
        r.doc_id: r
        for r in QUERIES["documents_contamination"](spark, doc_dir).collect()
    }
    eval_ids = {i for i, s in splits.items() if s != "train"}
    assert set(rows) == eval_ids
    for i, r in rows.items():
        if r.n_grams == 0:
            assert r.n_contaminated == 0
            assert r.contamination_frac == 0.0
        assert 0.0 <= r.contamination_frac <= 1.0


def test_vocab_sketch_tracks_exact(spark):
    """corpus_vocab_by_source_approx must estimate every per-source
    vocabulary and the sketch-union total within HLL error (lgK=12 →
    ~1.6% RSE; assert 5%), and the __all__ row must come from UNIONING
    the per-source sketches — mergeability is the query's point, so
    the total must also track the exact corpus-wide distinct count."""
    from dev_dot_cvp_metadata_ingestion_spark.plans import registry

    from .conftest import SF_CORRECT

    registry.load_all()
    exact = {
        r.source: r.n_distinct_tokens
        for r in registry.QUERIES["corpus_vocab_by_source"](
            spark, SF_CORRECT
        ).collect()
    }
    approx = {
        r.source: r.n_distinct_tokens
        for r in registry.QUERIES["corpus_vocab_by_source_approx"](
            spark, SF_CORRECT
        ).collect()
    }
    assert set(exact) == set(approx)
    for src, n in exact.items():
        err = abs(approx[src] - n) / n
        assert err <= 0.05, (src, n, approx[src], err)


def test_source_overlap_sketch_tracks_exact(spark):
    """corpus_source_overlap_approx must estimate every pairwise
    shared-vocabulary count within HLL inclusion-exclusion error.
    |A∩B| = |A|+|B|-|A∪B| compounds three estimates, so the bound is
    looser than the per-set 5%: assert 15% relative OR a small
    absolute slack (intersections can be tiny, where relative error
    is meaningless)."""
    from dev_dot_cvp_metadata_ingestion_spark.plans import registry

    from .conftest import SF_CORRECT

    registry.load_all()
    exact = {
        (r.source_a, r.source_b): r.n_shared
        for r in registry.QUERIES["corpus_source_overlap"](
            spark, SF_CORRECT
        ).collect()
    }
    approx = {
        (r.source_a, r.source_b): r.n_shared_est
        for r in registry.QUERIES["corpus_source_overlap_approx"](
            spark, SF_CORRECT
        ).collect()
    }
    # every exact pair must be present in the matrix (the approx form
    # emits all S*(S-1)/2 pairs; exact drops zero-overlap pairs)
    assert set(exact) <= set(approx)
    for pair, n in exact.items():
        est = approx[pair]
        assert abs(est - n) <= max(0.15 * n, 50), (pair, n, est)
