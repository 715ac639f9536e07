"""Property-based pins for the round-12 kernels (hypothesis):

* SNM candidate sets must equal a pure-Python sorted-window model on
  arbitrary corpora — the rank, the window arithmetic, AND the
  tiebreak, not just planted examples.
* The SymSpell deletion-key guarantee: for ANY dictionary word and
  ANY single edit (insert / delete / substitute) producing an unseen
  string, the deletion-key join must rediscover the word — the
  completeness claim the linear candidate generation rests on.

Both models are driven through one Spark round-trip per example
batch (hypothesis generates the corpus; Spark evaluates the real
operator), with small example counts — these are semantic pins, not
load tests."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
    sorted_neighborhood_candidates,
)
from dev_dot_cvp_metadata_ingestion_spark.operators.retrieval import (
    symspell_corrections,
)

from .conftest import levenshtein_py as _lev

# lowercase-ascii words: the engine-stable collation domain both
# kernels document (and the corpus convention)
_word = st.text(alphabet="abcdefgh", min_size=3, max_size=8)
_texts = st.lists(
    st.text(alphabet="abcdefgh ", min_size=1, max_size=40).filter(
        lambda s: s.strip() != ""
    ),
    min_size=1,
    max_size=12,
)


def _py_snm_candidates(rows, window, key_chars):
    # rows: (doc_id, text, block)
    from collections import defaultdict

    by_block = defaultdict(list)
    for doc_id, text, block in rows:
        by_block[block].append((text[:key_chars], doc_id))
    out = set()
    for block, items in by_block.items():
        items.sort()  # (key, id) — identical to (key, doc_id) ordering
        for i, (_, a) in enumerate(items):
            for g in range(1, window + 1):
                if i + g < len(items):
                    out.add((block, a, items[i + g][1], g))
    return out


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_texts, window=st.integers(min_value=1, max_value=4))
def test_snm_candidates_match_python_model(spark, texts, window):
    rows = [
        (i, t, "blk" + str(i % 2)) for i, t in enumerate(texts)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {
        (r.block, r.doc_id_a, r.doc_id_b, r.rank_gap)
        for r in sorted_neighborhood_candidates(
            docs, "doc_id", "text", "source", window=window
        ).collect()
    }
    assert got == _py_snm_candidates(rows, window, 24)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(_word, min_size=1, max_size=6, unique=True),
    edit=st.sampled_from(["insert", "delete", "substitute"]),
    pos=st.integers(min_value=0, max_value=7),
    ch=st.sampled_from("xyz"),  # outside the dictionary alphabet
)
def test_symspell_finds_every_single_edit(spark, words, edit, pos, ch):
    w = words[0]
    p = pos % (len(w) + (1 if edit == "insert" else 0))
    if edit == "insert":
        typo = w[:p] + ch + w[p:]
    elif edit == "delete":
        typo = w[:p] + w[p + 1 :]
    else:
        typo = w[:p] + ch + w[p + 1 :]
    if typo in words:
        return  # not an unseen string; nothing to rediscover
    dic = spark.createDataFrame(
        [(x, 10 + i) for i, x in enumerate(words)],
        ["word", "corr_count"],
    )
    typos = spark.createDataFrame([(typo,)], ["typo"])
    got = symspell_corrections(typos, dic).collect()
    assert len(got) == 1
    # the true source word must be a distance-1 candidate; the picked
    # correction is the count-argmax among ALL distance-1 words, so at
    # minimum a correction exists and is itself at distance 1
    assert got[0].typo == typo
    picked = got[0].correction
    assert _lev(typo, picked) == 1
    # completeness: the planted source word must have been reachable —
    # verify the argmax chose a word with count >= the source's count
    counts = {x: 10 + i for i, x in enumerate(words)}
    assert counts[picked] >= counts[w] or picked < w


def _apply_edit(w, edit, pos, ch):
    p = pos % (len(w) + (1 if edit == "insert" else 0)) if w or edit == "insert" else 0
    if edit == "insert":
        return w[:p] + ch + w[p:]
    if edit == "delete":
        return w[:p] + w[p + 1:] if w else w
    return w[:p] + ch + w[p + 1:] if w else w


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(_word, min_size=1, max_size=6, unique=True),
    edits=st.lists(
        st.tuples(
            st.sampled_from(["insert", "delete", "substitute"]),
            st.integers(min_value=0, max_value=9),
            st.sampled_from("xyz"),
        ),
        min_size=2,
        max_size=2,
    ),
)
def test_symspell_d2_finds_every_double_edit(spark, words, edits):
    """The distance-2 collision guarantee: ANY two stacked edits
    (insert/delete/substitute, any positions) on a dictionary word
    produce a typo the double-deletion key join must resolve — to a
    correction within distance 2, at least as good (by count-argmax)
    as the planted source."""
    w = words[0]
    typo = w
    for edit, pos, ch in edits:
        typo = _apply_edit(typo, edit, pos, ch)
    if typo in words or typo == "" or _lev(typo, w) == 0:
        return  # collapsed to a word / empty; nothing to rediscover
    dic = spark.createDataFrame(
        [(x, 10 + i) for i, x in enumerate(words)],
        ["word", "corr_count"],
    )
    typos = spark.createDataFrame([(typo,)], ["typo"])
    got = symspell_corrections(typos, dic, max_edit_distance=2).collect()
    assert len(got) == 1
    picked = got[0].correction
    assert 1 <= _lev(typo, picked) <= 2
    counts = {x: 10 + i for i, x in enumerate(words)}
    # the planted source is within distance 2, hence a candidate; the
    # argmax can only have picked something with >= its count (or the
    # alphabetical tiebreak at equal count)
    assert counts[picked] >= counts[w] or picked < w


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(_word, min_size=2, max_size=6, unique=True),
    edit=st.sampled_from(["insert", "delete", "substitute"]),
    pos=st.integers(min_value=0, max_value=7),
    ch=st.sampled_from("xyz"),
)
def test_symspell_d2_supersets_d1(spark, words, edit, pos, ch):
    """Raising the budget can only ADD resolvable typos: every typo
    the distance-1 join corrects is corrected at distance 2 too (the
    pick may differ — a higher-count word at distance 2 can win the
    count-argmax — but never disappear)."""
    typo = _apply_edit(words[0], edit, pos, ch)
    if typo in words or typo == "":
        return
    dic = spark.createDataFrame(
        [(x, 10 + i) for i, x in enumerate(words)],
        ["word", "corr_count"],
    )
    typos = spark.createDataFrame([(typo,)], ["typo"])
    d1 = symspell_corrections(typos, dic, max_edit_distance=1).collect()
    d2 = symspell_corrections(typos, dic, max_edit_distance=2).collect()
    if d1:
        assert len(d2) == 1
        assert _lev(typo, d2[0].correction) <= 2


# r16 fast-tier split (VERDICT r15 item 3): this module is in the SLOW
# tier — long layout/stream/property sweeps excluded from the default
# `-m "not slow"` run (pytest.ini) so the driver's verify-window pytest
# completes; run the FULL suite with `pytest -m ""`.
import pytest as _pytest_r16

pytestmark = _pytest_r16.mark.slow
