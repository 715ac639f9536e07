"""Global token-budget selection: the histogram-refinement plan must
reproduce the global-cumsum semantics exactly — including when the
budget boundary lands inside a tie group of identical qualities — and
must plan no global window and no global sort."""

from __future__ import annotations

import pyspark.sql.functions as F

from dev_dot_cvp_metadata_ingestion_spark.plans import registry

registry.load_all()

Q = "documents_budget_selected"


def _run(spark, rows, tmp_path):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return {r["doc_id"]: r for r in registry.QUERIES[Q](spark, d).collect()}


def _oracle_keep(rows):
    """Reference: global cumsum over (quality_fp DESC, doc_id)."""
    import math

    _ASCII_FOLD = str.maketrans(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
    )

    def toks(s):
        return [w for w in s.split() if w]

    def quality_fp(s):
        t = toks(s)
        n = len(t)
        len_term = min(n / 100.0, 1.0)
        # must mirror functions.text.STOPWORDS["en"] exactly
        stop = {"the", "a", "of", "and", "to", "in", "is", "it", "for", "on"}
        stop_term = (
            sum(1 for w in t if w.translate(_ASCII_FOLD) in stop) / n
        ) if n else 0.0
        if len(s) > 0:
            punct = sum(1 for c in s if c in ".,!?;:") / len(s)
        else:
            punct = 0.0
        punct_term = 1.0 if punct < 0.1 else 0.0
        q = len_term * 0.3 + stop_term * 0.5 + punct_term * 0.2
        return math.floor(q * 1_000_000)

    scored = [(d, len(toks(s)), quality_fp(s)) for d, s, *_ in rows]
    budget = sum(n for _, n, _ in scored) // 2
    order = sorted(scored, key=lambda x: (-x[2], x[0]))
    kept, cum = set(), 0
    for d, n, _ in order:
        if cum < budget:
            kept.add(d)
        cum += n
    return kept


def test_matches_global_cumsum_with_tie_crossing(spark, tmp_path):
    # 3 high-quality distinct docs, then a 6-doc TIE GROUP of identical
    # text that straddles the budget line, then junk. The boundary
    # resolution must pick the tie group's doc_id prefix.
    hi = "the cat sat on the mat and it is a fine day for all of us here"
    tie = "a plain middle document with the same words in it for a tie"
    junk = "zzz!!!,,,"
    rows = (
        [(i, hi + f" extra{i}", "en", "s", 1) for i in range(3)]
        + [(10 + i, tie, "en", "s", 1) for i in range(6)]
        + [(100 + i, junk, "en", "s", 1) for i in range(4)]
    )
    out = _run(spark, rows, tmp_path)
    expect = _oracle_keep(rows)
    got = {d for d, r in out.items() if r["kept"]}
    assert got == expect
    # the tie group must be split by doc_id order: whichever tie docs
    # are kept must be a prefix of 10..15
    tie_kept = sorted(d for d in got if 10 <= d < 16)
    assert tie_kept == list(range(10, 10 + len(tie_kept)))


def test_budget_is_half_the_corpus_tokens(spark, tmp_path):
    rows = [(i, "word " * 10, "en", "s", 1) for i in range(10)]
    out = _run(spark, rows, tmp_path)
    kept_tokens = sum(r["n_tokens"] for r in out.values() if r["kept"])
    total = sum(r["n_tokens"] for r in out.values())
    # identical docs: ties resolved by doc_id until the budget crosses;
    # the crossing doc is included, so kept mass is budget + ≤ one doc
    assert total // 2 <= kept_tokens <= total // 2 + 10


def test_all_docs_flagged_none_lost(spark, tmp_path):
    rows = [(i, f"doc {i} text here", "en", "s", 1) for i in range(7)]
    out = _run(spark, rows, tmp_path)
    assert len(out) == 7
    assert all(isinstance(r["kept"], bool) for r in out.values())


def test_no_global_window_or_sort_in_plan(spark, sf_dir):
    df = registry.QUERIES[Q](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "No Partition Defined" not in plan
    # windows in the plan must all be partitioned (the tie resolver)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "rangepartitioning" not in plan.lower()


def test_scoped_form_same_rows_single_scan(spark, sf_dir):
    """budget_select_scoped must return the registered query's exact
    rows while reading parquet ONCE (the scored projection is
    persisted; every branch reads the InMemoryRelation)."""
    from dev_dot_cvp_metadata_ingestion_spark.plans.datapipe import (
        budget_select_scoped,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pure = sorted(
        tuple(r) for r in registry.QUERIES[Q](spark, sf_dir).collect()
    )
    with budget_select_scoped(d) as scoped:
        rows = sorted(tuple(r) for r in scoped.collect())
        # every LEAF of the optimized plan must be the cached scored
        # projection — no branch re-derives from parquet (the physical
        # string re-prints the cached subtree per reference, so count
        # leaves on the tree, not scan substrings)
        leaves = []
        stack = [scoped._jdf.queryExecution().optimizedPlan()]
        while stack:
            node = stack.pop()
            it = node.children().iterator()
            n = 0
            while it.hasNext():
                stack.append(it.next())
                n += 1
            if n == 0:
                leaves.append(node.nodeName())
    assert rows == pure
    assert leaves and all(l == "InMemoryRelation" for l in leaves), leaves


def test_exact_boundary_group_with_zero_token_tail(spark):
    """ADVICE r8: a zero-token doc ordered at the tail of a quality
    group whose cumulative total lands EXACTLY on the budget must be
    dropped (the oracle's exclusive cumsum is strictly < budget). The
    old inclusive keep_all (qcum + qtok <= budget) kept it; the strict
    keep_all routes exact-boundary groups through the tie branch,
    whose exclusive prefix test matches the oracle for every doc."""
    from dev_dot_cvp_metadata_ingestion_spark.plans.datapipe import (
        _budget_from_scored,
    )

    # quality 100: 4 tokens | quality 75: a zero-token doc (kept: its
    # exclusive cumsum 4 < 6) | quality 50: (2 tokens, then a
    # zero-token tail) — group ends EXACTLY on budget 6 = 12 // 2, so
    # the tail's exclusive cumsum == budget -> dropped | quality 10:
    # past the line.
    scored = spark.createDataFrame(
        [(1, 4, 100), (5, 0, 75), (2, 2, 50), (3, 0, 50), (4, 6, 10)],
        "doc_id long, n_tokens long, quality_fp long",
    )
    out = {r["doc_id"]: r["kept"] for r in _budget_from_scored(scored).collect()}
    assert out == {1: True, 5: True, 2: True, 3: False, 4: False}


# r16 fast-tier split (VERDICT r15 item 3): this module is in the SLOW
# tier — long layout/stream/property sweeps excluded from the default
# `-m "not slow"` run (pytest.ini) so the driver's verify-window pytest
# completes; run the FULL suite with `pytest -m ""`.
import pytest as _pytest_r16

pytestmark = _pytest_r16.mark.slow
