"""corpus_source_drift: hand-computed TV fixture, exact-ppm replica
parity, single-source zero property, and the vocab-join plan shape."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F
import pytest

from dev_dot_cvp_metadata_ingestion_spark.plans import registry

registry.load_all()

SF = "/root/testdata/sf0.001"
Q = "corpus_source_drift"


def _replica(docs):
    """Exact integer-ppm replica of the registered semantics.

    docs: list of (source, text). Returns {source: (n_tokens, n_words,
    tv_ppm, top_word, top_word_drift_ppm)}.
    """
    sc: Counter = Counter()
    for source, text in docs:
        for w in text.split():
            sc[(source, w)] += 1
    gw: Counter = Counter()
    ns: Counter = Counter()
    for (source, w), c in sc.items():
        gw[w] += c
        ns[source] += c
    n_total = sum(gw.values())
    g_ppm = {w: c * 1_000_000 // n_total for w, c in gw.items()}
    g_mass = sum(g_ppm.values())
    out = {}
    for source in ns:
        present = [(w, c) for (s, w), c in sc.items() if s == source]
        p_ppm = {w: c * 1_000_000 // ns[source] for w, c in present}
        drifts = {w: abs(p_ppm[w] - g_ppm[w]) for w, _ in present}
        present_drift = sum(drifts.values())
        present_g = sum(g_ppm[w] for w, _ in present)
        tv = (present_drift + (g_mass - present_g)) // 2
        top = min(((-d, w) for w, d in drifts.items()))
        out[source] = (ns[source], len(present), tv, top[1], -top[0])
    return out


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("drift_sf")
    docs = [
        (0, "aa aa aa bb", "en", "srcA"),
        (1, "aa bb cc cc", "en", "srcA"),
        (2, "dd dd dd dd", "en", "srcB"),
        (3, "aa dd ee", "en", "srcB"),
        (4, "ff", "en", "srcC"),
    ]
    spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(d / "documents.parquet"))
    rows = [(s, t) for _, t, _, s in docs]
    return str(d), _replica(rows)


def test_hand_fixture_matches_replica(spark, fixture_dir):
    sf, expected = fixture_dir
    got = {
        r["source"]: (
            r["n_tokens"],
            r["n_words"],
            r["tv_ppm"],
            r["top_word"],
            r["top_word_drift_ppm"],
        )
        for r in registry.QUERIES[Q](spark, sf).collect()
    }
    assert got == expected


def test_replica_parity_on_smoke_corpus(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    docs = [(r["source"], r["text"]) for r in d.collect()]
    expected = _replica(docs)
    got = {
        r["source"]: (
            r["n_tokens"],
            r["n_words"],
            r["tv_ppm"],
            r["top_word"],
            r["top_word_drift_ppm"],
        )
        for r in registry.QUERIES[Q](spark, SF).collect()
    }
    assert got == expected


def test_single_source_drifts_zero(spark, tmp_path):
    """One source == the whole corpus, so p(w) = q(w) exactly (same
    integer division inputs) and TV must be exactly 0 ppm."""
    spark.createDataFrame(
        [(0, "x y z x", "en", "solo", 7), (1, "y y", "en", "solo", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = registry.QUERIES[Q](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["tv_ppm"] == 0
    assert rows[0]["top_word_drift_ppm"] == 0


def test_tv_bounded_by_one(spark):
    out = registry.QUERIES[Q](spark, SF)
    bad = out.filter(
        (F.col("tv_ppm") < 0) | (F.col("tv_ppm") > 1_000_000)
    ).count()
    assert bad == 0


def test_vocab_join_is_not_broadcast(spark):
    """The per-source/global count join is keyed on the WORD — a
    relation that grows with the corpus vocabulary, so it must ride a
    shuffle join; the only broadcasts allowed are the per-source
    totals and the single-row corpus total."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = registry.QUERIES[Q](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_headroom_no_int64_wrap_at_large_counts(spark):
    """ADVICE r9 regression: c_w * 1e6 is DECIMAL(38,0)-lifted — ppm
    values must match exact Python integers at global counts past the
    old 9.2e12 int64 wrap point (stop words in a 100 TB corpus)."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.drift import (
        source_drift_from_counts,
    )

    rows = [
        ("s1", "the", 10_000_000_000_000),
        ("s1", "rare", 7),
        ("s2", "the", 9_500_000_000_000),
        ("s2", "zzz", 3),
    ]
    sc = spark.createDataFrame(rows, "source string, word string, c_sw long")
    got = {
        r.source: (r.n_tokens, r.tv_ppm, r.top_word, r.top_word_drift_ppm)
        for r in source_drift_from_counts(sc).collect()
    }
    # python replica with exact ints
    from collections import defaultdict

    cw, ns = defaultdict(int), defaultdict(int)
    for s, w, c in rows:
        cw[w] += c
        ns[s] += c
    n_total = sum(cw.values())
    g_ppm = {w: c * 1_000_000 // n_total for w, c in cw.items()}
    g_mass = sum(g_ppm.values())
    for src in ns:
        pres = [
            (w, abs(c * 1_000_000 // ns[src] - g_ppm[w]))
            for s, w, c in rows
            if s == src
        ]
        drift = sum(d for _, d in pres)
        pres_g = sum(g_ppm[w] for w, _ in pres)
        tv = (drift + (g_mass - pres_g)) // 2
        top = min(pres, key=lambda x: (-x[1], x[0]))
        want = (ns[src], tv, top[0], max(d for _, d in pres))
        assert got[src] == want, (src, got[src], want)


def test_welch_ab_test_flags_real_shift_not_noise(spark):
    """Two sources drawn as near-identical length distributions must
    NOT be significant; a source with a genuinely shifted mean must
    flag against both. Verdicts and t2 match an exact Python
    replica (floor arithmetic, truncate-toward-zero)."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.drift import (
        welch_source_pairs,
    )

    import random

    rng = random.Random(11)
    a_vals = [100 + rng.randint(-10, 10) for _ in range(60)]
    b_vals = list(reversed(a_vals))  # same multiset => identical mean,
    # so the null pair is deterministically insignificant (a fresh
    # random draw would false-positive ~5% of the time by design)
    s_vals = [160 + rng.randint(-10, 10) for _ in range(60)]
    series = {"a": a_vals, "b": b_vals, "shifted": s_vals}
    rows = [(src, x) for src, xs in series.items() for x in xs]
    per = spark.createDataFrame(rows, "source string, x long")
    got = {
        (r.source_a, r.source_b): (r.t2_milli, r.is_significant)
        for r in welch_source_pairs(per).collect()
    }
    assert got[("a", "b")][1] == 0
    assert got[("a", "shifted")][1] == 1
    assert got[("b", "shifted")][1] == 1

    # exact replica
    def stats(xs):
        n, s, v = len(xs), sum(xs), sum(x * x for x in xs)
        mean = s * 1000 // n
        var = ((n * v - s * s) * 10**6) // (n * (n - 1))
        return n, mean, var

    for (sa, sb), (t2, sig) in got.items():
        na, ma, va = stats(series[sa])
        nb, mb, vb = stats(series[sb])
        se2 = va // na + vb // nb
        d = ma - mb
        wt2 = (d * d * 1000) // se2 if se2 else None
        assert t2 == wt2 and sig == int(d * d > 4 * se2), (sa, sb)


def test_welch_independent_null_draws_not_significant(spark):
    """Two INDEPENDENT same-distribution draws (fixed deterministic
    lists, seed 1 of uniform 100±10, n=60 each) must not be
    significant — the regression for the r10 ADVICE bug where the
    variance denominator n²(n−1) baked /n into var and se2 divided by
    n AGAIN, inflating t² ~n-fold: on exactly these lists the buggy
    code computed t² = 99.9 (flagged) where true Welch t² = 1.665."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.drift import (
        welch_source_pairs,
    )

    import random

    rng = random.Random(1)
    c_vals = [100 + rng.randint(-10, 10) for _ in range(60)]
    d_vals = [100 + rng.randint(-10, 10) for _ in range(60)]
    rows = [("c", x) for x in c_vals] + [("d", x) for x in d_vals]
    per = spark.createDataFrame(rows, "source string, x long")
    [r] = welch_source_pairs(per).collect()
    assert r.is_significant == 0, r
    # t2_milli ≈ 1665 (true Welch 1.67) — and far below the old
    # inflated 99907 the n²(n−1) bug produced on these exact lists.
    assert 1000 < r.t2_milli < 2500, r.t2_milli


def test_robust_stats_match_sorted_replica(spark):
    """median/p90/trimmed-mean from the histogram CDF must equal the
    sort-based definitions exactly — including partial trim buckets
    (heavy ties across the lo/hi rank boundaries) and an extreme
    outlier the trimmed mean must ignore."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.drift import (
        robust_source_stats,
    )

    series = {
        # heavy ties at the trim boundaries: 23 values, lo=2, hi=21
        "ties": [5] * 7 + [6] * 9 + [7] * 7,
        # outlier: trimmed mean ignores the 1e6 spike, plain mean can't
        "spiky": list(range(10, 29)) + [10**6],
        "single": [42],
    }
    rows = [(src, x) for src, xs in series.items() for x in xs]
    got = {
        r.source: (r.n, r.median, r.p90, r.trimmed_mean_milli)
        for r in robust_source_stats(
            spark.createDataFrame(rows, "source string, x long")
        ).collect()
    }
    for src, xs in series.items():
        xs_sorted = sorted(xs)
        n = len(xs)
        median = xs_sorted[(n + 1) // 2 - 1]
        p90 = next(
            x for i, x in enumerate(xs_sorted, 1) if 10 * i >= 9 * n
        )
        lo, hi = n // 10, n - n // 10
        trimmed = xs_sorted[lo:hi]
        tm = sum(trimmed) * 1000 // len(trimmed) if trimmed else None
        assert got[src] == (n, median, p90, tm), src
    # the spike is actually ignored
    assert got["spiky"][3] < 30_000
