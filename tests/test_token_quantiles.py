"""documents_token_quantiles_hist: exact-boundary fixtures (q*n
integer, where float-ceil definitions diverge), Python replica parity,
and quantile monotonicity."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dev_dot_cvp_metadata_ingestion_spark.plans import registry

registry.load_all()

SF = "/root/testdata/sf0.001"
Q = "documents_token_quantiles_hist"


def _disc(values, p_pct):
    """Smallest value whose cumulative count reaches p (exact integer
    predicate, == Postgres/DuckDB percentile_disc semantics)."""
    xs = sorted(values)
    n = len(xs)
    for i, v in enumerate(xs, start=1):
        if i * 100 >= p_pct * n:
            return v
    return xs[-1]


def _replica(docs):
    by_src: dict = {}
    for source, text in docs:
        by_src.setdefault(source, []).append(len(text.split()))
    return {
        s: (
            len(v),
            _disc(v, 50),
            _disc(v, 90),
            _disc(v, 99),
            max(v),
        )
        for s, v in by_src.items()
    }


def _run(spark, sf):
    return {
        r["source"]: (
            r["n_docs"],
            r["p50_tokens"],
            r["p90_tokens"],
            r["p99_tokens"],
            r["max_tokens"],
        )
        for r in registry.QUERIES[Q](spark, sf).collect()
    }


def test_exact_boundary_fixture(spark, tmp_path):
    """srcA has n=10 docs with lengths 1..10 — p90 lands exactly on
    cum*100 == 90*n, the boundary where ceil(0.9*10) float definitions
    disagree (probed: DuckDB returns the 9th element, not the 10th).
    srcB has n=2 (p50 boundary: the FIRST element)."""
    docs = []
    for i in range(10):
        docs.append((i, " ".join(["w"] * (i + 1)), "en", "srcA"))
    docs.append((10, "a b c", "en", "srcB"))
    docs.append((11, "a b c d e f", "en", "srcB"))
    spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = _run(spark, str(tmp_path))
    assert got["srcA"] == (10, 5, 9, 10, 10)
    assert got["srcB"] == (2, 3, 6, 6, 6)
    expected = _replica([(s, t) for _, t, _, s in docs])
    assert got == expected


def test_replica_parity_on_smoke_corpus(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    docs = [(r["source"], r["text"]) for r in d.collect()]
    assert _run(spark, SF) == _replica(docs)


def test_quantiles_monotone(spark):
    out = registry.QUERIES[Q](spark, SF)
    bad = out.filter(
        (F.col("p50_tokens") > F.col("p90_tokens"))
        | (F.col("p90_tokens") > F.col("p99_tokens"))
        | (F.col("p99_tokens") > F.col("max_tokens"))
    ).count()
    assert bad == 0


def test_window_is_histogram_sized(spark):
    """The running-CDF window must hang off the histogram aggregate
    (source, n_tokens), never off per-document rows: assert the plan's
    only Window sits ABOVE a HashAggregate on its input side."""
    df = registry.QUERIES[Q](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    w_at = plan.index("Window")
    assert "HashAggregate" in plan[w_at:], (
        "window input is not the pre-aggregated histogram"
    )
