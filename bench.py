"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop-format write (full
computation, no collect-to-driver bottleneck, no sink I/O noise).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "top_orders_per_priority",
    "cv_validation_results",
    "cv_validation_tallies",
    "cv_sequential_checks",
    "file_metrics_counters",
    "text_stats",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_simhash",
    "ann_bruteforce_topk",
    "multimodal_features",
]

# EVERY other registered query, timed identically but reported under a
# SEPARATE key so headline_queries_total stays comparable across rounds
# (the 13-query headline set is frozen). Derived from the registry so a
# new @register is benched automatically — frozen lists hid the
# round-5 additions until the 87 s winnowing pathology showed this
# class of query can hide order-of-magnitude surprises until timed.
def _extended(qs: dict) -> list[str]:
    return [name for name in qs if name not in HEADLINE]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as entrymod
    from dev_dot_cvp_metadata_ingestion_spark.session import get_spark

    qs = entrymod.queries()
    extended_names = _extended(qs)
    spark = get_spark("bench")

    # warm the JVM (codegen, parquet reader, shuffle paths) and the
    # Python workers (Arrow/pandas import + fork) by running EVERY
    # headline query once at the smoke scale, so no measured query pays
    # first-run compilation/classloading costs
    t_warm = time.perf_counter()
    for name in HEADLINE + extended_names:
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    warmup_sec = round(time.perf_counter() - t_warm, 3)

    # two CONSECUTIVE timed runs per query, min reported: single
    # interleaved runs at sf0.1 vary ±30%+ with JIT/GC state inherited
    # from whatever ran before, which drowns real round-over-round
    # deltas (measured: cv_validation_tallies 3.3s interleaved vs 1.4s
    # consecutive — the query itself is the latter)
    N_RUNS = 2

    def time_set(names: list[str]) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in names:
            fn = qs[name]
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 3)
                out[name] = min(out.get(name, dt), dt)
        return out

    timings = time_set(HEADLINE)
    extended = time_set(extended_names)

    # Standing REALISTIC-VOCABULARY section (r12 VERDICT ask #7): the
    # sf* documents tables carry a ~32-word synthetic vocabulary, so
    # text-index pruning looks useless and pair-family volumes look
    # enormous there — fixture artifacts, not operator properties. A
    # deterministic Zipf corpus (V=20k, s=1 — tools/bench_realistic_
    # text.py's generator, no RNG) sized to the bench sf gives the
    # retrieval trio and one pair-family query per-round numbers over
    # web-text-shaped term statistics; row counts are reported so the
    # pair volume itself is a tracked metric.
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
        ngram_jaccard_pairs,
        weighted_jaccard_pairs_capped,
    )
    from dev_dot_cvp_metadata_ingestion_spark.operators.retrieval import (
        bm25_prf_topk,
        bm25_topk,
        phrase_search_topk,
    )
    from tools.bench_realistic_text import zipf_corpus

    n_docs = max(2_000, int(200_000 * sf)) if sf > 0 else 20_000
    tmp = tempfile.mkdtemp(prefix="bench_zipf_")
    realistic: dict[str, float] = {}
    realistic_rows: dict[str, int] = {}
    try:
        t0 = time.perf_counter()
        zipf_corpus(spark, n_docs).select(
            "doc_id",
            "text",
            F.concat(F.lit("s"), (F.col("doc_id") % 8).cast("string")).alias(
                "source"
            ),
        ).write.mode("overwrite").parquet(f"{tmp}/documents")
        rdocs = spark.read.parquet(f"{tmp}/documents")
        realistic_setup_sec = round(time.perf_counter() - t0, 3)
        rq = spark.createDataFrame(
            [(1, "w157"), (1, "w912"), (2, "w43"), (2, "w2048"), (3, "w311")],
            "q_id long, term string",
        )
        rphrase = spark.createDataFrame(
            [(1, 1, "w1"), (1, 2, "w2")],
            "q_id long, term_pos long, term string",
        )
        # tf-idf weight relation for the capped weighted-jaccard row
        # (r14: the one pair family whose UNcapped join bends quadratic
        # under exactly this Zipf head — tools/bench_sf1_pairs.py —
        # so the capped form gets a standing realistic number).
        # r15 MEASUREMENT FIX (r14 VERDICT "What's wrong #2"): the row
        # previously timed a query returning 0 rows (threshold 0.5
        # over the random Zipf corpus admits no pairs), so a bug that
        # silently emptied the FOUND relation would read as a speedup.
        # The input now plants deterministic mirror copies (doc 33k+1
        # = copy of doc 33k, the tools/bench_sf1_pairs.py device) and
        # blocks by doc_id div 33 so each mirror group shares a block
        # — realistic_rows carries a stable non-zero pair count
        # (~n_docs/33). Timing is therefore NOT comparable to the r14
        # 17.5 s number (different input); both are recorded in
        # OPTIMIZATION_r15.md.
        def _wjc():
            tmpl = rdocs.filter(F.col("doc_id") % 33 == 0).select(
                (F.col("doc_id") + 1).alias("doc_id"),
                F.col("text").alias("_tmpl"),
            )
            wdocs = rdocs.join(tmpl, "doc_id", "left").select(
                "doc_id",
                F.coalesce("_tmpl", "text").alias("text"),
                F.concat(
                    F.lit("s"),
                    (F.expr("doc_id div 33") % 8).cast("string"),
                ).alias("block"),
            )
            tfc = (
                wdocs.select(
                    "block",
                    "doc_id",
                    F.explode(F.split("text", r"\s+")).alias("term"),
                )
                .groupBy("block", "doc_id", "term")
                .agg(F.count(F.lit(1)).alias("tf"))
            )
            n_rel = rdocs.agg(F.count(F.lit(1)).alias("n_docs"))
            df_rel = tfc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
            w = (
                tfc.join(df_rel, "term")
                .crossJoin(F.broadcast(n_rel))
                .select(
                    "block",
                    "doc_id",
                    "term",
                    (
                        F.col("tf") * F.expr("(n_docs * 1000000L) div df")
                    ).alias("w"),
                )
            )
            return weighted_jaccard_pairs_capped(
                w, threshold=0.5, max_doc_freq=100
            )

        realistic_cases = {
            "realistic_bm25_topk": lambda: bm25_topk(rdocs, rq, k=10),
            "realistic_phrase_search": lambda: phrase_search_topk(
                rdocs, rphrase, k=10
            ),
            "realistic_bm25_prf": lambda: bm25_prf_topk(rdocs, rq, k=10),
            "realistic_ngram_pairs": lambda: ngram_jaccard_pairs(
                rdocs, "doc_id", "text", "source", n=2, threshold=0.05
            ),
            "realistic_wjaccard_capped": _wjc,
        }
        for name, fn in realistic_cases.items():
            realistic_rows[name] = fn().count()  # warm + volume metric
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 3)
                realistic[name] = min(realistic.get(name, dt), dt)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    # KEY ORDER MATTERS (VERDICT r13 item 4): the driver records only
    # the TAIL (~2.2 KB) of this line into BENCH_r{N}.json, so the
    # large queries_extended dict goes FIRST and the round-comparable
    # headline block (metric / value / queries) goes LAST — otherwise
    # three consecutive judges had to re-run the full ~11 min bench
    # just to read 13 headline timings.
    payload = json.dumps(
        {
            # every other registered query, excluded from the
            # frozen headline total so rounds stay comparable
            "queries_extended": extended,
            # deterministic Zipf corpus (V=20k, s=1) sized to sf —
            # retrieval + pair-family numbers over realistic term
            # statistics, with result volumes as tracked metrics
            "queries_realistic": realistic,
            "realistic_rows": realistic_rows,
            "realistic_n_docs": n_docs,
            "realistic_setup_sec": realistic_setup_sec,
            "realistic_total": round(sum(realistic.values()), 3),
            "extended_total": round(sum(extended.values()), 3),
            "sf": sf,
            # methodology marker: all headline queries pre-run once
            # at sf0.001 before timing, so round-over-round deltas
            # stay apples-to-apples; warmup_sec is the cold-start
            # cost that the measured numbers exclude
            "warmup": "full",
            "warmup_sec": warmup_sec,
            "runs": N_RUNS,
            "agg": "min",
            "metric": "headline_queries_total",
            "unit": "sec",
            "queries": timings,
            "value": total,
        }
    )
    print(payload)
    # r16 (VERDICT item 10): the printed line is the repo's only
    # round-over-round perf record and the driver archives only its
    # TAIL — persist the identical full dict in-repo so no judge ever
    # reconstructs numbers from a truncated tail again.
    try:
        (Path(__file__).resolve().parent / "BENCH_SELF.json").write_text(
            payload + "\n"
        )
    except OSError:
        pass  # read-only checkout: the printed line still carries all data
    spark.stop()


if __name__ == "__main__":
    main()
