"""sf1 volume-scaling spot-check for the pair/graph families (VERDICT
r13 item 7).

The sf0.1 fixtures can't answer the question that matters at 100 TB —
"is candidate growth LINEAR in the corpus?" — both because 5k docs is
too small to see a bend and because their ~32-word synthetic
vocabulary makes pair volumes a fixture artifact. This tool generates
a web-text-shaped corpus (the standing Zipf generator, V=20k) with
planted near-dup structure (3% mirror groups of 3: a template, an
exact copy, a one-token mutation) plus a cluster-structured embedding
table (one cluster per 50 vectors, so eps-neighbor volume is linear by
construction), at sf0.1-equivalent AND sf1 (10x) sizes, and runs the
expensive REGISTERED pair/graph queries at both. Reported per query:
result rows, wall seconds, and the 10x ratios — a volume or time ratio
far above 10x is the superlinear surprise this check exists to catch
(banded/capped plans should scale ~linearly; a LINEAR candidate
relation can still carry a mildly superlinear sort/shuffle constant).

Usage: python tools/bench_sf1_pairs.py [sf1_docs [queries...]]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

QUERIES = [
    # the r14 catch and its fix, tracked side by side each round
    "dedup_tfidf_weighted_jaccard",
    "dedup_tfidf_weighted_jaccard_capped",
    "dedup_match_scores",
    "dedup_link_prediction_capped",
    "dedup_clustering_coefficients",
    "embedding_dbscan",
]


def gen_documents(spark, path: str, n_docs: int) -> None:
    """Zipf text in the testdata documents schema, with planted
    near-dup structure: every 33rd doc is a template whose two
    following ids are an exact copy and a one-token mutation."""
    from tools.bench_realistic_text import zipf_corpus

    base = zipf_corpus(spark, n_docs).select("doc_id", "text")
    tmpl = zipf_corpus(spark, n_docs).select(
        (F.col("doc_id") + 1).alias("doc_id"),
        F.col("text").alias("tmpl_text"),
    )
    mut = zipf_corpus(spark, n_docs).select(
        (F.col("doc_id") + 2).alias("doc_id"),
        F.concat(F.lit("w1 "), F.expr("substring(text, 10)")).alias(
            "mut_text"
        ),
    )
    docs = (
        base.join(tmpl, "doc_id", "left")
        .join(mut, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 33 == 1, F.col("tmpl_text"))
            .when(F.col("doc_id") % 33 == 2, F.col("mut_text"))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .select(
            "doc_id",
            "text",
            F.element_at(
                F.array(*[F.lit(x) for x in ("en", "de", "fr", "es", "zh")]),
                (F.col("doc_id") % 5 + 1).cast("int"),
            ).alias("lang"),
            # source keyed on doc_id div 3: the mirror group
            # {33k, 33k+1, 33k+2} shares one source (33 is divisible
            # by 3), so SOURCE-BLOCKED pair queries see the planted
            # duplicates — consecutive-id sources would hide them
            F.concat(
                F.lit("src"),
                (F.expr("doc_id div 3") % 20).cast("string"),
            ).alias("source"),
            F.length("text").alias("n_chars"),
        )
    )
    docs.write.mode("overwrite").parquet(f"{path}/documents.parquet")


def gen_embeddings(spark, path: str, n_vecs: int) -> None:
    """64-dim unit-ish vectors, one tight cluster per 50 ids (cluster
    count scales with n, so neighbor-pair volume is linear)."""
    dims = 64

    def coord(j: int):
        # centers CENTERED on 0 so cross-cluster cosine ≈ 0 (an
        # all-positive orthant would put every cross pair above any
        # cosine threshold — the quadratic fixture artifact this tool
        # exists to avoid)
        c = (F.col("vec_id") / 50).cast("long").cast("string")
        center = (
            F.conv(
                F.substring(F.md5(F.concat_ws(":", c, F.lit(str(j)))), 1, 4),
                16, 10,
            ).cast("double")
            / 65536.0
            - 0.5
        )
        noise = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", F.col("vec_id").cast("string"), F.lit(str(j))
                        )
                    ),
                    1, 4,
                ),
                16, 10,
            ).cast("double")
            / 65536.0
            - 0.5
        ) * 0.02
        return (center + noise).cast("float")

    spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.array(*[coord(j) for j in range(dims)]).alias("embedding"),
        (F.col("id") % 50).cast("int").alias("label"),
    ).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


def main() -> None:
    sf1_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    names = sys.argv[2:] or QUERIES

    import shutil
    import tempfile

    from dev_dot_cvp_metadata_ingestion_spark.plans import registry
    from dev_dot_cvp_metadata_ingestion_spark.session import get_spark

    registry.load_all()
    spark = get_spark("bench-sf1-pairs")

    scales = {"sf0.1_equiv": sf1_docs // 10, "sf1": sf1_docs}
    out: dict = {"queries": {}, "scales": {
        k: {"docs": v, "vecs": (v * 2) // 5} for k, v in scales.items()
    }}
    dirs: dict[str, str] = {}
    try:
        for label, n in scales.items():
            d = tempfile.mkdtemp(prefix=f"bench_sf1_{label.replace('.', '')}_")
            gen_documents(spark, d, n)
            gen_embeddings(spark, d, (n * 2) // 5)  # testdata vec:doc ratio
            dirs[label] = d

        for name in names:
            fn = registry.QUERIES[name]
            rec: dict = {}
            for label, d in dirs.items():
                fn(spark, d).write.format("noop").mode("overwrite").save()
                t0 = time.perf_counter()
                rows = fn(spark, d).count()
                sec = round(time.perf_counter() - t0, 3)
                rec[label] = {"rows": rows, "sec": sec}
            rec["row_scale_10x"] = round(
                rec["sf1"]["rows"] / max(rec["sf0.1_equiv"]["rows"], 1), 2
            )
            rec["time_scale_10x"] = round(
                rec["sf1"]["sec"] / max(rec["sf0.1_equiv"]["sec"], 1e-9), 2
            )
            out["queries"][name] = rec
    finally:
        for d in dirs.values():
            shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
