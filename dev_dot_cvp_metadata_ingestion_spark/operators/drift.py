"""Distribution-drift computation over word-count relations — shared
by the batch ``corpus_source_drift`` query and the streaming drift
monitor (streaming/stream.py:drift_monitor_sink), so the streaming
report is pinned row-for-row to the batch semantics by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def source_drift_from_counts(sc: DataFrame) -> DataFrame:
    """Per-source total-variation drift from a (source, word, c_sw)
    count relation, in exact ppm integers. See the registered query's
    docstring (plans/datapipe.py:corpus_source_drift) for semantics
    and the 100 TB shape; this helper IS that query from the count
    relation down, so stream and batch cannot diverge.

    The ppm products go through exact DECIMAL(38,0) (ADVICE r9):
    ``c_w * 1e6`` wraps int64 once a word's global count passes
    ~9.2e12 — real for stop words in a ~2.5e13-token (100 TB) corpus.
    The quotient is a ppm (<= 1e6), so Spark's decimal ``div`` (long
    result) is exact and bit-equal to the oracle's HUGEINT ``//``."""
    # sc fans out three ways (gw, ns, the word join) and its lineage is
    # a full corpus tokenize at the batch call site — materialize once;
    # gw is vocab-sized with four consumers, same treatment.
    sc = sc.localCheckpoint()
    gw = sc.groupBy("word").agg(F.sum("c_sw").alias("c_w")).localCheckpoint()
    ns = sc.groupBy("source").agg(F.sum("c_sw").alias("n_s"))
    # g_mass needs the global total BEFORE the per-word division; two
    # tiny single-row steps keep the arithmetic identical to the oracle.
    n_total_row = gw.agg(F.sum("c_w").alias("n_total"))
    g_mass_row = (
        gw.crossJoin(F.broadcast(n_total_row))
        .select(F.expr("CAST(c_w AS DECIMAL(38,0)) * 1000000 div n_total").alias("g_ppm"))
        .agg(F.sum("g_ppm").alias("g_mass"))
    )
    tot = n_total_row.crossJoin(g_mass_row)
    j = (
        sc.join(gw, "word")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "word",
            F.expr("CAST(c_sw AS DECIMAL(38,0)) * 1000000 div n_s").alias("p_ppm"),
            F.expr("CAST(c_w AS DECIMAL(38,0)) * 1000000 div n_total").alias("g_ppm"),
        )
    )
    per_source = j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.abs(F.col("p_ppm") - F.col("g_ppm"))).alias("present_drift"),
        F.sum("g_ppm").alias("present_g_mass"),
        F.min_by(
            "word",
            F.struct(
                (-F.abs(F.col("p_ppm") - F.col("g_ppm"))).alias("nd"),
                F.col("word").alias("w"),
            ),
        ).alias("top_word"),
        F.max(F.abs(F.col("p_ppm") - F.col("g_ppm"))).alias(
            "top_word_drift_ppm"
        ),
    )
    return (
        per_source.join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            "n_words",
            F.expr(
                "(present_drift + (g_mass - present_g_mass)) div 2"
            ).alias("tv_ppm"),
            "top_word",
            "top_word_drift_ppm",
        )
        .orderBy("source")
    )


def word_counts(docs: DataFrame, tokens_expr) -> DataFrame:
    """(source, word, c_sw) counts of a documents frame — one shuffle
    with map-side combine; the shared front half of batch and
    streaming drift."""
    return (
        docs.select("source", F.explode(tokens_expr).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("c_sw"))
    )
