"""Full-text retrieval ranking: BM25-shaped scoring in exact integer
arithmetic, with salted per-query top-k.

Classic BM25 (Robertson-Sparck Jones; k1=1.2, b=0.75) scores

    score(q, d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

This implementation keeps the exact shape but replaces the log-idf
with its rational core — ``idf_ppm = floor(((N - df)*2 + 1) * 1e6 /
(df*2 + 1))``, i.e. the (N-df+0.5)/(df+0.5) odds ratio in ppm with
both halves doubled so everything stays integral — because libm ``ln``
is not bit-portable across engines (repo determinism doctrine: no
float in a hash-checked path). For a single-term query the ranking is
identical to log-idf BM25 (log is monotone); multi-term tie behavior
differs from the textbook form only where log compression would
reorder sums, which is the documented trade for an exactly
reproducible score. All saturation arithmetic is BIGINT with floor
division at fixed points, so Spark ``div`` and DuckDB ``//`` agree
bit-for-bit.

Scale shape (the inverted-index view): the corpus is tokenized ONCE;
document lengths and per-(doc, term) frequencies are two map-side
combined aggregates; the query-term dictionary, per-term document
frequencies, and the corpus totals are all config-scale broadcasts.
The only corpus-sized shuffles are the two token aggregates and the
tf-dl join on doc_id. Per-query top-k uses the salted two-phase rank
(operators/similarity.py:_topk_per_query) so no window partition ever
holds a whole query's candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _topk_per_query


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_salts: int = 32,
) -> DataFrame:
    """Top-``k`` documents per query by integer BM25.

    ``queries`` is a small (q_id, term) relation — one row per query
    term, terms lowercase. Returns (q_id, doc_id, score_ppm, rank),
    UNORDERED (per-row operator contract; ``rank`` carries the
    ordering, call sites sort for presentation).
    """
    from ..functions.text import tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("word")
    )
    # the token relation feeds both aggregates; materialize once so the
    # corpus tokenize runs a single time (same device as drift/anomaly)
    toks = toks.localCheckpoint()
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corp = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("t_tokens")
    )
    qterms = queries.select(F.col("term")).distinct()
    tf = (
        toks.join(F.broadcast(qterms), toks.word == qterms.term, "leftsemi")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_rel = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df_rel), "word")
        .crossJoin(F.broadcast(corp))
        .join(F.broadcast(queries), F.col("word") == F.col("term"))
        .select(
            "q_id",
            "doc_id",
            F.expr(
                """
                (((n_docs - df) * 2L + 1L) * 1000000L div (df * 2L + 1L))
                * ((tf * 2200000L * 1000000L) div
                   (tf * 1000000L
                    + (1200000L * (250000L
                        + (750000L * dl * 1000L)
                          div (t_tokens * 1000L div n_docs)))
                      div 1000000L))
                div 1000000L
                """
            ).alias("contrib"),
        )
        .groupBy("q_id", "doc_id")
        .agg(F.sum("contrib").alias("score_ppm"))
    )
    # salted two-phase rank; score_ppm < 2^53 so the double view used
    # for ordering is exact
    ranked = _topk_per_query(
        scored.select(
            "q_id",
            F.col("doc_id").alias("vec_id"),
            F.col("score_ppm").cast("double").alias("cos"),
            "score_ppm",
        ),
        k,
        n_salts,
    )
    return ranked.select(
        "q_id",
        F.col("vec_id").alias("doc_id"),
        "score_ppm",
        F.col("rank").cast("long").alias("rank"),
    )
