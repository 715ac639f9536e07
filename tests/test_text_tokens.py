"""BPE-ish pre-tokenizer count: pinned semantics on known strings."""

from __future__ import annotations

from pyspark.sql import functions as F

from dev_dot_cvp_metadata_ingestion_spark.functions.text import (
    bpe_token_count,
    token_count,
)


def test_bpe_token_count_known_strings(spark):
    cases = [
        # (text, ws_tokens, bpe matches)
        ("hello world", 2, 2),          # "hello", " world"
        ("don't stop", 2, 3),           # "don", "'t", " stop"
        ("a=1,b=22", 1, 7),             # "a","=","1",",","b","=","22"
        ("  spaced", 1, 2),             # "  " (ws run), "spaced"
        ("", 0, 0),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(cases)], "id long, text string"
    )
    rows = df.select(
        "id",
        token_count(F.col("text")).alias("ws"),
        bpe_token_count(F.col("text")).alias("bpe"),
    ).collect()
    got = {r.id: (r.ws, r.bpe) for r in rows}
    for i, (t, ws, bpe) in enumerate(cases):
        assert got[i] == (ws, bpe), f"{t!r}: got {got[i]}, want {(ws, bpe)}"
