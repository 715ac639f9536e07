"""Streaming out-of-vocabulary monitoring: per-batch SymSpell
resolutions from a document stream against the persisted word-count
dictionary must equal the batch-mode replica on the same batches,
dictionary words must never be flagged, and a manually re-delivered
batch (foreachBatch at-least-once) must leave the results table
unchanged."""

from __future__ import annotations

import os
import time as _time

import pyspark.sql.functions as F
import pytest

from dev_dot_cvp_metadata_ingestion_spark.functions.text import (
    ascii_lower,
    tokens,
)
from dev_dot_cvp_metadata_ingestion_spark.operators.retrieval import (
    symspell_corrections,
)
from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
    read_word_counts,
    write_word_counts,
)
from dev_dot_cvp_metadata_ingestion_spark.streaming.stream import (
    spelling_monitor_sink,
)

SCHEMA = "doc_id long, text string"

# "sprk"/"windw" are distance 1 from dictionary words; "the" is in the
# dictionary (never flagged); "zzqqzz" is unresolvable (no match row)
BATCHES = [
    [(1, "sprk join the table"), (2, "windw scan")],
    [(3, "sprk sprk order"), (4, "qery merge")],
    [(5, "zzqqzz batch stream")],
]


@pytest.fixture(scope="module")
def dict_path(spark, sf_dir, tmp_path_factory):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = str(tmp_path_factory.mktemp("spell_dict") / "counts")
    write_word_counts(docs, p, folded=True)
    return p


@pytest.fixture(scope="module")
def src(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("spell_doc_src")
    base = _time.time()
    for i, rows in enumerate(BATCHES):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(root / f"b{i}")
        )
        for f in (root / f"b{i}").rglob("*.parquet"):
            os.utime(f, (base + 10 * i, base + 10 * i))
    return root


def _run_stream(spark, src, sink, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)


def _rows(df):
    return sorted(
        (r.batch_id, r.typo, r.correction, r.corr_count, r.n_occurrences)
        for r in df.collect()
    )


def _batch_replica(spark, dict_path, batch_rows):
    dic = (
        read_word_counts(spark, dict_path)
        .groupBy("word")
        .agg(F.sum("c_sw").alias("corr_count"))
        .filter((F.col("corr_count") >= 10) & (F.length("word") >= 3))
    )
    batch = spark.createDataFrame(batch_rows, SCHEMA)
    occ = (
        batch.select(
            F.explode(tokens(ascii_lower(F.col("text")))).alias("typo")
        )
        .filter(F.length("typo") >= 3)
        .groupBy("typo")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .join(dic.select(F.col("word").alias("typo")), "typo", "left_anti")
    )
    return sorted(
        (r.typo, r.correction, r.corr_count, r.n_occurrences)
        for r in symspell_corrections(occ.select("typo"), dic)
        .join(occ, "typo")
        .collect()
    )


def test_stream_equals_batch_replica(spark, dict_path, src, tmp_path):
    out = str(tmp_path / "results")
    _run_stream(
        spark, src, spelling_monitor_sink(dict_path, out), tmp_path / "ckpt"
    )
    got = _rows(spark.read.parquet(out))
    want = sorted(
        (i, *row)
        for i, rows in enumerate(BATCHES)
        for row in _batch_replica(spark, dict_path, rows)
    )
    assert got == want
    # semantic spot checks: typos resolve, dictionary words are absent,
    # the unresolvable token produces no row
    by_typo = {t: c for _, t, c, _, _ in got}
    assert by_typo["sprk"] == "spark"
    assert by_typo["windw"] == "window"
    assert by_typo["qery"] == "query"
    assert "the" not in by_typo and "zzqqzz" not in by_typo
    # occurrence counts aggregate within a batch
    occ = {(b, t): n for b, t, _, _, n in got}
    assert occ[(1, "sprk")] == 2


def test_redelivered_batch_is_idempotent(spark, dict_path, src, tmp_path):
    out = str(tmp_path / "results")
    sink = spelling_monitor_sink(dict_path, out)
    _run_stream(spark, src, sink, tmp_path / "ckpt")
    before = _rows(spark.read.parquet(out))
    # manual re-delivery of batch 1 (at-least-once)
    sink(spark.createDataFrame(BATCHES[1], SCHEMA), 1)
    assert _rows(spark.read.parquet(out)) == before
