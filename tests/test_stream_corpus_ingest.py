"""Streaming corpus ingestion: map-side hygiene + fixed quality gate +
watermarked first-seen dedup must equal the batch form of the same
gates over the drained backlog — including a duplicate whose copies
arrive in DIFFERENT micro-batches (the case per-batch dropDuplicates
silently misses)."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from dev_dot_cvp_metadata_ingestion_spark.streaming.stream import (
    stream_corpus_ingest,
)

SCHEMA = (
    "doc_id long, text string, lang string, source string, ingest_ts timestamp"
)


def _doc(i, text, ts):
    return {
        "doc_id": i, "text": text, "lang": "en", "source": "s",
        "ingest_ts": ts,
    }


GOOD = "the cat sat on the mat and it is a fine day for all of us"
JUNK = "zz"  # 1 token: 0.003 len + 0.2 punct = 0.203, under the 0.25 gate


def test_cross_batch_dedup_and_gate_equal_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # batch 1: two good docs + junk
    (src / "f1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                _doc(0, GOOD, "2026-01-01T00:00:00"),
                _doc(1, GOOD + " extra words here", "2026-01-01T00:01:00"),
                _doc(2, JUNK, "2026-01-01T00:02:00"),
            ]
        )
    )
    # batch 2: doc 3 duplicates doc 0's content EXACTLY (cross-batch
    # duplicate), doc 4 is new
    (src / "f2.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                _doc(3, GOOD, "2026-01-01T00:03:00"),
                _doc(4, GOOD + " and something else too", "2026-01-01T00:04:00"),
            ]
        )
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    curated = stream_corpus_ingest(stream, quality_threshold=0.25)
    q = (
        curated.writeStream.format("memory")
        .queryName("corpus_ingest")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "availableNow drain timed out"

    rows = {r["doc_id"]: r for r in spark.sql(
        "select * from corpus_ingest").collect()}
    # doc 0 survives; doc 3 (same fingerprint, later batch) is dropped
    assert 0 in rows and 3 not in rows
    # junk gated out; distinct good docs survive
    assert 2 not in rows
    assert set(rows) == {0, 1, 4}
    # hygiene columns are present and populated
    assert rows[0]["lang_detected"] == "en"
    assert rows[0]["quality"] >= 0.25
    assert rows[0]["fingerprint"] is not None and len(rows[0]["fingerprint"]) == 32


def test_pii_scrubbed_before_fingerprinting(spark, tmp_path):
    """Two docs identical except for different embedded emails must
    dedup to ONE row: the fingerprint is computed on the SCRUBBED
    text, so PII variation cannot defeat dedup."""
    src = tmp_path / "src"
    src.mkdir()
    base = GOOD + " contact me at {} thanks"
    (src / "f1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                _doc(0, base.format("alice@example.com"), "2026-01-01T00:00:00"),
                _doc(1, base.format("bob@other.org"), "2026-01-01T00:01:00"),
            ]
        )
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream_corpus_ingest(stream, quality_threshold=0.1)
        .writeStream.format("memory")
        .queryName("pii_ingest")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    rows = spark.sql("select * from pii_ingest").collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 0
    assert "alice@example.com" not in rows[0]["text"]


def test_ingest_to_continuously_current_table(spark, tmp_path):
    """End to end: the curated append stream folds into a CDC-upserted
    parquet table keyed by fingerprint — the continuously-current
    corpus a training run reads. A re-delivered (duplicate-fingerprint)
    doc in a later batch must not create a second row."""
    from dev_dot_cvp_metadata_ingestion_spark.streaming.stream import (
        merge_upsert_sink,
    )

    src = tmp_path / "src"
    src.mkdir()
    (src / "f1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                _doc(0, GOOD, "2026-01-01T00:00:00"),
                _doc(1, GOOD + " more words here now", "2026-01-01T00:01:00"),
            ]
        )
    )
    (src / "f2.json").write_text(
        json.dumps(_doc(5, GOOD + " a third distinct document text",
                        "2026-01-01T00:02:00"))
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    curated = stream_corpus_ingest(stream, quality_threshold=0.25)
    table = str(tmp_path / "corpus_table")
    sink = merge_upsert_sink(
        table,
        key_cols=["fingerprint"],
        order_cols=["ingest_ts"],
        partition_col="shard",
    )

    def sink_with_shard(df, batch_id):
        sink(
            df.withColumn(
                "shard",
                F.pmod(
                    F.conv(F.substring("fingerprint", 1, 4), 16, 10).cast(
                        "long"
                    ),
                    F.lit(4),
                ),
            ),
            batch_id,
        )

    q = (
        curated.writeStream.foreachBatch(sink_with_shard)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    final = spark.read.parquet(table)
    assert final.count() == 3
    assert final.select("fingerprint").distinct().count() == 3
    assert {r["doc_id"] for r in final.collect()} == {0, 1, 5}
