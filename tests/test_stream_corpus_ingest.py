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
