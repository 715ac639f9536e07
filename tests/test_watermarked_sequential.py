"""Watermarked sequential checks: the reference's W3-W5 bundle
monotonicity validation under OUT-OF-ORDER ARRIVAL.

Scenario: bundle records with monotone generated-at times arrive
shuffled across micro-batches — one record a batch late (inside the
allowance: must be repaired into serial order, no spurious error), two
records swapped, and the producer's sn=4 record arriving BEYOND the
allowance (dropped deterministically, so the serial gap it leaves must
be reported exactly as if it were never sent). Expected output is
exactly the two gap errors at sn=5 — emitted mid-stream when that
slice ripens, not just at flush."""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from dev_dot_cvp_metadata_ingestion_spark.streaming.stateful import (
    stateful_sequential_checks_watermarked,
)

T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def _rec(sn, bid=1):
    ts = T0 + dt.timedelta(minutes=sn)
    return (bid, sn, sn, 10, ts, 1700000000 + sn)


SCHEMA = "bid long, sn long, rid long, bs long, ts timestamp, recv_epoch long"

BATCHES = [
    [_rec(0), _rec(1), _rec(3)],          # sn 2 delayed
    [_rec(2), _rec(5), _rec(6)],          # 2 arrives late (in allowance)
    [_rec(9), _rec(7)],                   # swapped arrival
    [_rec(8), _rec(4)],                   # 4 is BEYOND the 3-min allowance
    [(99, 0, 0, 1, T0 + dt.timedelta(hours=1), 1700009999)],  # flush bundle
]


def test_watermarked_sequential_checks_shuffled_feed(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    base = time.time()
    for i, batch in enumerate(BATCHES):
        spark.createDataFrame(batch, SCHEMA).coalesce(1).write.parquet(
            str(src / f"batch_{i}")
        )
        for f in (src / f"batch_{i}").rglob("*.parquet"):
            os.utime(f, (base + 10 * i, base + 10 * i))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
        .withColumn("stream_key", F.lit("s1"))
    )
    got: list = []
    ripen_batches: dict[int, int] = {}

    def sink(df, batch_id):
        rows = df.collect()
        got.extend(rows)
        for r in rows:
            ripen_batches[r.serial_number] = batch_id

    q = (
        stateful_sequential_checks_watermarked(stream, lateness="3 minutes")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "availableNow drain exceeded 300s"

    # survivors are 0,1,2,3,5..9 (sn=4 dropped beyond allowance): the
    # ONLY check errors are the rid+sn gap at sn=5; the
    # late-but-in-allowance sn=2 and the swapped 9/7 arrivals are
    # repaired silently. The beyond-allowance drop itself must be
    # OBSERVABLE: exactly one operator.watermarkLateDrop row for sn=4
    # (ADVICE r7 — a silent drop hides precisely the time-regression
    # population W4 exists to flag).
    drops = [r for r in got if r.field_path == "operator.watermarkLateDrop"]
    assert [r.serial_number for r in drops] == [4], [tuple(r) for r in got]
    assert not drops[0].valid and "behind watermark" in drops[0].details
    got = [r for r in got if r.field_path != "operator.watermarkLateDrop"]
    assert len(got) == 2, [tuple(r) for r in got]
    by_field = {r.field_path: r for r in got}
    sn_err = by_field["metadata.serialId.serialNumber"]
    rid_err = by_field["metadata.serialId.recordId"]
    assert sn_err.serial_number == 5 and rid_err.serial_number == 5
    assert "Expected serialNumber '4' but got '5'" in sn_err.details
    assert "Expected recordId '4' but got '5'" in rid_err.details
    assert sn_err.bundle_key == "s1/1"
    # the gap surfaced when its slice ripened (batch 3: watermark
    # T0+6m covers sn 3 and 5), NOT at the final flush batch
    assert ripen_batches[5] <= 3, (
        f"gap error only surfaced in batch {ripen_batches[5]}"
    )


def test_watermarked_w6_bundle_size_equals_batch(spark, tmp_path):
    """VERDICT r7 item 4: streaming W6 — bundle-size consistency
    verdicts emitted when the watermark closes a bundle — must equal
    the batch window form (operators/sequential.py W6) over an
    out-of-order feed with mid-bundle micro-batch splits.

    Feed: bundle 1 completes the full shape with a duplicated recordId
    (cnt 6 != bs 5 → full-bundle count mismatch), bundle 2 is a tail
    slice (rids 3..7 of bs 10 → last-recordId mismatch), bundle 3 is a
    clean full bundle (no W6 row). A far-future sentinel pushes the
    final watermark past every bundle's max event time so all three
    close; the sentinel itself stays open and emits nothing."""
    import pandas as pd  # noqa: F401  (pyspark pandas interop)

    from dev_dot_cvp_metadata_ingestion_spark.operators.sequential import (
        SequentialSpec,
        sequential_results,
    )

    def rec(bid, sn, rid, bs, minute):
        ts = T0 + dt.timedelta(minutes=minute)
        return (bid, sn, rid, bs, ts, 1700000000 + sn)

    # bundle 1 (sn 0-5): rids 0,1,2,2,3,4 bs=5 → full shape, cnt 6
    b1 = [rec(1, sn, rid, 5, sn) for sn, rid in
          [(0, 0), (1, 1), (2, 2), (3, 2), (4, 3), (5, 4)]]
    # bundle 2 (sn 20-24): rids 3..7 bs=10 → tail shape
    b2 = [rec(2, 20 + i, 3 + i, 10, 10 + i) for i in range(5)]
    # bundle 3 (sn 40-43): rids 0..3 bs=4 → clean
    b3 = [rec(3, 40 + i, i, 4, 20 + i) for i in range(4)]
    # sn 1000: outside every bundle's sn range, so the batch twin's
    # contiguous-run bundling (sorted by sn) keeps each bid contiguous
    sentinel = [rec(99, 1000, 0, 1, 600)]

    # out-of-order, mid-bundle micro-batch splits: b1 split across
    # batches 0/1 with one record displaced a batch late, b2 split
    # 1/2, b3 in batch 2
    batches = [
        [b1[0], b1[1], b1[3], b1[4]],
        [b1[2], b1[5], b2[0], b2[1]],          # b1[2] late, in allowance
        [b2[3], b2[2], b2[4], *b3],            # swapped arrivals
        sentinel,
    ]
    schema = (
        "bid long, sn long, rid long, bs long, ts timestamp, "
        "recv_epoch long"
    )
    src = tmp_path / "src"
    src.mkdir()
    base = time.time()
    for i, batch in enumerate(batches):
        spark.createDataFrame(batch, schema).coalesce(1).write.parquet(
            str(src / f"batch_{i}")
        )
        for f in (src / f"batch_{i}").rglob("*.parquet"):
            os.utime(f, (base + 10 * i, base + 10 * i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
        .withColumn("stream_key", F.lit("s1"))
    )
    got: list = []
    q = (
        stateful_sequential_checks_watermarked(
            stream, lateness="5 minutes", bundle_size_checks=True
        )
        .writeStream.foreachBatch(lambda df, _: got.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "availableNow drain exceeded 300s"

    # batch twin on the SAME records (sentinel included — it emits
    # nothing); bundles occupy disjoint sn ranges so contiguous-run
    # bundling equals the per-bid grouping
    all_recs = b1 + b2 + b3 + sentinel
    bdf = spark.createDataFrame(all_recs, schema)
    batch_rows = sequential_results(
        bdf,
        SequentialSpec(
            file=F.lit("s1"),
            bundle_id=F.col("bid"),
            serial_number=F.col("sn"),
            record_id=F.col("rid"),
            bundle_size=F.col("bs"),
            record_generated_at=F.col("ts"),
            ode_received_at=F.timestamp_seconds(F.col("recv_epoch")),
            has_log_file_name=F.lit(True),
        ),
    ).collect()

    key = lambda r: (r.serial_number, r.field_path, r.details)
    got_w6 = sorted(
        key(r) for r in got
        if r.field_path == "metadata.serialId.bundleSize"
    )
    exp_w6 = sorted(
        key(r) for r in batch_rows
        if r.field_path == "metadata.serialId.bundleSize"
    )
    assert exp_w6, "batch twin produced no W6 rows — test is vacuous"
    assert got_w6 == exp_w6
    # the full + tail shapes are both present, once each (clean bundle
    # and sentinel emit nothing)
    assert len(exp_w6) == 2
    assert any("bundlSize: '5'" in d for _, _, d in exp_w6)
    assert any("(bundleSize-1: '9')" in d for _, _, d in exp_w6)
    # W3-W5 rows also line up (same serial/field set; streaming W5
    # details are terser, so compare on (serial, field))
    pair = lambda r: (r.serial_number, r.field_path)
    got_rest = sorted(
        pair(r) for r in got
        if r.field_path.startswith("metadata.serialId.")
        and r.field_path != "metadata.serialId.bundleSize"
    )
    exp_rest = sorted(
        pair(r) for r in batch_rows
        if r.field_path.startswith("metadata.serialId.")
        and r.field_path != "metadata.serialId.bundleSize"
    )
    assert got_rest == exp_rest


# r16 fast-tier split (VERDICT r15 item 3): this module is in the SLOW
# tier — long layout/stream/property sweeps excluded from the default
# `-m "not slow"` run (pytest.ini) so the driver's verify-window pytest
# completes; run the FULL suite with `pytest -m ""`.
import pytest as _pytest_r16

pytestmark = _pytest_r16.mark.slow
