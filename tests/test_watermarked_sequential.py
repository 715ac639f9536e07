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
