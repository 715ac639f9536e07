"""Stateful streaming: per-bundle state must survive micro-batch
boundaries — a serial gap whose two sides arrive in DIFFERENT batches
is only detectable with cross-batch state."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dev_dot_cvp_metadata_ingestion_spark.streaming.stateful import (
    stateful_sequential_checks,
)


def _rec(bid, sn, rid, bs=10):
    return {
        "bid": bid, "sn": sn, "rid": rid, "bs": bs,
        "gen_epoch": 1546300800 + sn, "recv_epoch": 1546300800 + sn,
    }


def test_cross_batch_gap_detection(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # batch 1: bundle 7 records sn 0..2 (clean so far)
    (src / "f1.json").write_text(
        "\n".join(json.dumps(_rec(7, sn, sn)) for sn in range(3))
    )
    # batch 2 (separate file → separate micro-batch with
    # maxFilesPerTrigger=1): continuation with a gap: sn jumps 2 → 5
    (src / "f2.json").write_text(
        "\n".join(json.dumps(_rec(7, sn, sn)) for sn in (5, 6))
    )

    schema = (
        "bid long, sn long, rid long, bs long, gen_epoch long, recv_epoch long"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("stream_key", F.lit("s1"))
    )
    errors = stateful_sequential_checks(stream)
    q = (
        errors.writeStream.format("memory")
        .queryName("seq_errors")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "availableNow drain timed out"

    rows = spark.sql("select * from seq_errors").collect()
    sn_gaps = [
        r for r in rows
        if r.field_path == "metadata.serialId.serialNumber"
    ]
    rid_gaps = [
        r for r in rows if r.field_path == "metadata.serialId.recordId"
    ]
    # exactly the cross-batch jump 2→5, once per check, nothing else
    assert len(sn_gaps) == 1 and len(rid_gaps) == 1
    assert "Expected serialNumber '3' but got '5'" in sn_gaps[0].details
    assert sn_gaps[0].serial_number == 5
    assert len(rows) == 2
