"""Single-node throughput: this engine vs the reference validator.

Generates an NDJSON file of ODE-style records (mix of valid/invalid,
FIXTURES.md §F1), then times:

* the reference's interpreted per-row validator
  (odevalidator.TestCase.validate_queue, imported from /root/reference)
* this engine's compiled-Column validation (+ tallies) on the same file

Prints one JSON line with records/sec for both and the speedup.
Usage: python tools/bench_vs_reference.py [n_records]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pkg_resources  # noqa: F401  (system copy before reference path)

sys.path.append("/root/reference")

CONFIG = "/root/reference/odevalidator/config_2.ini"


def make_records(n: int) -> list[str]:
    lines = []
    for i in range(n):
        bad = i % 7 == 0
        rec = {
            "metadata": {
                "recordGeneratedAt": "2019-01-01T00:00:00.000Z",
                "recordGeneratedBy": "OBU",
                "recordType": "bsmTx",
                "sanitized": "False",
                "schemaVersion": 6,
                "securityResultCode": "success" if not bad else "bogus",
                "bsmSource": "EV",
                "payloadType": "us.dot.its.jpo.ode.model.OdeBsmPayload",
                "logFileName": "bsmTx_f.log",
                "odeReceivedAt": "2019-01-01T00:00:01.000Z",
                "serialId": {
                    "streamId": "s",
                    "bundleSize": 10,
                    "bundleId": i // 10,
                    "recordId": i % 10,
                    "serialNumber": i,
                },
                "receivedMessageDetails": {
                    "locationData": {
                        "latitude": 40.0 if not bad else 95.0,
                        "longitude": -105.0,
                        "elevation": "1600",
                        "speed": 10.0,
                        "heading": 90.0,
                    },
                    "rxSource": "NA",
                },
            },
            "payload": {},
        }
        lines.append(json.dumps(rec))
    return lines


def time_reference(path: str) -> float:
    import queue

    from odevalidator.validator import TestCase

    tc = TestCase(CONFIG)
    q = queue.Queue()
    with open(path) as fh:
        for line in fh:
            if line.strip():
                q.put(line)
    t0 = time.perf_counter()
    results = tc.validate_queue(q)
    dt = time.perf_counter() - t0
    assert results
    return dt


def time_engine(path: str) -> float:
    from dev_dot_cvp_metadata_ingestion_spark.operators.validation import (
        validation_summary,
    )
    from dev_dot_cvp_metadata_ingestion_spark.session import get_spark
    from dev_dot_cvp_metadata_ingestion_spark.sources.rules import load_rules_file

    spark = get_spark("bench-vs-ref")
    ruleset = load_rules_file(CONFIG)
    # warm-up on a tiny slice so codegen/JIT isn't billed to the run
    warm = spark.read.json(path).limit(10)
    validation_summary(
        warm.withColumn("f", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("w")),
        ruleset,
        "f",
    ).collect()

    t0 = time.perf_counter()
    from pyspark.sql import functions as F

    df = spark.read.json(path).withColumn("f", F.lit("bench"))
    out = validation_summary(df, ruleset, "f").collect()
    dt = time.perf_counter() - t0
    assert out and out[0].records > 0
    spark.stop()
    return dt


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    with tempfile.TemporaryDirectory() as d:
        path = str(Path(d) / "bench.json")
        Path(path).write_text("\n".join(make_records(n)))
        ref_sec = time_reference(path)
        eng_sec = time_engine(path)
    print(
        json.dumps(
            {
                "n_records": n,
                "n_rules": 44,
                "reference_sec": round(ref_sec, 3),
                "engine_sec": round(eng_sec, 3),
                "reference_rec_per_sec": round(n / ref_sec),
                "engine_rec_per_sec": round(n / eng_sec),
                "speedup": round(ref_sec / eng_sec, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
