"""One-giant-file measurement for the chunk-stitched sequential
validator (VERDICT r13 item 1).

The adversarial shape: a SINGLE multi-million-record file. The
single-window form's ``partitionBy(file)`` windows funnel the whole
W1-W8 stage through one task, so its wall-time doubles as the file
doubles regardless of core count. The claims under test:

- the chunked form (``sequential_results(..., n_chunks)``) spreads the
  window stage over >1 task — observed directly: wall-time scales
  sub-linearly as the file doubles on a multi-core local master, while
  the single-window control doubles;
- output stays bit-identical (count + checksum compared here; full
  row-level pins live in tests/test_sequential_chunked.py).

Usage: python tools/bench_seq_chunked.py [n_rows [n_chunks]]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def giant_file(spark, n_rows: int):
    """ONE file: bundles of 10, a deterministic sprinkle of recordId
    gaps and timestamp regressions so the error paths do real work."""
    return spark.range(n_rows).select(
        F.lit("giant").alias("file"),
        (F.col("id") / 10).cast("long").alias("bid"),
        F.col("id").alias("sn"),
        F.when(F.col("id") % 9973 == 5, (F.col("id") % 10) + 1)
        .otherwise(F.col("id") % 10)
        .alias("rid"),
        F.lit(10).cast("long").alias("bs"),
        F.timestamp_seconds(
            F.lit(1546300800)
            + F.col("id")
            - F.when(F.col("id") % 7919 == 3, 100).otherwise(0)
        ).alias("gen"),
        F.timestamp_seconds(F.lit(1546300800) + F.col("id")).alias("recv"),
        F.lit(True).alias("logf"),
    )


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from dev_dot_cvp_metadata_ingestion_spark.operators.sequential import (
        SequentialSpec,
        sequential_results,
    )
    from dev_dot_cvp_metadata_ingestion_spark.session import get_spark

    spark = get_spark("bench-seq-chunked")

    def spec() -> SequentialSpec:
        return SequentialSpec(
            file=F.col("file"),
            bundle_id=F.col("bid"),
            serial_number=F.col("sn"),
            record_id=F.col("rid"),
            bundle_size=F.col("bs"),
            record_generated_at=F.col("gen"),
            ode_received_at=F.col("recv"),
            has_log_file_name=F.col("logf"),
        )

    def checksum(df):
        # order-insensitive digest over the full result relation
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64("file", "serial_number", "field_path",
                           "valid", "details").cast("decimal(38,0)")
            ).alias("h"),
        ).first()
        return int(row["n"]), int(row["h"] or 0)

    out: dict = {"n_chunks": n_chunks, "sizes": {}}
    for rows in (n_rows // 2, n_rows):
        data = giant_file(spark, rows).localCheckpoint()
        timings = {}
        sums = {}
        for label, kwargs in (
            ("single_window", {}),
            ("chunked", {"n_chunks": n_chunks}),
        ):
            res = sequential_results(data, spec(), **kwargs)
            res.write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            sums[label] = checksum(sequential_results(data, spec(), **kwargs))
            timings[label] = round(time.perf_counter() - t0, 3)
        assert sums["single_window"] == sums["chunked"], sums
        out["sizes"][str(rows)] = {
            "rows": rows,
            "result_rows": sums["chunked"][0],
            **{f"{k}_sec": v for k, v in timings.items()},
        }
        data.unpersist()

    small, big = (out["sizes"][k] for k in sorted(out["sizes"], key=int))
    out["single_window_scale"] = round(
        big["single_window_sec"] / max(small["single_window_sec"], 1e-9), 2
    )
    out["chunked_scale"] = round(
        big["chunked_sec"] / max(small["chunked_sec"], 1e-9), 2
    )
    out["chunked_speedup_at_full"] = round(
        big["single_window_sec"] / max(big["chunked_sec"], 1e-9), 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
