"""documents_substring_scrubbed: isolated timing + spill check at
sf0.1 (VERDICT r9 item 7). Runs the registered query in isolation at
several spark.sql.shuffle.partitions settings and reads
memory/disk-spill totals from the Spark UI REST API afterwards.

Usage: python tools/bench_substring_spill.py [sf_dir] [parts...]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def spill_totals(spark):
    ui = spark.sparkContext.uiWebUrl
    apps = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications")
    )
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    return mem, disk


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    parts = [int(a) for a in sys.argv[2:]] or [8, 32, 128]
    from dev_dot_cvp_metadata_ingestion_spark.plans import (  # noqa: F401
        cvp,
        datapipe,
        pipeline,
        relational,
    )
    from dev_dot_cvp_metadata_ingestion_spark.plans.registry import QUERIES
    from dev_dot_cvp_metadata_ingestion_spark.session import get_spark

    spark = get_spark(extra_conf={"spark.ui.enabled": "true"})
    print(f"{'parts':>6} {'sec':>7} {'mem_spill':>12} {'disk_spill':>12} rows")
    for p in parts:
        spark.conf.set("spark.sql.shuffle.partitions", str(p))
        m0, d0 = spill_totals(spark)
        t0 = time.time()
        n = QUERIES["documents_substring_scrubbed"](spark, sf_dir).count()
        dt = time.time() - t0
        m1, d1 = spill_totals(spark)
        print(f"{p:>6} {dt:>7.2f} {m1 - m0:>12} {d1 - d0:>12} {n}")
    spark.conf.set("spark.sql.shuffle.partitions", "32")


if __name__ == "__main__":
    main()
