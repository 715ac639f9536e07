"""Time a subset of registered queries with the bench methodology
(warm once at sf0.001, then min of 2 consecutive noop-sink runs at the
given sf dir).

Usage: python tools/time_queries.py [--sf-dir DIR] name [name ...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(
        description="Time registered queries (bench methodology)."
    )
    ap.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.1",
        help="scale-factor data directory (default /root/testdata/sf0.1)",
    )
    ap.add_argument("names", nargs="+", help="registered query names")
    args = ap.parse_args()
    sf_dir = args.sf_dir
    names = args.names
    from dev_dot_cvp_metadata_ingestion_spark.plans import registry
    from dev_dot_cvp_metadata_ingestion_spark.session import get_spark

    registry.load_all()
    unknown = [n for n in names if n not in registry.QUERIES]
    if unknown:
        ap.error(f"unknown queries: {', '.join(unknown)}")
    spark = get_spark("time-queries")
    for name in names:
        fn = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        best = None
        for _ in range(2):
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{best:8.3f}  {name}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
