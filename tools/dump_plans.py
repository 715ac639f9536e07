"""Dump .explain("formatted") for named queries to plans/<round>/.

Usage: python tools/dump_plans.py [--round rNN] <suffix> <name> [name ...]
Writes plans/<round>/<name>_<suffix>.txt for each query (sf0.001 input
so the dump is fast; plan SHAPE is what the files pin, not sizes).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROUND = "r16"


def main() -> None:
    args = sys.argv[1:]
    rnd = ROUND
    if args and args[0] == "--round":
        rnd = args[1]
        args = args[2:]
    suffix = args[0]
    names = args[1:]
    sf_dir = "/root/testdata/sf0.001"
    from dev_dot_cvp_metadata_ingestion_spark.plans import registry
    from dev_dot_cvp_metadata_ingestion_spark.session import get_spark

    registry.load_all()
    spark = get_spark("dump-plans")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / rnd
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({plan.count('Exchange')} Exchange)")
    spark.stop()


if __name__ == "__main__":
    main()
