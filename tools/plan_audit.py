"""Plan audit: one row of physical-plan statistics per registered
query — the round-over-round diff surface for catching plan
regressions (a new exchange, a lost broadcast, a Python node) without
reading 107 explain dumps.

Usage: python tools/plan_audit.py [sf_dir] [name ...]
Output: TSV  name  scans  hash_ex  range_ex  bcast_joins  smj  windows
             generates  python_nodes  reused_ex
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from dev_dot_cvp_metadata_ingestion_spark.plans import registry
    from dev_dot_cvp_metadata_ingestion_spark.session import get_spark

    registry.load_all()
    names = sys.argv[2:] or list(registry.ordered_queries())
    spark = get_spark("plan-audit")
    cols = (
        "name scans hash_ex range_ex bcast smj windows generate "
        "python reused"
    ).split()
    print("\t".join(cols))
    for name in names:
        try:
            plan = (
                registry.QUERIES[name](spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # noqa: BLE001 - audit must not abort
            print(f"{name}\tERROR: {type(e).__name__}")
            continue
        row = [
            name,
            plan.count("Scan parquet"),
            plan.count("Exchange hashpartitioning"),
            plan.count("Exchange rangepartitioning"),
            plan.count("BroadcastHashJoin")
            + plan.count("BroadcastNestedLoopJoin"),
            plan.count("SortMergeJoin"),
            plan.count("Window"),
            plan.count("Generate"),
            plan.count("BatchEvalPython") + plan.count("ArrowEvalPython"),
            plan.count("ReusedExchange"),
        ]
        print("\t".join(str(x) for x in row))


if __name__ == "__main__":
    main()
