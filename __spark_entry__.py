"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``dev_dot_cvp_metadata_ingestion_spark``; this
module just exposes the registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dev_dot_cvp_metadata_ingestion_spark.plans import registry as _registry

_registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The full CVP pipeline: INI rule compile → field validation →
    sequential (window) validation → per-file tallies.
    """
    return _registry.QUERIES["cv_validation_tallies"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, in
    driver-board order: the first 50 are one representative per
    operator family (registry.BOARD), the rest are within-family
    variants (registry.BACK) hash-checked locally."""
    return _registry.ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    ordered = _registry.ordered_queries()
    return {n: _registry.ORACLES[n] for n in ordered if n in _registry.ORACLES}
