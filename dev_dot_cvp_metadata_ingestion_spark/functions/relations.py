"""Relation-shape utilities shared across operator families."""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance_narrow_scan(df: DataFrame) -> DataFrame:
    """Round-robin-rebalance a relation whose scan yields fewer
    partitions than the session's parallelism — the optimization
    guide's input-skew rule ("one huge unsplittable file: repartition
    immediately after the read"). A single-row-group parquet file
    cannot be split, so every downstream projection (tokenize, shingle,
    md5, rule evaluation) runs on ONE core no matter how many the
    session has; one cheap round-robin exchange of the raw rows ahead
    of the expensive projection restores core-parallelism.

    Scale-adaptive, not a local[32] constant: the exchange exists only
    when the scan is under half the session's default parallelism — a
    realistically multi-file table at cluster scale passes through
    untouched, so no extra corpus shuffle is ever added where the scan
    is already parallel. Round-robin repartition keeps Spark's
    sort-before-repartition determinism under task retry; consumers in
    this repo are partitioning-invariant (directly pinned by
    tests/test_partition_invariance.py).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= target:
        return df.repartition(target)
    return df
