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

    Known costs, accepted deliberately (ADVICE r15): the
    ``df.rdd.getNumPartitions()`` probe forces physical planning of
    ``df`` at call time, and the decision depends on the host's
    defaultParallelism — so dumped plans are parallelism-dependent
    (plans/rNN dumps are all taken at the same default session), and
    call sites keep the probe off complex multi-consumer intermediates
    (the r16 kmeans/PQ sites gate it to raw-scan inputs for exactly
    this reason). The probe stays because it is the only EXACT source
    of the scan's split count: deriving it from the file listing would
    re-implement Spark's bin-packing (maxPartitionBytes/openCost) and
    silently drift from it.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= target:
        return df.repartition(target)
    return df
