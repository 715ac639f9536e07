"""Data-skipping layouts: sorted-file footer envelopes and directory
partition pruning.

`write_sorted_layout` range-partitions on the sort key so each parquet
file covers a narrow, non-overlapping key envelope. Spark's parquet
reader applies footer min/max statistics at the ROW-GROUP level (the
planned-file metric doesn't shrink), so the test asserts the property
that drives the skipping — with the sorted layout, most files'
[min, max] envelopes are disjoint from a selective predicate, while the
unsorted control's envelopes all straddle it — plus the end-to-end
directory form, where Hive-style partition pruning measurably cuts the
files a filtered scan plans (`numFiles` scan metric).
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
    load_table,
    write_sorted_layout,
)

N_FILES = 16
LO, HI = 10, 20  # a narrow slice of the user_id domain


def _envelopes(path):
    """Per-file (min, max) of user_id from the parquet footers."""
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for c in range(md.num_columns):
                col = md.row_group(rg).column(c)
                if col.path_in_schema == "user_id" and col.statistics:
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
        if mins:
            out.append((min(mins), max(maxs)))
    return out


def test_sorted_layout_envelopes_enable_skipping(spark, tmp_path):
    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    sorted_path = str(tmp_path / "sorted")
    unsorted_path = str(tmp_path / "unsorted")
    write_sorted_layout(ev, sorted_path, ["user_id"], n_files=N_FILES)
    ev.repartition(N_FILES).write.mode("overwrite").parquet(unsorted_path)

    env_s = _envelopes(sorted_path)
    env_u = _envelopes(unsorted_path)
    # repartitionByRange samples to pick boundaries, so a run can
    # occasionally land an empty partition (no footer row): tolerate
    # up to 2 missing files without weakening the skipping property
    assert N_FILES - 2 <= len(env_s) <= N_FILES, env_s
    assert N_FILES - 2 <= len(env_u) <= N_FILES, env_u

    def skippable(envs):
        return sum(1 for lo, hi in envs if lo > HI or hi < LO)

    # control: the unsorted layout scatters the key range across every
    # file, so NO file's envelope excludes the slice — without this the
    # sorted assertion could pass vacuously on a tiny key domain
    assert skippable(env_u) == 0, env_u
    # sorted: all but the 1-2 files whose range covers [LO, HI] are
    # provably skippable from footers alone
    assert skippable(env_s) >= len(env_s) - 2, env_s

    # the filtered scans agree row-for-row
    pred = (F.col("user_id") >= LO) & (F.col("user_id") <= HI)
    a = sorted(
        tuple(r)
        for r in spark.read.parquet(sorted_path).filter(pred).collect()
    )
    b = sorted(
        tuple(r)
        for r in spark.read.parquet(unsorted_path).filter(pred).collect()
    )
    assert a == b and a


def _scan_num_files(df):
    df.collect()
    node = df._jdf.queryExecution().executedPlan()
    while node.children().length() > 0:
        node = node.children().apply(0)
    return int(node.metrics().apply("numFiles").value())


def test_directory_partitioning_prunes_planned_files(spark, tmp_path):
    """Hive-style directory partitioning: a filter on the partition
    column must cut the files the scan PLANS (numFiles metric), not
    just the rows it returns — the coarse-grained layout lever that
    composes with the sorted-file envelopes above."""
    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    path = str(tmp_path / "by_type")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(path)

    all_files = _scan_num_files(spark.read.parquet(path))
    one = _scan_num_files(
        spark.read.parquet(path).filter(F.col("event_type") == "signup")
    )
    assert one < all_files, (one, all_files)
    assert one <= all_files / 2
