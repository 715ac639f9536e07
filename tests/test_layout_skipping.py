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


def _envelopes_for(path, column):
    """Per-file (min, max) of ``column`` from the parquet footers."""
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for c in range(md.num_columns):
                col = md.row_group(rg).column(c)
                if col.path_in_schema == column and col.statistics:
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
        if mins:
            out.append((min(mins), max(maxs)))
    return out


def test_zorder_layout_skips_on_both_dimensions(spark, tmp_path):
    """Z-order vs lexicographic sort, from the real footers: the
    lexicographic (user_id, secs) layout skips on user_id but almost
    never on secs alone (every file straddles the secs domain),
    while the z-order layout's locality squares give BOTH columns
    narrow envelopes — selective slices on either dimension prune a
    large fraction of files."""
    from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
        write_zorder_layout,
    )

    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "user_id", F.unix_seconds(F.col("ts")).alias("secs")
    )
    zpath, lexpath = str(tmp_path / "z"), str(tmp_path / "lex")
    write_zorder_layout(ev, zpath, "user_id", "secs", n_files=N_FILES)
    write_sorted_layout(ev, lexpath, ["user_id", "secs"], n_files=N_FILES)

    bounds = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("secs"), F.max("secs")
    ).first()
    u0, u1, s0, s1 = bounds

    def skippable(envs, lo, hi):
        return sum(1 for mn, mx in envs if mn > hi or mx < lo)

    # a ~1/8 slice of each domain
    u_lo, u_hi = u0, u0 + (u1 - u0) // 8
    s_lo, s_hi = s0, s0 + (s1 - s0) // 8

    z_u = _envelopes_for(zpath, "user_id")
    z_s = _envelopes_for(zpath, "secs")
    l_u = _envelopes_for(lexpath, "user_id")
    l_s = _envelopes_for(lexpath, "secs")
    assert N_FILES - 2 <= len(z_u) <= N_FILES

    # control: lexicographic skips on the leading column...
    assert skippable(l_u, u_lo, u_hi) >= len(l_u) - 4
    # ...but (almost) never on the trailing one
    assert skippable(l_s, s_lo, s_hi) <= 2, l_s

    # z-order: BOTH dimensions prune a meaningful fraction of files
    zu, zs = skippable(z_u, u_lo, u_hi), skippable(z_s, s_lo, s_hi)
    assert zu >= len(z_u) // 2, (zu, z_u)
    assert zs >= len(z_s) // 2, (zs, z_s)

    # correctness: the z-layout serves identical rows for both slices
    for col, lo, hi in (("user_id", u_lo, u_hi), ("secs", s_lo, s_hi)):
        pred = (F.col(col) >= lo) & (F.col(col) <= hi)
        a = sorted(
            tuple(r) for r in spark.read.parquet(zpath).filter(pred).collect()
        )
        b = sorted(tuple(r) for r in ev.filter(pred).collect())
        assert a == b and a
