"""Z-order layout: footer envelopes must enable skipping on EITHER
dimension, where a single-column sort only skips on its own key.

Proof is from the real parquet footers (same method as
test_layout_skipping): a file is provably skippable for a predicate
when its [min, max] envelope on that column is disjoint from the
slice. The single-sorted control pins the contrast — near-total
skipping on its sort key, none on the other dimension — so the
Z-order assertions can't pass vacuously."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
    load_table,
    write_sorted_layout,
    write_zorder_layout,
)

N_FILES = 16


def _envelopes(path, column):
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


def _skippable(envs, lo, hi):
    return sum(1 for a, b in envs if a > hi or b < lo)


def test_zorder_skips_on_both_dimensions(spark, tmp_path):
    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "single")
    write_zorder_layout(ev, zpath, "user_id", "ts_us", n_files=N_FILES)
    write_sorted_layout(ev, spath, ["user_id"], n_files=N_FILES)

    # narrow slices: ~7% of the user domain, ~10% of the time domain
    u_lo, u_hi = 10, 20
    bounds = ev.agg(F.min("ts_us"), F.max("ts_us")).collect()[0]
    t_lo = bounds[0]
    t_hi = t_lo + (bounds[1] - bounds[0]) // 10

    zu = _skippable(_envelopes(zpath, "user_id"), u_lo, u_hi)
    zt = _skippable(_envelopes(zpath, "ts_us"), t_lo, t_hi)
    su = _skippable(_envelopes(spath, "user_id"), u_lo, u_hi)
    st = _skippable(_envelopes(spath, "ts_us"), t_lo, t_hi)

    # control: single sort skips its own key near-totally, the other
    # dimension not at all
    assert su >= N_FILES - 2, su
    assert st == 0, st
    # z-order: meaningful skipping on BOTH dimensions (each file is a
    # rectangle; a 1-in-10 slice on either axis excludes most
    # rectangles)
    assert zu >= N_FILES // 2, (zu, _envelopes(zpath, "user_id"))
    assert zt >= N_FILES // 2, (zt, _envelopes(zpath, "ts_us"))

    # layouts agree row-for-row under both predicates
    for pred in [
        (F.col("user_id") >= u_lo) & (F.col("user_id") <= u_hi),
        (F.col("ts_us") >= t_lo) & (F.col("ts_us") <= t_hi),
    ]:
        a = sorted(
            tuple(r) for r in spark.read.parquet(zpath).filter(pred).collect()
        )
        b = sorted(
            tuple(r) for r in spark.read.parquet(spath).filter(pred).collect()
        )
        assert a == b and a


def test_zorder_empty_input_writes_empty_table(spark, tmp_path):
    """ADVICE r7: an empty input must write an empty table (same
    empty-input contract as every registered query), not crash on the
    NULL min/max aggregate."""
    ev = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("user_id", "event_id", F.unix_micros("ts").alias("ts_us"))
        .filter(F.lit(False))
    )
    path = str(tmp_path / "empty_z")
    write_zorder_layout(ev, path, "user_id", "ts_us", n_files=4)
    out = spark.read.parquet(path)
    assert out.count() == 0
    assert set(out.columns) == {"user_id", "event_id", "ts_us"}


def test_zorder_subunit_domain_still_buckets(spark, tmp_path):
    """ADVICE r7: a numeric domain narrower than 1.0 (doubles in
    [0, 0.05]) must still spread across the Morton buckets — the old
    max(span, 1) clamp collapsed it to a handful of low bits. Pinned
    on the interleave expression itself: sub-unit domains must produce
    (essentially) as many distinct z-keys as an integer-domain
    control, and a constant column must not crash (span == 0 path)."""
    from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import zorder_key

    n = 1024
    base = spark.range(n)
    sub = base.select(
        zorder_key(
            (F.col("id") / (n / 0.05)),  # doubles in [0, 0.05)
            (F.pmod(F.col("id") * 37, F.lit(n)) / (n / 0.05)),
            0.0, 0.05, 0.0, 0.05,
        ).alias("z")
    )
    ctl = base.select(
        zorder_key(
            F.col("id"),
            F.pmod(F.col("id") * 37, F.lit(n)),
            0, n - 1, 0, n - 1,
        ).alias("z")
    )
    n_sub = sub.select("z").distinct().count()
    n_ctl = ctl.select("z").distinct().count()
    assert n_sub >= n_ctl * 0.9, (n_sub, n_ctl)
    # degenerate constant domain: all rows map to one bucket, no crash
    const = base.select(
        zorder_key(F.lit(0.02), F.col("id"), 0.02, 0.02, 0, n - 1).alias("z")
    )
    assert const.select("z").distinct().count() == base.select(
        F.col("id")
    ).distinct().count() > 0
