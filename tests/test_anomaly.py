"""Windowed three-sigma anomaly detection: a planted spike fires, a
flat series never does (zero variance → NULL z2, flag 0), and the
algebra matches a plain-Python replica on a randomized series."""

from __future__ import annotations

import datetime as dt
import random

import pyspark.sql.functions as F

from dev_dot_cvp_metadata_ingestion_spark.operators.anomaly import (
    window_anomalies_from_counts,
    window_counts,
)

SCHEMA = "event_id long, ts timestamp, event_type string"


def _events(spark, counts_by_hour, event_type="click"):
    """One event row per unit of count, hour h → 2024-01-01 h:MM."""
    rows = []
    eid = 0
    for h, n in enumerate(counts_by_hour):
        for i in range(n):
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 1, 1 + h // 24, h % 24, i % 60, 0),
                    event_type,
                )
            )
            eid += 1
    return spark.createDataFrame(rows, SCHEMA)


def test_planted_spike_fires(spark):
    # 23 calm hours at ~10, one hour at 100: only the spike flags
    series = [10] * 10 + [11] * 13 + [100]
    ev = _events(spark, series)
    out = window_anomalies_from_counts(window_counts(ev)).collect()
    flagged = {r.window_start for r in out if r.is_anomaly == 1}
    assert flagged == {"2024-01-01 23:00:00"}
    spike = next(r for r in out if r.window_start == "2024-01-01 23:00:00")
    assert spike.n_events == 100
    assert spike.z2_milli > 9000  # z^2 > 9 by definition of the flag


def test_flat_series_zero_variance(spark):
    ev = _events(spark, [7] * 12)
    out = window_anomalies_from_counts(window_counts(ev)).collect()
    assert len(out) == 12
    assert all(r.is_anomaly == 0 for r in out)
    assert all(r.z2_milli is None for r in out)
    assert all(r.mean_milli == 7000 for r in out)


def test_matches_python_replica_randomized(spark):
    rng = random.Random(91)
    series = [rng.randint(5, 60) for _ in range(30)]
    # one guaranteed outlier so the positive branch is exercised
    series[17] = 500
    ev = _events(spark, series)
    got = {
        r.window_start: (r.n_events, r.mean_milli, r.z2_milli, r.is_anomaly)
        for r in window_anomalies_from_counts(window_counts(ev)).collect()
    }
    m = len(series)
    s = sum(series)
    v = sum(n * n for n in series)
    varm = m * v - s * s
    for h, n in enumerate(series):
        ws = f"2024-01-0{1 + h // 24} {h % 24:02d}:00:00"
        dev2k = (m * n - s) * (m * n - s) * 1000
        expect = (
            n,
            s * 1000 // m,
            dev2k // varm if varm else None,
            1 if dev2k > 9000 * varm else 0,
        )
        assert got[ws] == expect, ws


def test_multi_type_stats_are_independent(spark):
    # spike in 'error' must not flag the same hour of 'click'
    calm = _events(spark, [10, 11] * 6, "click")
    spiky = _events(spark, [10] * 11 + [90], "error")
    out = window_anomalies_from_counts(
        window_counts(calm.union(spiky))
    ).collect()
    flagged = {(r.event_type, r.window_start) for r in out if r.is_anomaly}
    assert flagged == {("error", "2024-01-01 11:00:00")}


def test_rolling_adapts_to_level_shift(spark):
    """A permanent level shift: the ROLLING baseline flags only the
    shift edge and re-calms once the new level ages into the frame;
    verdicts before 12 baseline windows are NULL (warmup)."""
    import os
    import tempfile

    from dev_dot_cvp_metadata_ingestion_spark.plans import registry

    registry.load_all()
    QUERIES = registry.QUERIES

    series = [10, 11] * 12 + [80, 81] * 20  # shift at hour 24, then calm
    ev = _events(spark, series)
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        rows = sorted(
            QUERIES["events_window_anomaly_rolling"](spark, d).collect(),
            key=lambda r: (r.event_type, r.window_start),
        )
    assert len(rows) == len(series)
    # warmup: first 12 windows have no verdict
    for r in rows[:12]:
        assert r.is_anomaly is None and r.base_n is None
    flagged = [i for i, r in enumerate(rows) if r.is_anomaly == 1]
    assert flagged, "shift edge must flag"
    assert min(flagged) == 24  # the first shifted hour
    # adapted: the tail of the new level is calm again
    assert all(r.is_anomaly == 0 for r in rows[-10:])


def test_headroom_no_int64_wrap_at_large_counts(spark):
    """ADVICE r9 regression: dev^2*1000 and the n^2/s^2 moments are
    DECIMAL(38,0)-lifted — verdicts and z2_milli must match exact
    Python integers at per-window counts (~1e9-1e12) where the old
    all-BIGINT arithmetic wrapped."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.anomaly import (
        window_anomalies_from_counts,
    )

    # 15 near-constant ~1e9 baselines + one 1e12 spike: max possible
    # z^2 for a single point is m-1, so m must exceed 10 for the
    # three-sigma predicate to be able to fire at all
    counts = [10**9 + (i % 7) for i in range(15)] + [10**12]
    rows = [(f"2026-01-01 {i:02d}:00:00", "t", c) for i, c in enumerate(counts)]
    wc = spark.createDataFrame(
        rows, "window_start string, event_type string, n_events long"
    )
    got = {
        r.window_start: (r.mean_milli, r.z2_milli, r.is_anomaly)
        for r in window_anomalies_from_counts(wc).collect()
    }
    m, s = len(counts), sum(counts)
    v = sum(c * c for c in counts)
    for (ws, _t, n) in rows:
        dev, varm = m * n - s, m * v - s * s
        want = (
            s * 1000 // m,
            (dev * dev * 1000) // varm if varm else None,
            int(dev * dev * 1000 > 9000 * varm),
        )
        assert got[ws] == want, (ws, got[ws], want)
    # the planted 1e12 spike must fire
    assert got["2026-01-01 15:00:00"][2] == 1
