"""operators/anomaly.py:theil_sen_from_counts — robustness pins: an
exact linear series recovers its slope exactly; one outlier hour that
visibly drags the OLS slope leaves the Theil-Sen median unmoved; the
lower-median tie convention is integral."""

from __future__ import annotations

from dev_dot_cvp_metadata_ingestion_spark.operators.anomaly import (
    theil_sen_from_counts,
    trend_from_counts,
)


def _wc(spark, series):
    rows = [
        (f"2024-01-01 {h:02d}:00:00", t, y)
        for t, ys in series.items()
        for h, y in enumerate(ys)
    ]
    return spark.createDataFrame(
        rows, "window_start string, event_type string, n_events long"
    )


def test_exact_linear_series_recovers_slope(spark):
    # y = 10 + 3x: every pairwise slope is exactly 3
    got = theil_sen_from_counts(
        _wc(spark, {"a": [10 + 3 * x for x in range(10)]})
    ).collect()
    assert len(got) == 1
    assert got[0].slope_micro == 3_000_000
    assert got[0].n_pairs == 45


def test_outlier_moves_ols_not_theil_sen(spark):
    ys = [10 + 3 * x for x in range(10)]
    ys[5] = 1000  # one backfill spike
    wc = _wc(spark, {"a": ys})
    ts = theil_sen_from_counts(wc).collect()[0]
    ols = trend_from_counts(wc).collect()[0]
    assert ts.slope_micro == 3_000_000  # median unmoved
    assert abs(ols.slope_micro - 3_000_000) > 1_000_000  # OLS dragged


def test_per_type_isolation(spark):
    got = {
        r.event_type: r.slope_micro
        for r in theil_sen_from_counts(
            _wc(spark, {"up": [1, 2, 3, 4], "down": [9, 7, 5, 3]})
        ).collect()
    }
    assert got == {"up": 1_000_000, "down": -2_000_000}
