"""Persisted window-count relation (the monitor family's shared front
half, ninth build-once layout): every events_* detector probed over
``read_window_counts`` must return EXACTLY its registered in-query
rows; delta appends (the streaming monitors' additive state format)
must re-aggregate to the batch bootstrap; re-delivered batch ids must
not double-count; compaction folds deltas with detector outputs
unchanged."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dev_dot_cvp_metadata_ingestion_spark.operators.anomaly import (
    acf_from_counts,
    cusum_from_counts,
    forecast_next_window,
    mad_anomalies_from_counts,
    seasonal_anomalies_from_counts,
    seasonal_decompose_counts,
    trend_from_counts,
    window_anomalies_from_counts,
    window_counts,
)
from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
    append_window_counts,
    compact_window_counts,
    load_table,
    read_window_counts,
    write_window_counts,
)

DETECTORS = [
    window_anomalies_from_counts,
    seasonal_anomalies_from_counts,
    cusum_from_counts,
    mad_anomalies_from_counts,
    trend_from_counts,
    seasonal_decompose_counts,
    acf_from_counts,  # r11: the series-memory diagnostic probes too
    forecast_next_window,  # r11: one-step-ahead forecast probes too
]


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@pytest.fixture(scope="module")
def layout(spark, events, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("wc") / "counts")
    write_window_counts(events, p)
    return p


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_every_detector_probe_equals_in_query(spark, events, layout):
    """The six-detector family over the persisted relation ≡ the same
    detectors over the in-query window_counts(events) — so a
    monitoring deployment runs ALL detectors for one corpus pass."""
    wc_disk = read_window_counts(spark, layout)
    wc_live = window_counts(events)
    for det in DETECTORS:
        got = _rows(det(wc_disk))
        want = _rows(det(wc_live))
        assert got == want and got, det.__name__


def test_append_deltas_equal_bootstrap_and_redelivery_is_idempotent(
    spark, events, tmp_path
):
    """Split-shard appends (including a window straddling both shards)
    must re-aggregate to the full bootstrap; re-delivering a batch id
    rewrites its partition instead of double-counting."""
    p = str(tmp_path / "inc")
    first = events.filter(F.col("user_id") % 2 == 0)
    second = events.filter(F.col("user_id") % 2 == 1)
    write_window_counts(first, p)
    append_window_counts(second, p, batch_id=1)
    want = _rows(window_counts(events))
    assert _rows(read_window_counts(spark, p)) == want
    # at-least-once redelivery of batch 1: identical partition rewrite
    append_window_counts(second, p, batch_id=1)
    assert _rows(read_window_counts(spark, p)) == want
    # auto batch id allocation appends, never overwrites
    third = events.filter(F.lit(False))
    append_window_counts(third, p)  # empty shard: no-op
    assert _rows(read_window_counts(spark, p)) == want


def test_compaction_folds_deltas_detectors_unchanged(
    spark, events, tmp_path
):
    p = str(tmp_path / "cmp")
    write_window_counts(events.filter(F.col("user_id") % 2 == 0), p)
    append_window_counts(events.filter(F.col("user_id") % 2 == 1), p)
    before = {
        det.__name__: _rows(det(read_window_counts(spark, p)))
        for det in DETECTORS
    }
    compact_window_counts(spark, p)
    ids = [r.batch_id for r in spark.read.parquet(p).select("batch_id").distinct().collect()]
    assert ids == [0]
    after = {
        det.__name__: _rows(det(read_window_counts(spark, p)))
        for det in DETECTORS
    }
    assert after == before


def test_streaming_monitor_state_reads_back(spark, events, tmp_path):
    """A counts table maintained by the streaming monitor sinks'
    delta writes (same schema, same partitioning) is readable by
    read_window_counts with no conversion — the layout IS the
    streaming state format."""
    from dev_dot_cvp_metadata_ingestion_spark.streaming.stream import (
        _count_monitor_sink,
    )

    counts_p = str(tmp_path / "stream_counts")
    report_p = str(tmp_path / "stream_report")
    sink = _count_monitor_sink(
        counts_p, report_p, window_anomalies_from_counts
    )
    halves = [
        events.filter(F.col("user_id") % 2 == 0),
        events.filter(F.col("user_id") % 2 == 1),
    ]
    for i, h in enumerate(halves):
        sink(h, i)
    assert _rows(read_window_counts(spark, counts_p)) == _rows(
        window_counts(events)
    )
