"""Watermarked windowed aggregation (SURVEY §2.9 — the late-data
surface the reference never needed: its Lambda sees whole files, so
"late" cannot happen; a continuous event stream can deliver records
arbitrarily out of order).

``withWatermark`` bounds the aggregation state: a tumbling window
finalizes (append mode emits it, its state is dropped) once the
watermark — max observed event time minus the allowed lateness —
passes the window end; rows arriving later than that are discarded.
State is therefore O(windows inside the lateness horizon × group
keys), independent of stream length — the property that lets this run
indefinitely on a 1000-executor cluster.

Semantics caveat (measured, and per the Spark guarantee): dropping
late rows is one-sided — rows within the threshold are NEVER dropped,
but rows beyond it are only GUARANTEED dropped once the watermark
advanced a full trigger earlier (the late-record filter applies the
previous batch's watermark, while state eviction uses the current
one). Plan consumers for eventual, not instantaneous, lateness
enforcement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    lateness: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts per key with bounded lateness.

    Works on a STREAMING frame (append-mode finalization + late-row
    drop, the intended use) and on a batch frame (same plan, no
    watermark semantics) for parity testing. Output:
    (window_start, window_end, <key_col>, n_events).
    """
    d = events
    if d.isStreaming:
        d = d.withWatermark(ts_col, lateness)
    return (
        d.groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def session_event_stats(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    lateness: str = "2 hours",
) -> DataFrame:
    """Gap-based sessionization via the native ``session_window``
    aggregate — the streaming-capable twin of the batch
    ``events_sessionize`` query (which uses a lag-window over a static
    frame). Sessions merge while consecutive events are < gap apart;
    state per (key, open session) is bounded and evicted once the
    watermark passes the session end, so an indefinite stream holds
    state only for sessions inside the lateness horizon.

    Works on streaming frames (append-mode finalization) and batch
    frames (same plan, no watermark) for parity testing. Boundary
    semantics vs the lag form: a delta of EXACTLY the gap starts a new
    session here (session extent is the half-open [ts, ts+gap)) but
    continues the session in the lag form's strict ``delta > gap``
    test — equal-to-gap deltas are measure-zero for microsecond
    timestamps; the equivalence test asserts none exist before
    comparing. Output: (<key_col>, session_start, session_end,
    n_events)."""
    d = events
    if d.isStreaming:
        d = d.withWatermark(ts_col, lateness)
    return (
        d.groupBy(
            F.session_window(F.col(ts_col), gap).alias("sw"), key_col
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
