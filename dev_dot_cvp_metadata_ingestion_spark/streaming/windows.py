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
