"""Windowed count-anomaly detection over event streams — shared by the
batch ``events_window_anomaly`` query and the streaming anomaly monitor
(streaming/stream.py:anomaly_monitor_sink), so the streaming report is
pinned row-for-row to the batch semantics by construction (the same
batch/stream-sharing doctrine as operators/drift.py).

The detector is the classic three-sigma rule on per-window event
counts, computed WITHOUT any floating point: for an event type with
``m`` windows, window-count sum ``s`` and sum of squares ``v``, the
population z-score of a window with count ``n`` satisfies

    z^2 = (m*n - s)^2 / (m*v - s^2)

so ``|z| > 3``  iff  ``(m*n - s)^2 > 9*(m*v - s^2)`` — an exact BIGINT
predicate both engines evaluate identically (no sqrt, no libm, no
float summation order). ``z2_milli`` exposes the magnitude as
``floor(1000 * z^2)`` for ranking/thresholding consumers; it is NULL
when the variance is zero (all windows equal — nothing can be
anomalous, and the flag is 0 by the same predicate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def window_counts(
    events: DataFrame, ts_col: str = "ts", type_col: str = "event_type"
) -> DataFrame:
    """(window_start, event_type, n_events) per tumbling hour — one
    shuffle with map-side combine; the shared front half of batch and
    streaming anomaly detection. ``window_start`` crosses the engine
    boundary as a formatted string (repo determinism rule: never raw
    timestamps)."""
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", ts_col), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            F.col(type_col).alias("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def window_anomalies_from_counts(wc: DataFrame) -> DataFrame:
    """Per-window three-sigma anomaly report from a
    (window_start, event_type, n_events) count relation.

    Scale shape: the per-type moment relation is |event_types| rows —
    broadcast back onto the window counts (never a shuffle of the
    window relation, never a window function: the stats join is the
    whole detector). Everything stays BIGINT; at 100 TB the only
    growth is the window-count relation itself, which is
    |types| x |hours| — already aggregated, orders of magnitude below
    the raw events.

    Output columns: window_start, event_type, n_events, mean_milli
    (floor(1000 * per-type mean)), z2_milli (floor(1000 * z^2), NULL at
    zero variance), is_anomaly (0/1 BIGINT).
    """
    # the count relation feeds both the moment aggregate and the final
    # join; materialize once so the tokenize/scan lineage above it runs
    # a single time (same device as operators/drift.py)
    wc = wc.localCheckpoint()
    # Squared-deviation arithmetic is lifted to exact DECIMAL(38,0)
    # (ADVICE r9): dev^2 * 1000 wraps int64 once m*n_events reaches
    # ~1e8 (a year of hourly windows at ~11k events/hour), and the
    # n_events^2 / s^2 moments wrap on their own past n ~ 3e9. One
    # cast at the aggregate propagates decimal through dev/varm; the
    # FINAL quotients (z2_milli <= 1000*m, mean_milli) stay far inside
    # int64, which is the Spark decimal-`div` exactness condition
    # (decimal div == DuckDB HUGEINT // whenever the quotient fits
    # int64; the oracle mirrors with HUGEINT casts). Headroom is now
    # bounded by DECIMAL(38,0) itself: |dev| < ~3e17.
    st = wc.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("n_events").alias("s"),
        F.sum(
            F.col("n_events").cast("decimal(38,0)") * F.col("n_events")
        ).alias("v"),
    )
    j = wc.join(F.broadcast(st), "event_type")
    dev = F.col("m").cast("decimal(38,0)") * F.col("n_events") - F.col("s")
    varm = (
        F.col("m") * F.col("v")
        - F.col("s").cast("decimal(38,0)") * F.col("s")
    )
    return j.select(
        "window_start",
        "event_type",
        "n_events",
        F.expr("CAST(s AS DECIMAL(38,0)) * 1000 div m").alias("mean_milli"),
        (dev * dev * F.lit(1000)).alias("_num"),
        varm.alias("_varm"),
    ).select(
        "window_start",
        "event_type",
        "n_events",
        "mean_milli",
        F.expr("_num div nullif(_varm, 0)").alias("z2_milli"),
        (F.col("_num") > F.lit(9000) * F.col("_varm")).cast("long").alias(
            "is_anomaly"
        ),
    )
