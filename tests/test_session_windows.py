"""Native session_window sessionization (streaming/windows.py) at
query scale: batch parity against the lag-based ``events_sessionize``
registered query, and stream-vs-batch equivalence under append-mode
watermark finalization.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dev_dot_cvp_metadata_ingestion_spark.plans import registry
from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import load_table
from dev_dot_cvp_metadata_ingestion_spark.streaming.windows import (
    session_event_stats,
)

SF_DIR = "/root/testdata/sf0.01"
GAP_US = 1_800_000_000  # 30 minutes

registry.load_all()


def test_session_window_matches_lag_sessionize(spark):
    """Per-user session count and the multiset of session sizes must
    match the lag-window form. The two differ only on deltas EXACTLY
    equal to the gap (half-open vs strict-greater) — assert the
    testdata has none, so the comparison is exact."""
    e = load_table(spark, SF_DIR, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    exact_boundary = (
        e.select(
            (
                F.unix_micros(F.col("ts"))
                - F.unix_micros(F.lag("ts").over(w))
            ).alias("delta")
        )
        .filter(F.col("delta") == GAP_US)
        .count()
    )
    assert exact_boundary == 0, "testdata has an exact-gap delta"

    sw = session_event_stats(e, gap="30 minutes")
    mine = sorted(
        (r.user_id, r.n_events)
        for r in sw.select("user_id", "n_events").collect()
    )

    # events_sessionize already emits one row per (user, session) with
    # its n_events
    lag_sessions = registry.QUERIES["events_sessionize"](spark, SF_DIR)
    theirs = sorted(
        (r.user_id, r.n_events)
        for r in lag_sessions.select("user_id", "n_events").collect()
    )
    assert mine == theirs


def test_session_window_stream_equals_batch(spark, tmp_path):
    """Streaming the events in timestamp-ordered file chunks through
    the same session_window aggregate reproduces the batch sessions
    whose end the final watermark passed; nothing extra is emitted."""
    e = load_table(spark, SF_DIR, "events").orderBy("ts")
    src = tmp_path / "src"
    src.mkdir()
    n_chunks = 8
    chunked = e.withColumn(
        "_chunk",
        F.ntile(n_chunks).over(
            __import__(
                "pyspark.sql.window", fromlist=["Window"]
            ).Window.orderBy("ts")
        ),
    )
    for i in range(1, n_chunks + 1):
        (
            chunked.filter(F.col("_chunk") == i)
            .drop("_chunk")
            .coalesce(1)
            .write.parquet(str(src / f"chunk_{i:02d}"))
        )

    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out_rows = []

    def sink(batch_df, batch_id):
        out_rows.extend(batch_df.collect())

    q = (
        session_event_stats(stream, gap="30 minutes", lateness="0 seconds")
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    streamed = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in out_rows
    )
    batch = session_event_stats(e, gap="30 minutes")
    max_ts = e.agg(F.max("ts")).collect()[0][0]
    finalized = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch.collect()
        if r.session_end <= max_ts
    )
    # everything the stream emitted must be a real batch session
    all_batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch.collect()
    }
    assert set(streamed) <= all_batch
    # and every session the final watermark definitely passed must have
    # been emitted
    assert set(finalized) <= set(streamed), (
        len(finalized),
        len(streamed),
    )
