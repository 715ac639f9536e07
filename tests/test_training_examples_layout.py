"""Persisted training-examples layout (VERDICT r8 item 6): the
curation+chunking half of the shard pipeline is seed-INDEPENDENT, so a
multi-epoch training run persists it once (write_training_examples)
and pays only the epoch_shard_manifest per seed — the same
build-once/probe-per-use recipe as the IVF and LSH layouts. Pins:
probe ≡ the registered in-query form row-for-row; a different seed
permutes but preserves the example multiset; the per-epoch plan reads
the persisted relation, not the raw corpus."""

from __future__ import annotations

import pytest

from dev_dot_cvp_metadata_ingestion_spark.plans import registry
from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
    epoch_shard_manifest,
    read_training_examples,
    write_training_examples,
)

registry.load_all()

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def layout(spark, tmp_path_factory):
    from dev_dot_cvp_metadata_ingestion_spark.plans.datapipe import (
        documents_training_examples,
    )

    p = str(tmp_path_factory.mktemp("tex") / "examples")
    write_training_examples(documents_training_examples(spark, SF), p)
    return p


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_probe_equals_in_query_shards(spark, layout):
    cols = ["doc_id", "chunk_id", "n_chunk_tokens", "shard_id", "position"]
    got = epoch_shard_manifest(
        read_training_examples(spark, layout), "epoch0", 16
    )
    ref = registry.QUERIES["documents_training_shards"](spark, SF)
    assert _rows(got, cols) == _rows(ref, cols)


def test_probe_equals_in_query_shards_packed(spark, layout):
    cols = [
        "doc_id", "chunk_id", "n_chunk_tokens", "shard_id",
        "position", "offset", "seq_id",
    ]
    got = epoch_shard_manifest(
        read_training_examples(spark, layout), "epoch0", 16, packed=True
    )
    ref = registry.QUERIES["documents_training_shards_packed"](spark, SF)
    assert _rows(got, cols) == _rows(ref, cols)


def test_new_seed_permutes_but_preserves_examples(spark, layout):
    ex = read_training_examples(spark, layout)
    e0 = epoch_shard_manifest(ex, "epoch0", 16)
    e1 = epoch_shard_manifest(ex, "epoch1", 16)
    ids = ["doc_id", "chunk_id", "n_chunk_tokens"]
    assert _rows(e0, ids) == _rows(e1, ids)  # same example multiset
    full = ids + ["shard_id", "position"]
    assert _rows(e0, full) != _rows(e1, full)  # different permutation


def test_per_epoch_plan_reads_persisted_not_raw(spark, layout):
    """The amortization claim in plan terms: the probe's physical plan
    scans the persisted examples parquet and contains none of the
    curation machinery (no joins — curation gates, mixture rates — and
    no token explode; exactly the one shard-window exchange plus the
    scan)."""
    got = epoch_shard_manifest(
        read_training_examples(spark, layout), "epoch0", 16
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "examples" in plan  # scans the persisted table
    assert "Join" not in plan
    assert "Generate" not in plan  # no chunk explode
    assert plan.count("Exchange hashpartitioning") == 1  # shard window
