"""Deterministic global-shuffle shard writer: reproducible permutation
(same seed → byte-identical shard contents; different seed → different
permutation), full coverage, uniform-ish shard sizes, and a plan with
one hash shuffle and no global sort."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
    shard_of,
    shuffle_key,
    write_shuffled_shards,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _shard_contents(spark, path):
    out = {}
    df = spark.read.parquet(path)
    for r in df.select("shard").distinct().collect():
        rows = (
            df.filter(F.col("shard") == r["shard"])
            .select("doc_id")
            .collect()
        )
        out[r["shard"]] = [x["doc_id"] for x in rows]
    return out


def test_same_seed_reproduces_identical_shards(spark, docs, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_shuffled_shards(docs, p1, "doc_id", n_shards=8, seed="e0")
    write_shuffled_shards(docs, p2, "doc_id", n_shards=8, seed="e0")
    assert _shard_contents(spark, p1) == _shard_contents(spark, p2)


def test_different_seed_changes_the_permutation(spark, docs, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_shuffled_shards(docs, p1, "doc_id", n_shards=8, seed="e0")
    write_shuffled_shards(docs, p2, "doc_id", n_shards=8, seed="e1")
    assert _shard_contents(spark, p1) != _shard_contents(spark, p2)


def test_full_coverage_no_dup_no_loss(spark, docs, tmp_path):
    p = str(tmp_path / "s")
    write_shuffled_shards(docs, p, "doc_id", n_shards=8, seed="e0")
    back = spark.read.parquet(p)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    # schema round-trips (plus the shard partition column)
    assert set(back.columns) == set(docs.columns) | {"shard"}


def test_shards_are_roughly_uniform(spark, docs, tmp_path):
    p = str(tmp_path / "s")
    write_shuffled_shards(docs, p, "doc_id", n_shards=8, seed="e0")
    sizes = [
        r["c"]
        for r in spark.read.parquet(p)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    n = sum(sizes)
    assert len(sizes) == 8
    # binomial concentration: each shard within 3x sqrt bounds of mean
    mean = n / 8
    slack = 4 * (mean**0.5) + 1
    assert all(abs(s - mean) <= slack for s in sizes)


def test_shuffle_decorrelates_ingest_order(spark, docs):
    """Adjacent doc_ids must not land adjacently: the mean |doc_id
    gap| between rank-neighbors within a shard should be large (a
    sorted-by-id layout would give ~n_shards)."""
    keyed = docs.select(
        "doc_id",
        shard_of(F.col("doc_id"), "e0", 8).alias("shard"),
        shuffle_key(F.col("doc_id"), "e0").alias("k"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("shard").orderBy("k")
    gaps = keyed.select(
        F.abs(
            F.col("doc_id") - F.lag("doc_id").over(w)
        ).alias("gap")
    ).agg(F.avg("gap")).first()[0]
    n = docs.count()
    assert gaps > n / 10  # random permutation averages ~n/3


def test_writer_rejects_colliding_columns(spark, docs):
    with pytest.raises(ValueError, match="collides"):
        write_shuffled_shards(
            docs.withColumn("shard", F.lit(1)), "/tmp/x", "doc_id"
        )


def test_empty_input_writes_empty_table(spark, docs, tmp_path):
    p = str(tmp_path / "s")
    write_shuffled_shards(docs.limit(0), p, "doc_id", n_shards=4, seed="e0")
    assert spark.read.parquet(p).count() == 0


def test_empty_and_nonempty_readback_schemas_match(spark, docs, tmp_path):
    """ADVICE r8: the empty branch writes `shard` as a regular column
    while the non-empty branch makes it a partition column whose type
    is partition-inferred (int) — consumers must see ONE read-back
    schema regardless of input size, or downstream unions/pruning
    logic drifts."""
    pe, pn = str(tmp_path / "e"), str(tmp_path / "n")
    write_shuffled_shards(docs.limit(0), pe, "doc_id", n_shards=4, seed="s")
    write_shuffled_shards(docs, pn, "doc_id", n_shards=4, seed="s")
    se = {f.name: f.dataType for f in spark.read.parquet(pe).schema.fields}
    sn = {f.name: f.dataType for f in spark.read.parquet(pn).schema.fields}
    assert se == sn


def test_manifest_plan_has_no_global_sort(spark, sf_dir):
    """The manifest's position column rides a window PARTITIONED by
    shard — one hash exchange, no range exchange (global sort) and no
    sampling job."""
    from dev_dot_cvp_metadata_ingestion_spark.plans import registry

    registry.load_all()
    plan = (
        registry.QUERIES["documents_shuffled_shards"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" not in plan.lower()


def test_writer_layout_matches_training_shards_manifest(spark, sf_dir, tmp_path):
    """Writing the terminal training examples through
    write_shuffled_shards (keyed on doc_id:chunk_id, same seed) must
    land every example in exactly the shard the
    documents_training_shards manifest assigns — the query IS the
    writer's layout, stated once."""
    from dev_dot_cvp_metadata_ingestion_spark.plans import registry

    registry.load_all()
    ex = registry.QUERIES["documents_training_examples"](spark, sf_dir).select(
        "doc_id",
        "chunk_id",
        F.concat_ws(
            ":", F.col("doc_id").cast("string"), F.col("chunk_id").cast("string")
        ).alias("example_id"),
    )
    p = str(tmp_path / "ts")
    write_shuffled_shards(ex, p, "example_id", n_shards=16, seed="epoch0")
    written = {
        (r["doc_id"], r["chunk_id"]): r["shard"]
        for r in spark.read.parquet(p).collect()
    }
    manifest = {
        (r["doc_id"], r["chunk_id"]): r["shard_id"]
        for r in registry.QUERIES["documents_training_shards"](
            spark, sf_dir
        ).collect()
    }
    assert written == manifest


# r16 fast-tier split (VERDICT r15 item 3): this module is in the SLOW
# tier — long layout/stream/property sweeps excluded from the default
# `-m "not slow"` run (pytest.ini) so the driver's verify-window pytest
# completes; run the FULL suite with `pytest -m ""`.
import pytest as _pytest_r16

pytestmark = _pytest_r16.mark.slow
