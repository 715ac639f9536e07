"""Incremental connected-components labels (VERDICT r13 item 5): the
maintained ``labels/`` table of the pair-graph layout must equal a
full CC recompute over the CURRENT graph after any sequence of
appends and deletes — merges ride the contracted-label graph, splits
ride the touched-cluster re-solve — and replaying a batch must be a
labels no-op."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
    connected_components,
    lsh_near_duplicates,
)
from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
    append_pair_graph,
    delete_from_pair_graph,
    read_cluster_labels,
    read_pair_graph,
    write_cluster_labels,
    write_pair_graph,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )


def _full_labels(spark, path):
    pairs, nodes, _ = read_pair_graph(spark, path)
    return sorted(
        tuple(r) for r in connected_components(pairs, nodes).collect()
    )


def _maintained(spark, path):
    return sorted(tuple(r) for r in read_cluster_labels(spark, path).collect())


def _batch_pairs(spark, docs_so_far, batch_ids):
    """The rebuild's new pairs: every pair of the full graph over
    docs-so-far touching a batch doc (LSH pairs are pairwise, so this
    equals within-batch ∪ batch-vs-indexed exactly)."""
    p = lsh_near_duplicates(docs_so_far, "doc_id", "text")
    ids = spark.createDataFrame([(i,) for i in batch_ids], "doc_id long")
    a_in = p.join(
        ids.select(F.col("doc_id").alias("doc_id_a")), "doc_id_a", "semi"
    )
    b_in = p.join(
        ids.select(F.col("doc_id").alias("doc_id_b")), "doc_id_b", "semi"
    )
    return a_in.unionByName(b_in).distinct()


@pytest.mark.parametrize("splits", [[300, 500], [200, 350, 500],
                                    [450, 470, 500]])
def test_labels_after_appends_equal_full_recompute(spark, tmp_path, splits):
    docs = _docs(spark).filter(F.col("doc_id") < 500).localCheckpoint()
    path = str(tmp_path / "g")
    first = splits[0]
    write_pair_graph(docs.filter(F.col("doc_id") < first), path)
    write_cluster_labels(spark, path, n_parts=8)
    lo = first
    for hi in splits[1:]:
        batch = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        so_far = docs.filter(F.col("doc_id") < hi)
        ids = [r.doc_id for r in batch.select("doc_id").collect()]
        append_pair_graph(
            spark, path, batch.select("doc_id"),
            _batch_pairs(spark, so_far, ids),
        )
        lo = hi
    assert _maintained(spark, path) == _full_labels(spark, path)
    # and the on-disk graph equals a clean rebuild over all docs
    rebuilt = str(tmp_path / "rebuilt")
    write_pair_graph(docs, rebuilt)
    write_cluster_labels(spark, rebuilt, n_parts=8)
    assert _maintained(spark, path) == _maintained(spark, rebuilt)


def test_append_replay_is_labels_noop(spark, tmp_path):
    docs = _docs(spark).filter(F.col("doc_id") < 300).localCheckpoint()
    path = str(tmp_path / "g")
    write_pair_graph(docs.filter(F.col("doc_id") < 200), path)
    write_cluster_labels(spark, path, n_parts=8)
    batch = docs.filter(F.col("doc_id") >= 200)
    ids = [r.doc_id for r in batch.select("doc_id").collect()]
    bp = _batch_pairs(spark, docs, ids).localCheckpoint()
    append_pair_graph(spark, path, batch.select("doc_id"), bp)
    before = _maintained(spark, path)
    append_pair_graph(spark, path, batch.select("doc_id"), bp)  # replay
    assert _maintained(spark, path) == before


def test_synthetic_merge_and_bridge_split(spark, tmp_path):
    """Deterministic edge control: appended pairs chain three new docs
    A-B-C into ONE cluster (labels merge through the contracted
    graph); deleting the bridge B must SPLIT it back into {A}, {C}."""
    docs = _docs(spark).filter(F.col("doc_id") < 100)
    path = str(tmp_path / "g")
    write_pair_graph(docs, path)
    write_cluster_labels(spark, path, n_parts=4)

    def pair(a, b):
        return spark.createDataFrame(
            [(a, b, 1.0)], "doc_id_a long, doc_id_b long, jaccard double"
        )

    def nodes(*ids):
        return spark.createDataFrame([(i,) for i in ids], "doc_id long")

    A, B, C = 1000001, 1000002, 1000003
    append_pair_graph(spark, path, nodes(A, B), pair(A, B))
    labels = dict(_maintained(spark, path))
    assert labels[A] == labels[B] == A
    append_pair_graph(spark, path, nodes(C), pair(B, C))
    labels = dict(_maintained(spark, path))
    assert labels[A] == labels[B] == labels[C] == A

    delete_from_pair_graph(spark, path, nodes(B))
    labels = dict(_maintained(spark, path))
    assert B not in labels
    assert labels[A] == A and labels[C] == C  # split back to singletons
    # the general invariant: maintained ≡ full recompute on survivors
    assert _maintained(spark, path) == _full_labels(spark, path)


def test_delete_real_docs_keeps_full_recompute_invariant(spark, tmp_path):
    docs = _docs(spark).filter(F.col("doc_id") < 300)
    path = str(tmp_path / "g")
    write_pair_graph(docs, path)
    write_cluster_labels(spark, path, n_parts=8)
    # delete a doc that actually sits in a multi-member cluster
    lab = read_cluster_labels(spark, path)
    multi = (
        lab.groupBy("cluster_id").count().filter(F.col("count") > 1)
        .select("cluster_id")
    )
    victim_ids = (
        lab.join(multi, "cluster_id")
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id").limit(1).collect()
    )
    assert len(victim_ids) == 1, "fixture needs a multi-member cluster"
    victim = spark.createDataFrame(
        [(victim_ids[0].doc_id,)], "doc_id long"
    )
    delete_from_pair_graph(spark, path, victim)
    assert _maintained(spark, path) == _full_labels(spark, path)
    # double-delete is a no-op
    before = _maintained(spark, path)
    delete_from_pair_graph(spark, path, victim)
    assert _maintained(spark, path) == before


def test_rebuild_clears_stale_labels(spark, tmp_path):
    docs = _docs(spark).filter(F.col("doc_id") < 100)
    path = str(tmp_path / "g")
    write_pair_graph(docs, path)
    write_cluster_labels(spark, path, n_parts=4)
    assert len(_maintained(spark, path)) > 0
    write_pair_graph(docs.filter(F.col("doc_id") < 50), path)
    import os

    assert not os.path.isdir(f"{path}/labels")


def test_emptied_label_partition_physically_dropped(spark, tmp_path):
    """r14 review finding: dynamic overwrite never rewrites a touched
    partition whose rows were ALL removed — the stale file must be
    physically dropped, or the deleted doc resurrects once
    compact_pair_graph clears the tombstones."""
    from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
        compact_pair_graph,
    )

    docs = _docs(spark).filter(F.col("doc_id") < 60)
    path = str(tmp_path / "g")
    write_pair_graph(docs, path)
    # n_parts larger than the doc count: most docs sit ALONE in their
    # hash partition, so deleting one empties its partition
    write_cluster_labels(spark, path, n_parts=512)
    victim = spark.createDataFrame([(7,)], "doc_id long")
    delete_from_pair_graph(spark, path, victim)
    assert 7 not in dict(_maintained(spark, path))
    compact_pair_graph(spark, path)  # clears tombstones
    labels = dict(_maintained(spark, path))
    assert 7 not in labels, "deleted doc resurrected from stale partition"
    assert _maintained(spark, path) == _full_labels(spark, path)


def test_append_filters_tombstoned_endpoints(spark, tmp_path):
    """r14 review finding: a pair whose endpoint is tombstoned (e.g.
    from a stale LSH index entry) must not resurrect the deleted doc
    or fuse clusters through an edge read_pair_graph filters out —
    delete wins."""
    docs = _docs(spark).filter(F.col("doc_id") < 60)
    path = str(tmp_path / "g")
    write_pair_graph(docs, path)
    write_cluster_labels(spark, path, n_parts=8)

    def nodes(*ids):
        return spark.createDataFrame([(i,) for i in ids], "doc_id long")

    def pair(a, b):
        return spark.createDataFrame(
            [(a, b, 1.0)], "doc_id_a long, doc_id_b long, jaccard double"
        )

    A, B, C = 2000001, 2000002, 2000003
    append_pair_graph(spark, path, nodes(A, B), pair(A, B))
    delete_from_pair_graph(spark, path, nodes(B))
    # stale-index-shaped append: C pairs with the DELETED B
    append_pair_graph(spark, path, nodes(C), pair(B, C))
    labels = dict(_maintained(spark, path))
    assert B not in labels, "tombstoned endpoint resurrected"
    assert labels[A] == A and labels[C] == C  # not fused through B
    assert _maintained(spark, path) == _full_labels(spark, path)


def test_labels_layout_is_modality_agnostic(spark, tmp_path):
    """write_pair_graph_from_pairs: the maintained labels work over an
    EXPLICIT pair relation — here pHash-style frame-set Jaccard pairs
    over media postings — with the same append/delete/full-recompute
    invariants as the LSH text build."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
        fingerprint_set_jaccard_pairs,
    )
    from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
        write_pair_graph_from_pairs,
    )

    # videos 1,2 share all frames; 3 shares half with 2; 4 disjoint
    posts = spark.createDataFrame(
        [(1, "fA"), (1, "fB"), (2, "fA"), (2, "fB"),
         (3, "fB"), (3, "fC"), (4, "fZ")],
        ["doc_id", "fp"],
    )
    pairs = fingerprint_set_jaccard_pairs(
        posts, id_col="doc_id", fp_col="fp", threshold=0.4
    )
    nodes = posts.select("doc_id").distinct()
    path = str(tmp_path / "media_graph")
    write_pair_graph_from_pairs(nodes, pairs, path)
    write_cluster_labels(spark, path, n_parts=4)
    labels = dict(_maintained(spark, path))
    # (1,2) jaccard 1.0 and (2,3) jaccard 1/3 < 0.4 → {1,2}, {3}, {4}
    assert labels == {1: 1, 2: 1, 3: 3, 4: 4}
    assert _maintained(spark, path) == _full_labels(spark, path)

    # append: video 5 duplicates 3's frame set → merges with 3
    new_posts = spark.createDataFrame(
        [(5, "fB"), (5, "fC")], ["doc_id", "fp"]
    )
    new_pairs = fingerprint_set_jaccard_pairs(
        posts.unionByName(new_posts), id_col="doc_id", fp_col="fp",
        threshold=0.4,
    ).filter((F.col("doc_id_a") == 5) | (F.col("doc_id_b") == 5))
    append_pair_graph(
        spark, path, new_posts.select("doc_id").distinct(), new_pairs
    )
    labels = dict(_maintained(spark, path))
    assert labels[3] == labels[5] == 3
    assert _maintained(spark, path) == _full_labels(spark, path)

    # delete 1 → 2 becomes a singleton labelled by itself
    delete_from_pair_graph(
        spark, path, spark.createDataFrame([(1,)], "doc_id long")
    )
    labels = dict(_maintained(spark, path))
    assert 1 not in labels and labels[2] == 2
    assert _maintained(spark, path) == _full_labels(spark, path)


# r16 fast-tier split (VERDICT r15 item 3): this module is in the SLOW
# tier — long layout/stream/property sweeps excluded from the default
# `-m "not slow"` run (pytest.ini) so the driver's verify-window pytest
# completes; run the FULL suite with `pytest -m ""`.
import pytest as _pytest_r16

pytestmark = _pytest_r16.mark.slow
