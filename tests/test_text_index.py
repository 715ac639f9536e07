"""Persisted text index: the prebuilt BM25 probe must return EXACTLY
the in-query bm25_topk rows (shared scoring tail ⇒ same scores, same
tie-breaks), the probe's postings scan must be partition-pruned to the
query terms' buckets, and the empty-corpus layout must stay readable
with an unchanged schema."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dev_dot_cvp_metadata_ingestion_spark.operators.retrieval import (
    bm25_probe_index,
    bm25_topk,
)
from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
    read_text_index,
    write_text_index,
)

QUERIES = [(1, "spark"), (1, "join"), (2, "window"), (2, "filter"), (3, "vector")]


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def index(spark, docs, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("textidx") / "index")
    write_text_index(docs, p, n_buckets=16)
    return p


def _q(spark, pairs=QUERIES):
    return spark.createDataFrame(pairs, "q_id long, term string")


def _rows(df):
    return sorted(
        (r.q_id, r.doc_id, r.score_ppm, r.rank) for r in df.collect()
    )


def test_probe_equals_in_query_form(spark, docs, index):
    pre = bm25_probe_index(spark, index, _q(spark), k=10)
    ref = bm25_topk(docs, _q(spark), k=10)
    got = _rows(pre)
    assert got == _rows(ref)
    assert got  # non-vacuous


def test_postings_roundtrip_totals(spark, docs, index):
    postings, corp = read_text_index(spark, index)
    t = corp.first()
    assert t["n_docs"] == docs.count()
    # dl is denormalized: per-doc it is single-valued and equals the
    # sum of that doc's term frequencies
    bad = (
        postings.groupBy("doc_id")
        .agg(
            F.countDistinct("dl").alias("ndl"),
            F.min("dl").alias("dl"),
            F.sum("tf").alias("stf"),
        )
        .filter((F.col("ndl") != 1) | (F.col("dl") != F.col("stf")))
        .count()
    )
    assert bad == 0
    assert postings.agg(F.sum("tf")).first()[0] == t["t_tokens"]


def test_probe_scan_is_partition_pruned(spark, index):
    """Buckets are computed driver-side from the query terms, so the
    bucket predicate is STATIC and must reach the postings scan as a
    PartitionFilter — only the probed buckets' files are read."""
    pre = bm25_probe_index(spark, index, _q(spark, [(1, "spark")]), k=5)
    plan = pre._jdf.queryExecution().executedPlan().toString()
    pf = [
        l
        for l in plan.splitlines()
        if "PartitionFilters" in l and "bucket" in l
    ]
    assert pf, plan[:2000]


def test_empty_query_set(spark, index):
    no_queries = spark.createDataFrame([], "q_id long, term string")
    assert bm25_probe_index(spark, index, no_queries, k=5).collect() == []


def test_empty_corpus_layout_readable_schema_stable(spark, docs, tmp_path):
    pe, pn = str(tmp_path / "e"), str(tmp_path / "n")
    write_text_index(docs.limit(0), pe, n_buckets=4)
    write_text_index(docs.limit(50), pn, n_buckets=4)
    empty_p, empty_t = read_text_index(spark, pe)
    full_p, _ = read_text_index(spark, pn)
    assert empty_p.count() == 0
    assert empty_t.first()["n_docs"] == 0
    assert dict(empty_p.dtypes) == dict(full_p.dtypes)
    # probing an empty index is well-defined: no rows
    assert bm25_probe_index(spark, pe, _q(spark), k=5).collect() == []


def test_append_equals_rebuild_and_leaves_old_files_untouched(
    spark, docs, tmp_path
):
    """append_text_index on a second shard must serve EXACTLY what a
    full rebuild over both shards serves, while the first build's
    postings files stay byte-identical on disk (pure file appends +
    the config-scale totals sidecar rewrite)."""
    import os

    from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
        append_text_index,
    )

    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    inc = str(tmp_path / "incremental")
    write_text_index(first, inc, n_buckets=16)

    def snapshot(root):
        out = {}
        for dirpath, _dirs, files in os.walk(f"{root}/postings"):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(dirpath, f)
                    st = os.stat(p)
                    out[p] = (st.st_size, st.st_mtime_ns)
        return out

    before = snapshot(inc)
    assert before  # non-vacuous
    append_text_index(second, inc)
    after = snapshot(inc)
    # every pre-append file unchanged (size AND mtime), new files added
    for p, sig in before.items():
        assert after[p] == sig, f"pre-append file rewritten: {p}"
    assert len(after) > len(before)

    full = str(tmp_path / "rebuild")
    write_text_index(docs, full, n_buckets=16)
    got = _rows(bm25_probe_index(spark, inc, _q(spark), k=10))
    want = _rows(bm25_probe_index(spark, full, _q(spark), k=10))
    assert got == want
    assert got  # non-vacuous
    # totals folded exactly
    _p, corp = read_text_index(spark, inc)
    _pf, corp_f = read_text_index(spark, full)
    assert corp.first().asDict() == corp_f.first().asDict()


def test_append_empty_shard_is_noop(spark, docs, tmp_path):
    from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
        append_text_index,
    )

    p = str(tmp_path / "idx")
    write_text_index(docs, p, n_buckets=16)
    before = _rows(bm25_probe_index(spark, p, _q(spark), k=10))
    append_text_index(docs.filter(F.lit(False)), p)
    after = _rows(bm25_probe_index(spark, p, _q(spark), k=10))
    assert before == after


def test_tombstone_delete_equals_rebuild_then_compact(spark, docs, tmp_path):
    """delete_from_text_index must serve EXACTLY what a rebuild over
    the surviving docs serves (postings anti-joined, totals delta-
    corrected, df re-derived from survivors) WITHOUT rewriting any
    postings file; compaction must physically drop the rows, clear the
    tombstones, and leave probe results row-for-row unchanged.
    Re-deleting the same ids must be a no-op (no totals double-count)."""
    import os

    from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
        compact_text_index,
        delete_from_text_index,
    )

    p = str(tmp_path / "deletable")
    write_text_index(docs, p, n_buckets=16)

    def postings_files():
        out = {}
        for dirpath, _dirs, files in os.walk(f"{p}/postings"):
            for f in files:
                if f.endswith(".parquet"):
                    fp = os.path.join(dirpath, f)
                    st = os.stat(fp)
                    out[fp] = (st.st_size, st.st_mtime_ns)
        return out

    victims = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    survivors = docs.filter(F.col("doc_id") % 5 != 0)

    before = postings_files()
    delete_from_text_index(spark, p, victims)
    assert postings_files() == before  # logical delete: zero rewrites

    ref_path = str(tmp_path / "rebuild")
    write_text_index(survivors, ref_path, n_buckets=16)
    got = _rows(bm25_probe_index(spark, p, _q(spark), k=10))
    want = _rows(bm25_probe_index(spark, ref_path, _q(spark), k=10))
    assert got == want and got  # exact and non-vacuous
    # totals delta-corrected exactly
    _po, tot = read_text_index(spark, p)
    _pr, tot_ref = read_text_index(spark, ref_path)
    assert tot.collect() == tot_ref.collect()
    # no deleted doc is served
    assert not {d for _q_, d, _s, _r in got} & {
        r.doc_id for r in victims.collect()
    }

    # double-delete is a no-op
    delete_from_text_index(spark, p, victims)
    _po2, tot2 = read_text_index(spark, p)
    assert tot2.collect() == tot_ref.collect()
    assert _rows(bm25_probe_index(spark, p, _q(spark), k=10)) == want

    # compaction: physical reclaim, probes unchanged, tombstones gone
    compact_text_index(spark, p)
    assert not os.path.isdir(f"{p}/tombstones")
    from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
        _table_dir,
        prune_text_index_generations,
    )

    raw = spark.read.parquet(_table_dir(p, "postings"))
    assert raw.join(victims, "doc_id").count() == 0
    assert _rows(bm25_probe_index(spark, p, _q(spark), k=10)) == want
    # the old generation stays for in-flight readers until pruned
    assert os.path.isdir(f"{p}/postings")
    prune_text_index_generations(spark, p)
    assert not os.path.isdir(f"{p}/postings")
    assert _rows(bm25_probe_index(spark, p, _q(spark), k=10)) == want


def test_compact_crash_before_flip_leaves_old_generation_readable(
    spark, docs, tmp_path
):
    """r10 VERDICT: a kill between the compacted generation's write
    and the commit-marker flip must leave the index exactly as it was
    — old generation resolved, tombstones active, probes unchanged.
    Simulated as the exact on-disk state: a complete-looking (even a
    HALF-written) postings_v1 dir with NO _gen_v1.committed marker.
    A subsequent compaction retry must converge (overwrites v1, then
    flips)."""
    import os

    from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
        _table_dir,
        compact_text_index,
        delete_from_text_index,
    )

    p = str(tmp_path / "crashcompact")
    write_text_index(docs, p, n_buckets=16)
    victims = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    delete_from_text_index(spark, p, victims)
    want = _rows(bm25_probe_index(spark, p, _q(spark), k=10))
    tot_want = read_text_index(spark, p)[1].first().asDict()

    # crash state: a half-written next generation, no marker
    os.makedirs(f"{p}/postings_v1/bucket=0", exist_ok=True)
    with open(f"{p}/postings_v1/bucket=0/part-garbage.parquet", "wb") as f:
        f.write(b"\x00not a parquet file")
    assert _table_dir(p, "postings") == f"{p}/postings"  # old gen current
    assert _rows(bm25_probe_index(spark, p, _q(spark), k=10)) == want
    assert read_text_index(spark, p)[1].first().asDict() == tot_want

    # the retry overwrites the dead generation and flips atomically
    compact_text_index(spark, p)
    assert _table_dir(p, "postings") == f"{p}/postings_v1"
    assert not os.path.isdir(f"{p}/tombstones")
    assert _rows(bm25_probe_index(spark, p, _q(spark), k=10)) == want
    assert read_text_index(spark, p)[1].first().asDict() == tot_want


def test_delete_crash_window_never_double_subtracts(spark, docs, tmp_path):
    """r10 ADVICE: delete_from_text_index appends tombstones BEFORE
    overwriting totals. A crash between the two (simulated here as the
    exact on-disk state: ids tombstoned, totals untouched) must leave
    (a) reads already serving post-delete postings, (b) a RETRIED
    delete a true no-op — totals must NOT be subtracted for ids that
    are already tombstoned (the old order made retry double-subtract,
    permanently corrupting BM25 length normalization), and (c)
    compaction self-healing totals to the rebuild-without-victims
    value by recomputing them from surviving postings."""
    from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
        compact_text_index,
        delete_from_text_index,
    )

    p = str(tmp_path / "crashy")
    write_text_index(docs, p, n_buckets=16)
    victims = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    survivors = docs.filter(F.col("doc_id") % 5 != 0)
    tot_before = read_text_index(spark, p)[1].first().asDict()

    # crash state: tombstones landed, totals write never ran
    victims.distinct().write.mode("append").parquet(f"{p}/tombstones")
    posts, tot_stale = read_text_index(spark, p)
    assert posts.join(victims, "doc_id").count() == 0  # reads correct
    assert tot_stale.first().asDict() == tot_before  # stale-high, not corrupt

    # the retry: every id is already tombstoned => totals delta is 0
    delete_from_text_index(spark, p, victims)
    assert read_text_index(spark, p)[1].first().asDict() == tot_before

    # compaction recomputes totals from survivors — full repair
    compact_text_index(spark, p)
    ref_path = str(tmp_path / "rebuild")
    write_text_index(survivors, ref_path, n_buckets=16)
    assert (
        read_text_index(spark, p)[1].first().asDict()
        == read_text_index(spark, ref_path)[1].first().asDict()
    )
    got = _rows(bm25_probe_index(spark, p, _q(spark), k=10))
    want = _rows(bm25_probe_index(spark, ref_path, _q(spark), k=10))
    assert got == want and got


def test_prf_probe_equals_in_query_two_pass_form(spark, docs, index):
    """bm25_prf_probe_index (both passes + the feedback term counts
    served from the index — zero corpus tokenizes) must equal the
    in-query bm25_prf_topk row-for-row: the postings' per-(doc, word)
    tf rows ARE the exploded-token counts the in-query expansion
    aggregates, so the expansion picks and both rankings coincide."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.retrieval import (
        bm25_prf_probe_index,
        bm25_prf_topk,
    )

    q = _q(spark)
    got = _rows(bm25_prf_probe_index(spark, index, q, k=10))
    want = _rows(bm25_prf_topk(docs, q, k=10))
    assert got == want and got
    # and the probe plan never tokenizes the corpus
    plan = (
        bm25_prf_probe_index(spark, index, q, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "documents.parquet" not in plan


# r16 fast-tier split (VERDICT r15 item 3): this module is in the SLOW
# tier — long layout/stream/property sweeps excluded from the default
# `-m "not slow"` run (pytest.ini) so the driver's verify-window pytest
# completes; run the FULL suite with `pytest -m ""`.
import pytest as _pytest_r16

pytestmark = _pytest_r16.mark.slow
