"""Tombstone deletes for the EMBEDDING layouts (r10 VERDICT item 4:
the text/LSH sidecar recipe replicated to IVF, PQ, IVF-PQ, and
residual IVF-PQ). For every layout:

* probe-after-delete ≡ the probe over the same layout with the
  victims removed by an EXPLICIT isin filter on the raw
  (include_deleted=True) tables — a non-circular check of the
  tombstone anti-join (trained quantizers are deliberately FROZEN
  across deletes, FAISS remove_ids semantics, so "rebuild without
  victims" would retrain and is NOT the contract);
* no victim is ever served; double-delete is a no-op;
* compaction physically drops the victims' rows into a new atomic
  generation, clears the tombstones, and leaves probe results
  row-for-row unchanged; prune reclaims the old generation.

For IVF additionally: the post-delete candidate set equals a
FROM-SCRATCH re-assignment of the surviving source vectors against
the frozen centroid sidecar (the strongest available ground truth)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from dev_dot_cvp_metadata_ingestion_spark.operators.similarity import (
    ivf_pq_probe_topk,
    ivf_pq_residual_probe_topk,
    ivf_probe_join,
    pq_probe_adc_topk,
)
from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
    _table_dir,
    compact_ivf_layout,
    compact_ivf_pq_layout,
    compact_ivf_pq_residual_layout,
    compact_pq_layout,
    delete_from_ivf_layout,
    delete_from_ivf_pq_layout,
    delete_from_ivf_pq_residual_layout,
    delete_from_pq_layout,
    prune_ivf_layout_generations,
    read_ivf_layout,
    read_ivf_pq_layout,
    read_ivf_pq_residual_layout,
    read_pq_layout,
    write_ivf_layout,
    write_ivf_pq_layout,
    write_ivf_pq_residual_layout,
    write_pq_layout,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(spark, emb):
    return emb.filter(F.col("vec_id") % 31 == 0).localCheckpoint()


def _victims(emb):
    return emb.filter(F.col("vec_id") % 7 == 0).select("vec_id")


def _vset(emb):
    return {r.vec_id for r in _victims(emb).collect()}


def _check_family(
    spark,
    emb,
    p,
    probe_rows,
    raw_codes,
    delete_fn,
    compact_fn,
    codes_table="codes",
):
    """Shared delete→verify→re-delete→compact→verify harness."""
    vset = _vset(emb)
    before = probe_rows()
    delete_fn(spark, p, _victims(emb))
    got = probe_rows()
    assert got and not {t[1] for t in got} & vset  # no victim served
    # non-circular filtered-candidates reference: raw codes minus the
    # victim set by explicit isin — must match the tombstone anti-join
    want = probe_rows(
        codes_override=raw_codes().filter(~F.col("vec_id").isin(vset))
    )
    assert got == want
    assert got != before  # the delete changed something (non-vacuous)
    delete_fn(spark, p, _victims(emb))  # double-delete no-op
    assert probe_rows() == got
    compact_fn(spark, p)
    assert not os.path.isdir(f"{p}/tombstones")
    newdir = _table_dir(p, codes_table)
    assert newdir.endswith("_v1")
    phys = spark.read.parquet(newdir)
    assert phys.filter(F.col("vec_id").isin(vset)).count() == 0
    assert probe_rows() == got
    return got


def test_ivf_layout_delete_compact(spark, emb, queries, tmp_path):
    p = str(tmp_path / "ivf")
    write_ivf_layout(emb, p, n_cells=8)

    def probe_rows(codes_override=None):
        cells, cents = read_ivf_layout(spark, p)
        if codes_override is not None:
            cells = codes_override
        df = ivf_probe_join(cells, cents, queries, k=4, nprobe=2)
        return sorted((r.q_id, r.vec_id, r.rank) for r in df.collect())

    def raw_codes():
        return read_ivf_layout(spark, p, include_deleted=True)[0]

    _check_family(
        spark, emb, p, probe_rows, raw_codes,
        delete_from_ivf_layout, compact_ivf_layout, codes_table="cells",
    )
    # strongest pin: post-prune candidates == from-scratch assignment
    # of the surviving SOURCE vectors against the frozen centroids
    prune_ivf_layout_generations(spark, p)
    assert not os.path.isdir(f"{p}/cells")
    from dev_dot_cvp_metadata_ingestion_spark.operators.similarity import (
        assign_to_centroids,
    )

    cells, cents = read_ivf_layout(spark, p)
    survivors = emb.join(_victims(emb), "vec_id", "left_anti")
    scale = int(
        spark.read.parquet(f"{p}/meta").collect()[0]["scale"]
    )
    fresh = assign_to_centroids(survivors, cents, scale=scale)
    got = sorted(
        (r.vec_id, r.cluster) for r in cells.select("vec_id", "cluster").collect()
    )
    want = sorted(
        (r.vec_id, r.cluster) for r in fresh.select("vec_id", "cluster").collect()
    )
    assert got == want and got


def test_pq_layout_delete_compact(spark, emb, queries, tmp_path):
    p = str(tmp_path / "pq")
    write_pq_layout(emb, p, d=64, m=8, k_codebook=16)

    def probe_rows(codes_override=None):
        if codes_override is not None:
            _codes, cbs, meta = read_pq_layout(spark, p, include_deleted=True)
            # score from the explicitly-filtered codes — the
            # non-circular reference for the tombstone anti-join
            df = _pq_probe_from(spark, codes_override, cbs, meta, queries)
        else:
            df = pq_probe_adc_topk(spark, p, queries, k=4)
        return sorted(
            (r.q_id, r.vec_id, r.adc_dist, r.rank) for r in df.collect()
        )

    def raw_codes():
        return read_pq_layout(spark, p, include_deleted=True)[0]

    _check_family(
        spark, emb, p, probe_rows, raw_codes,
        delete_from_pq_layout, compact_pq_layout,
    )


def _pq_probe_from(spark, codes, cbs, meta, queries, k=4, n_salts=32):
    """pq_probe_adc_topk's scoring tail over an explicit codes frame —
    the non-circular reference for the PQ delete pin (mirrors
    operators/similarity.py:pq_probe_adc_topk line-for-line)."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.similarity import (
        _topk_per_query,
    )

    d, m, scale = meta["d"], meta["m"], meta["scale"]
    sub = d // m
    dt_parts = []
    for s in range(m):
        qf = queries.select(
            F.col("vec_id").alias("q_id"),
            F.transform(
                F.slice(F.col("embedding"), s * sub + 1, sub),
                lambda v: F.floor(v.cast("double") * scale).cast("long"),
            ).alias("qf"),
        )
        qd = F.aggregate(
            F.zip_with(F.col("qf"), F.col("cf"), lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, y: acc + y,
        )
        dt_parts.append(
            qf.join(
                F.broadcast(cbs.filter(F.col("subspace") == s)), how="cross"
            ).select(
                F.lit(s).alias("subspace"), "q_id", "cluster", qd.alias("qd")
            )
        )
    dts = dt_parts[0]
    for t in dt_parts[1:]:
        dts = dts.unionByName(t)
    scored = (
        codes.join(F.broadcast(dts), ["subspace", "cluster"])
        .groupBy("q_id", "vec_id")
        .agg(F.sum("qd").alias("adc_dist"))
    )
    ranked = _topk_per_query(
        scored.select(
            "q_id",
            "vec_id",
            (-F.col("adc_dist")).cast("double").alias("cos"),
            "adc_dist",
        ),
        k,
        n_salts,
    )
    return ranked.select(
        "q_id", "vec_id", "adc_dist", F.col("rank").cast("long").alias("rank")
    )


def test_ivf_pq_layout_delete_compact(spark, emb, queries, tmp_path):
    p = str(tmp_path / "ivfpq")
    write_ivf_pq_layout(emb, p, n_cells=8, d=64, m=8, k_codebook=16)
    _run_celled_family(
        spark, emb, p, queries,
        lambda **kw: ivf_pq_probe_topk(spark, p, queries, nprobe=2, k=4),
        lambda: read_ivf_pq_layout(spark, p, include_deleted=True)[0],
        delete_from_ivf_pq_layout, compact_ivf_pq_layout,
    )


def test_ivf_pq_residual_layout_delete_compact(spark, emb, queries, tmp_path):
    p = str(tmp_path / "ivfpqres")
    write_ivf_pq_residual_layout(emb, p, n_cells=8, d=64, m=8, k_codebook=16)
    _run_celled_family(
        spark, emb, p, queries,
        lambda **kw: ivf_pq_residual_probe_topk(
            spark, p, queries, nprobe=2, k=4
        ),
        lambda: read_ivf_pq_residual_layout(spark, p, include_deleted=True)[0],
        delete_from_ivf_pq_residual_layout, compact_ivf_pq_residual_layout,
    )


def _run_celled_family(
    spark, emb, p, queries, probe_fn, raw_codes, delete_fn, compact_fn
):
    """Celled-code layouts (IVF-PQ, residual): the probes go through
    the public read path, so the filtered-candidates reference is
    expressed as a tombstone-equivalence on the READ relation plus the
    no-victim / physical-reclaim / unchanged-across-compaction pins."""
    vset = _vset(emb)

    def rows():
        df = probe_fn()
        return sorted(
            (r.q_id, r.vec_id, r.adc_dist, r.rank) for r in df.collect()
        )

    before = rows()
    delete_fn(spark, p, _victims(emb))
    # read-path equivalence: anti-joined read == raw read minus isin
    served = raw_codes().join(
        F.broadcast(_victims(emb)), "vec_id", "left_anti"
    )
    via_read = (
        read_ivf_pq_layout(spark, p)[0]
        if "ivfpqres" not in p
        else read_ivf_pq_residual_layout(spark, p)[0]
    )
    a = sorted(map(tuple, via_read.collect()))
    b = sorted(map(tuple, served.collect()))
    assert a == b and a
    got = rows()
    assert got and not {t[1] for t in got} & vset
    assert got != before
    delete_fn(spark, p, _victims(emb))  # double-delete no-op
    assert rows() == got
    compact_fn(spark, p)
    assert not os.path.isdir(f"{p}/tombstones")
    newdir = _table_dir(p, "codes")
    assert newdir.endswith("_v1")
    phys = spark.read.parquet(newdir)
    assert phys.filter(F.col("vec_id").isin(vset)).count() == 0
    assert rows() == got


# r16 fast-tier split (VERDICT r15 item 3): this module is in the SLOW
# tier — long layout/stream/property sweeps excluded from the default
# `-m "not slow"` run (pytest.ini) so the driver's verify-window pytest
# completes; run the FULL suite with `pytest -m ""`.
import pytest as _pytest_r16

pytestmark = _pytest_r16.mark.slow
