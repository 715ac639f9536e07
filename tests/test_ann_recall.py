"""Recall measurement for the learned-quantizer IVF ANN (judge round-5
ask #4): probing nprobe cells of the k-means inverted file must recover
at least 0.9 of the exact bruteforce top-10 at the REGISTERED config
(nprobe=2), and recall must be monotone in nprobe, reaching 1.0 when
every cell is probed (nprobe=k == exhaustive search).
"""

from __future__ import annotations

import pytest

from dev_dot_cvp_metadata_ingestion_spark.plans import registry

from .conftest import SF_SMOKE

registry.load_all()


def _bruteforce_ids(spark):
    bf = registry.QUERIES["ann_bruteforce_topk"](spark, SF_SMOKE)
    return {r.vec_id for r in bf.collect()}


def _ivf_ids(spark, nprobe):
    from dev_dot_cvp_metadata_ingestion_spark.plans.datapipe import (
        ann_ivf_kmeans_topk,
    )

    return {
        r.vec_id
        for r in ann_ivf_kmeans_topk(spark, SF_SMOKE, nprobe=nprobe).collect()
    }


def test_registered_nprobe_recall_at_least_point9(spark):
    truth = _bruteforce_ids(spark)
    got = _ivf_ids(spark, nprobe=2)  # the registered default
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"recall@10 {recall} < 0.9 at nprobe=2"


def test_recall_monotone_and_exhaustive_at_full_probe(spark):
    truth = _bruteforce_ids(spark)
    recalls = []
    for nprobe in (1, 2, 8):
        got = _ivf_ids(spark, nprobe)
        recalls.append(len(truth & got) / len(truth))
    assert recalls == sorted(recalls), f"recall not monotone: {recalls}"
    # nprobe = k probes every cell -> exhaustive -> exact top-10
    assert recalls[-1] == pytest.approx(1.0), recalls
