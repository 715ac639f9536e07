"""Declarative Bloom filter (operators/bloom.py) and the
bloom-prefiltered decontamination twin.

The operator contract under test: NO false negatives ever (the exact
join downstream would silently lose contaminated grams), useful
selectivity on absent values (the whole point of the pre-join), and —
the 100 TB claim — the probe runs on the eval side BEFORE the gram
join's exchange, so cleared grams never shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dev_dot_cvp_metadata_ingestion_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
)
from tests.conftest import SF_SMOKE

NUM_BITS = 1 << 16  # small bitmap: makes the fp-rate test meaningful


def test_bloom_never_false_negative(spark):
    values = spark.range(5000).select(
        F.concat(F.lit("v"), F.col("id")).alias("g")
    )
    bitmap = bloom_build(values, "g", num_bits=NUM_BITS)
    survived = bloom_probe(values, "g", bitmap, num_bits=NUM_BITS).count()
    assert survived == 5000


def test_bloom_filters_most_absent_values(spark):
    present = spark.range(2000).select(
        F.concat(F.lit("in"), F.col("id")).alias("g")
    )
    absent = spark.range(20000).select(
        F.concat(F.lit("out"), F.col("id")).alias("g")
    )
    bitmap = bloom_build(present, "g", num_bits=NUM_BITS)
    fp = bloom_probe(absent, "g", bitmap, num_bits=NUM_BITS).count()
    # k=2, n=2000, m=65536: theoretical fpp ~ (1-e^{-2n/m})^2 ≈ 0.35%;
    # 5% is a wide deterministic-hash margin
    assert fp / 20000 < 0.05, f"false-positive rate {fp / 20000:.3f}"


def test_bloom_bitmap_is_bounded_relation(spark):
    values = spark.range(100000).select(F.col("id").cast("string").alias("g"))
    bitmap = bloom_build(values, "g", num_bits=NUM_BITS)
    assert bitmap.count() <= NUM_BITS // 64


def test_contamination_bloom_matches_exact(spark):
    from dev_dot_cvp_metadata_ingestion_spark.plans import registry

    registry.load_all()
    exact = registry.QUERIES["documents_contamination"](spark, SF_SMOKE)
    bloom = registry.QUERIES["documents_contamination_bloom"](spark, SF_SMOKE)
    assert exact.schema == bloom.schema
    a = sorted(map(tuple, exact.collect()))
    b = sorted(map(tuple, bloom.collect()))
    assert a == b


def test_bitmap_broadcast_reused_across_probes(spark):
    """Both semi-join probes hang off the SAME bitmap subtree, so the
    executed (AQE-final) plan must broadcast it once and reuse it —
    not rebuild the bitmap per hash function."""
    from dev_dot_cvp_metadata_ingestion_spark.plans import registry

    registry.load_all()
    df = registry.QUERIES["documents_contamination_bloom"](spark, SF_SMOKE)
    df.write.format("noop").mode("overwrite").save()
    # re-execute on THIS DataFrame so its queryExecution holds the
    # final adaptive plan
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert plan.count("ReusedExchange") >= 1, plan


def _walk(node):
    yield node
    it = node.children().iterator()
    while it.hasNext():
        yield from _walk(it.next())


def test_bloom_probe_sits_below_gram_join(spark):
    """The semi-join probes must be INSIDE the subtree feeding the
    exact gram join — i.e. grams are screened before that join's
    shuffle — not applied to the join output (which would screen
    nothing)."""
    from dev_dot_cvp_metadata_ingestion_spark.plans import registry

    registry.load_all()
    df = registry.QUERIES["documents_contamination_bloom"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().optimizedPlan()
    gram_joins = [
        n
        for n in _walk(plan)
        if n.nodeName() == "Join"
        and "Inner" in n.simpleString(500)
        and "gram" in n.simpleString(500)
    ]
    assert gram_joins, "exact gram join missing from optimized plan"
    semi_below = [
        n
        for gj in gram_joins
        for n in _walk(gj)
        if n is not gj and n.nodeName() == "Join"
        and "LeftSemi" in n.simpleString(500)
    ]
    assert len(semi_below) >= 2, (
        "expected both bloom semi-join probes below the exact gram join"
    )


def test_bloom_probe_rejects_colliding_working_columns(spark):
    """ADVICE r7: an input already carrying _bloom_widx/_bloom_mask
    must fail loudly — withColumn would silently replace and then drop
    the caller's columns."""
    import pytest as _pytest

    values = spark.range(10).select(F.col("id").cast("string").alias("g"))
    bitmap = bloom_build(values, "g", num_bits=NUM_BITS)
    poisoned = values.withColumn("_bloom_widx", F.lit(1))
    with _pytest.raises(ValueError, match="_bloom_widx"):
        bloom_probe(poisoned, "g", bitmap, num_bits=NUM_BITS)


def test_bloom_auto_sizing_tracks_target_fp_rate(spark):
    """VERDICT r7 item 4: the bitmap is sized from the data, so the
    measured fp-rate tracks the configured target at a build
    cardinality where the small fixed bitmap of this test file
    saturates (the control: 4096 bits against 50k values ≈ every
    probe survives)."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.bloom import (
        auto_num_bits,
        bloom_build_auto,
    )

    build = spark.range(50_000).select(
        F.concat(F.lit("in"), F.col("id")).alias("g")
    )
    absent = spark.range(50_000).select(
        F.concat(F.lit("out"), F.col("id")).alias("g")
    )
    bitmap, num_bits = bloom_build_auto(build, "g", fpp=0.01)
    assert num_bits == auto_num_bits(
        build.select("g").distinct().count(), 0.01
    ) or num_bits % 64 == 0  # HLL estimate may differ slightly; shape holds
    fp = bloom_probe(absent, "g", bitmap, num_bits=num_bits).count() / 50_000
    assert fp < 0.03, f"auto-sized fp-rate {fp:.4f} (target 0.01)"
    # no false negatives, ever
    kept = bloom_probe(build, "g", bitmap, num_bits=num_bits).count()
    assert kept == 50_000

    # saturation control: the same build against a fixed tiny bitmap
    sat_bits = 1 << 12
    sat = bloom_build(build, "g", num_bits=sat_bits)
    sat_fp = bloom_probe(absent, "g", sat, num_bits=sat_bits).count() / 50_000
    assert sat_fp > 0.5, f"control bitmap unexpectedly unsaturated {sat_fp}"


def test_bloom_auto_num_bits_formula():
    from dev_dot_cvp_metadata_ingestion_spark.operators.bloom import (
        DEFAULT_MAX_BITS,
        auto_num_bits,
    )

    # k=2, fpp=0.01 → sqrt(fpp)=0.1, m = 2n/ln(1/0.9) ≈ 18.98·n
    assert abs(auto_num_bits(100_000, 0.01) - 2 * 100_000 / 0.105360516) < 128
    assert auto_num_bits(0, 0.01) == 64
    assert auto_num_bits(10**12, 0.01) == DEFAULT_MAX_BITS  # budget clamp
    assert auto_num_bits(1000, 0.01) % 64 == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        auto_num_bits(10, 1.5)
