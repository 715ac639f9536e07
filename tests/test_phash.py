"""Perceptual-hash image dedup (functions/phash.py + phash_media +
banded_hamming_pairs): real-PNG pins — exact re-encodes (same raster,
different bytes/color-type) collide at hamming 0, distinct images stay
far, small perturbations stay within the banded radius, the banded
pairs equal a brute-force Hamming sweep, and the candidate join is a
banded equality join (never a Cartesian scan)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from dev_dot_cvp_metadata_ingestion_spark.functions.codecs import (
    encode_png,
    resize_nearest,
)
from dev_dot_cvp_metadata_ingestion_spark.functions.phash import (
    gray_from_png,
    phash_from_gray,
    phash_from_text,
)
from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
    banded_hamming_pairs,
)
from dev_dot_cvp_metadata_ingestion_spark.operators.multimodal import (
    phash_media,
)


def _raster(seed: int) -> np.ndarray:
    """Deterministic 48x64 RGB test raster (no RNG — index algebra)."""
    y, x = np.mgrid[0:48, 0:64]
    r = (x * 3 + y * 7 + seed * 31) % 256
    g = (x * 5 + y * 2 + seed * 17) % 256
    b = (x + y * 11 + seed * 101) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


@pytest.fixture(scope="module")
def images():
    base = _raster(1)
    rgba = np.concatenate(
        [base, np.full((48, 64, 1), 255, dtype=np.uint8)], axis=-1
    )
    tweaked = base.copy()
    tweaked[0:4, 0:4, :] = (tweaked[0:4, 0:4, :].astype(np.int64) + 8) % 256
    return {
        1: encode_png(base),           # original
        2: encode_png(rgba),           # exact re-encode: RGBA, alpha=255
        3: encode_png(tweaked),        # small corner perturbation
        4: encode_png(_raster(2)),     # distinct image
        5: encode_png(_raster(3)),     # distinct image
    }


def test_reencode_collides_distinct_stays_far(images):
    h = {k: phash_from_gray(gray_from_png(v)) for k, v in images.items()}
    assert h[1] == h[2]  # same raster, different bytes/color type
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert ham(h[1], h[3]) <= 3  # perceptual edit stays in radius
    assert ham(h[1], h[4]) > 10
    assert ham(h[1], h[5]) > 10
    assert ham(h[4], h[5]) > 10


def test_resize_invariance_of_kernel(images):
    """The kernel resamples to 32x32 with the codecs pixel-center map,
    so hashing a pre-resampled raster is identical."""
    g = gray_from_png(images[1])
    assert phash_from_gray(g) == phash_from_gray(
        resize_nearest(g, 32, 32)
    )


def test_banded_pairs_equal_bruteforce_and_plan_is_banded(
    spark, images
):
    """banded_hamming_pairs over real PNG hashes == the all-pairs
    Hamming sweep at the same threshold (pigeonhole recall), and the
    candidate plan is an equality join, not a Cartesian scan."""
    media = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in images.items()],
        "doc_id long, payload binary",
    )
    hashes = phash_media(media, fake=False)
    got = sorted(
        tuple(r)
        for r in banded_hamming_pairs(hashes, max_hamming=3).collect()
    )
    hs = {r.doc_id: r.phash for r in hashes.collect()}
    want = sorted(
        (a, b, bin(hs[a] ^ hs[b]).count("1"))
        for a in hs
        for b in hs
        if a < b and bin(hs[a] ^ hs[b]).count("1") <= 3
    )
    assert got == want
    assert (1, 2, 0) in got  # the planted exact re-encode
    assert any(p[:2] == (1, 3) for p in got)  # the perceptual edit
    plan = (
        banded_hamming_pairs(hashes, max_hamming=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # positive control: an actual all-pairs plan DOES show the scan
    ctrl = (
        hashes.alias("a")
        .crossJoin(hashes.alias("b"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" in ctrl or "BroadcastNestedLoop" in ctrl


def test_fake_path_matches_kernel(spark, sf_dir):
    """phash_media(fake=True) over the attached binary payloads equals
    the driver-side kernel on the same texts — the Arrow batch
    plumbing adds nothing to the hash."""
    from dev_dot_cvp_metadata_ingestion_spark.operators.multimodal import (
        attach_binary,
    )
    from dev_dot_cvp_metadata_ingestion_spark.sources.catalog import (
        load_table,
    )

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .limit(20)
    )
    got = {
        r.doc_id: r.phash
        for r in phash_media(
            attach_binary(d, "doc_id", "text"), fake=True
        ).collect()
    }
    want = {
        r.doc_id: phash_from_text(r.text)
        for r in d.select("doc_id", "text").collect()
    }
    assert got == want and got


def _tone(freq: int, env_freq: int, dither: bool = False) -> "np.ndarray":
    """Amplitude-modulated tone — a structured energy envelope, like
    real audio. (A PURE tone is pathological for an envelope hash:
    its envelope is constant, so every AC coefficient sits on the
    median knife-edge and any boundary jitter flips many bits.)"""
    t = np.arange(8000)
    env = 0.55 + 0.45 * np.sin(2 * np.pi * env_freq * t / 8000)
    a = (3000 * env * np.sin(2 * np.pi * freq * t / 8000)).astype(
        np.int64
    )
    if dither:
        a = a + (t % 3) - 1  # ±1 LSB deterministic dither
    return a.astype(np.int16)


def test_audio_phash_reencode_collides_distinct_far(spark):
    """Audio joins the same kernel: a stereo re-encode of the same PCM
    collides exactly, ±1-LSB dither stays inside the banded radius,
    a different tone lands far; phash_media(fake=False) dispatches on
    the WAV magic and agrees with the driver-side kernel."""
    from dev_dot_cvp_metadata_ingestion_spark.functions.codecs import (
        encode_wav,
    )
    from dev_dot_cvp_metadata_ingestion_spark.functions.phash import (
        gray_from_wav,
    )

    mono = _tone(440, 3)
    stereo = np.stack([mono, mono], axis=1)  # same signal, 2 channels
    clips = {
        1: encode_wav(mono, 8000),
        2: encode_wav(stereo, 8000),
        3: encode_wav(_tone(440, 3, dither=True), 8000),
        4: encode_wav(_tone(880, 7), 8000),
    }
    h = {
        k: phash_from_gray(gray_from_wav(v)) for k, v in clips.items()
    }

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert h[1] == h[2]
    assert ham(h[1], h[3]) <= 3
    assert ham(h[1], h[4]) > 10
    # the Spark real path dispatches WAV and matches the kernel
    media = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in clips.items()],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r.phash for r in phash_media(media, fake=False).collect()}
    assert got == h
    # and the banded pairs surface exactly the audio near-dups
    pairs = sorted(
        tuple(r)[:2]
        for r in banded_hamming_pairs(
            phash_media(media, fake=False), max_hamming=3
        ).collect()
    )
    assert pairs == [(1, 2), (1, 3), (2, 3)]


def test_audio_phash_short_and_empty_clips(spark):
    from dev_dot_cvp_metadata_ingestion_spark.functions.codecs import (
        encode_wav,
    )
    from dev_dot_cvp_metadata_ingestion_spark.functions.phash import (
        gray_from_wav,
    )

    short = encode_wav(_tone(440, 3)[:100], 8000)
    empty = encode_wav(np.zeros((0,), dtype=np.int16), 8000)
    assert gray_from_wav(short).shape == (32, 32)
    assert gray_from_wav(empty).shape == (32, 32)
    assert phash_from_gray(gray_from_wav(empty)) == 0
