"""Perceptual image hashing — DCT pHash (beyond-reference).

The classic perceptual hash (Zauner 2010, "Implementation and
Benchmarking of Perceptual Image Hash Functions", public): resample
the image to a 32×32 grayscale raster, take the 2-D DCT-II, keep the
top-left 8×8 low-frequency block, and emit one bit per coefficient —
1 iff the coefficient exceeds the block's median (DC term excluded).
Re-encodes of the same raster collide exactly; small perceptual edits
flip few bits, so near-duplicates sit within a small Hamming radius
and the existing banded-Hamming machinery (operators/dedup.py —
Manku-style band self-joins, never an all-pairs scan) extends
deduplication to image columns.

Fixed-point doctrine (the repo-wide determinism rules): the DCT basis
is precomputed ONCE here as integer constants (cosines scaled by
``PHASH_SCALE`` and rounded at import time), and the transform is
exact int64 matrix arithmetic — no libm at query time, so the Spark
kernel (Arrow ``mapInPandas``) and the generated DuckDB oracle
(plans/datapipe.py:_phash_oracle embeds THESE integers as literals)
hash-match bit-for-bit. Coefficient bound: |g| ≤ 2²¹ (codepoints) ×
32 × 10⁴ × 32 × 10⁴ ≈ 2×10¹⁶ < 2⁶³ — exact.
"""

from __future__ import annotations

import math

import numpy as np

PHASH_SCALE = 10_000  # integer DCT basis scale
PHASH_N = 32  # raster side
PHASH_K = 8  # low-frequency coefficients kept per axis


def _int_dct_basis() -> np.ndarray:
    """B[u][r] = round(cos(π·(2r+1)·u / (2N)) · PHASH_SCALE) as int64 —
    computed once at import (driver/codegen time, never per row); the
    single source of truth both the Spark kernel and the generated
    DuckDB oracle embed."""
    b = np.empty((PHASH_K, PHASH_N), dtype=np.int64)
    for u in range(PHASH_K):
        for r in range(PHASH_N):
            b[u][r] = int(
                round(
                    math.cos(math.pi * (2 * r + 1) * u / (2 * PHASH_N))
                    * PHASH_SCALE
                )
            )
    return b


PHASH_BASIS = _int_dct_basis()


def phash_from_gray(gray: np.ndarray) -> int:
    """63-bit DCT pHash of an integer grayscale raster (any size —
    nearest-resampled to 32×32 with the codecs pixel-center map).
    Bit p (p = u·8+v−1 over the row-major 8×8 block, DC excluded) is
    1 iff coefficient (u, v) exceeds the median of the 63 AC
    coefficients (the exact middle: 32nd smallest)."""
    from .codecs import resize_nearest

    g = np.asarray(gray, dtype=np.int64)
    if g.shape != (PHASH_N, PHASH_N):
        g = resize_nearest(g, PHASH_N, PHASH_N).astype(np.int64)
    c = PHASH_BASIS @ g @ PHASH_BASIS.T  # (8, 8) exact int64
    vals = c.reshape(-1)[1:]  # row-major, DC excluded: 63 AC coeffs
    med = int(np.sort(vals)[31])
    h = 0
    for p, v in enumerate(vals):
        if int(v) > med:
            h |= 1 << p
    return h


def gray_from_png(data: bytes) -> np.ndarray:
    """Integer luma raster from PNG bytes: BT.601 integer weights
    (299·R + 587·G + 114·B) // 1000; gray(+alpha) payloads pass their
    luma channel through, alpha is ignored."""
    from .codecs import decode_png

    img = decode_png(data).astype(np.int64)
    if img.shape[2] <= 2:  # grayscale / gray+alpha
        return img[:, :, 0]
    r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
    return (299 * r + 587 * g + 114 * b) // 1000


def phash_from_text(text: str) -> int:
    """The ORACLE-form fake raster (the multimodal family's
    deterministic text-bytes stand-in — see operators/multimodal.py):
    cell i of the row-major 32×32 raster carries the codepoint of the
    text character at position i mod len(text). DuckDB reproduces it
    with ``ascii(substring(...))``, so the registered pair query stays
    hash-checked while the fake=False path runs the real PNG luma."""
    codes = np.array([ord(ch) for ch in text], dtype=np.int64)
    idx = np.arange(PHASH_N * PHASH_N) % len(codes)
    return phash_from_gray(codes[idx].reshape(PHASH_N, PHASH_N))


def gray_from_wav(data: bytes) -> np.ndarray:
    """Spectro-temporal energy raster from WAV bytes — the audio entry
    into the same pHash kernel: the mono mix (integer mean of
    channels) is split into 32 equal time frames, each frame into 32
    equal sub-windows, and every cell carries the window's mean
    ABSOLUTE amplitude (integer division) — a 32×32 coarse energy
    envelope. The DCT then does for loudness structure what it does
    for image luma: identical PCM re-encodes collide exactly, small
    amplitude perturbations flip few low-frequency bits, and
    unrelated signals land far apart. Windows that receive no samples
    (clips shorter than 1024 samples, or an empty clip) contribute
    zero energy — exact integer boundaries, every sample in exactly
    one window."""
    from .codecs import decode_wav

    samples, _rate = decode_wav(data)
    mono = samples.astype(np.int64).sum(axis=1) // samples.shape[1]
    amp = np.abs(mono)
    n = amp.shape[0]
    cells = PHASH_N * PHASH_N
    # window w covers [w*n//cells, (w+1)*n//cells) — exact integer
    # boundaries, every sample in exactly one window
    bounds = (np.arange(cells + 1) * n) // cells
    sums = np.concatenate([[0], np.cumsum(amp)])
    widths = np.maximum(bounds[1:] - bounds[:-1], 1)
    means = (sums[bounds[1:]] - sums[bounds[:-1]]) // widths
    return means.reshape(PHASH_N, PHASH_N)
