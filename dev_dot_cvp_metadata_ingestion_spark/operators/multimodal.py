"""Multimodal column plumbing (beyond-reference).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. Both decode paths are real code:

* ``fake=True`` — deterministic byte-level stand-ins (length, md5,
  text slices). This is the ORACLE form: DuckDB can reproduce it, so
  the registered queries stay hash-checked.
* ``fake=False`` — REAL decode via the stdlib-only codecs in
  functions/codecs.py: full PNG (zlib inflate + scanline unfilter) for
  images and PCM WAV (stdlib ``wave``) for audio, dispatched on magic
  bytes. Not DuckDB-expressible, so exercised by pytest
  (tests/test_multimodal.py) over in-repo generated fixtures rather
  than by the driver oracle. Video demux (beyond single-frame images /
  PCM audio) stays out of scope — a container format needs ffmpeg;
  unsupported payloads raise ValueError naming the sniffed type.

Scale notes: mapInPandas streams Arrow record batches, so each Python
worker touches one batch at a time (no per-row serde); binary payloads
stay columnar end-to-end. Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, content_md5 string, mean_byte double"
)


def attach_binary(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Simulate a multimodal table: payload = utf-8 bytes of the text,
    plus a typed metadata struct (as a real image table would carry
    width/height/codec)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.octet_length(F.col(text_col)).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
        ).alias("media_meta"),
    )


IMAGE_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, channels int, n_bytes long, "
    "content_md5 string, mean_pixel double"
)


def decode_features(media: DataFrame, *, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    fake=True → deterministic byte-level features (length, md5, mean
    byte value) — the DuckDB-reproducible oracle form. fake=False →
    REAL PNG decode (functions/codecs.py) emitting decoded-domain
    features (dimensions, mean pixel sample) under
    ``IMAGE_FEATURE_SCHEMA``; non-PNG payloads raise ValueError.
    """
    if not fake:

        def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import hashlib

            from ..functions.codecs import decode_png, sniff_mime

            for pdf in batches:
                rows = []
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                    data = bytes(payload)
                    mime = sniff_mime(data)
                    if mime != "image/png":
                        raise ValueError(
                            f"decode_features(fake=False): doc {doc_id} is "
                            f"{mime}, only image/png is decodable here"
                        )
                    img = decode_png(data)
                    rows.append(
                        (
                            doc_id,
                            img.shape[1],
                            img.shape[0],
                            img.shape[2],
                            len(data),
                            hashlib.md5(data).hexdigest(),
                            float(img.mean()),
                        )
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "doc_id", "width", "height", "channels", "n_bytes",
                        "content_md5", "mean_pixel",
                    ],
                )

        return media.select("doc_id", "payload").mapInPandas(
            _decode, IMAGE_FEATURE_SCHEMA
        )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "mean_byte": payloads.map(
                        lambda b: sum(b) / len(b) if len(b) else 0.0
                    ),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(_extract, FEATURE_SCHEMA)


FRAME_SCHEMA = (
    "doc_id long, frame_idx long, ts_ms long, frame_chars long, "
    "frame_md5 string"
)


def sample_frames(
    media: DataFrame, *, max_frames: int = 4, fake: bool = True
) -> DataFrame:
    """Frame sampling: one media row → N evenly-spaced frame rows —
    the generator-shaped multimodal op (mapInPandas emitting more rows
    than it receives; Arrow batches both ways).

    fake=True treats the payload as its utf-8 text and emits
    deterministic per-frame slices (count scales with length, capped
    at ``max_frames``; timestamps stride the fake duration =
    10 ms/char) so the full plumbing is oracle-checkable. fake=False →
    REAL PCM WAV decode (stdlib ``wave`` via functions/codecs.py):
    evenly-spaced sample windows over the decoded audio, real
    timestamps from the sample rate; non-WAV payloads raise ValueError.
    (Video demux needs ffmpeg and stays out of scope.)
    """
    if not fake:

        def _audio_frames(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            import hashlib

            from ..functions.codecs import decode_wav, sniff_mime

            for pdf in batches:
                rows = []
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                    data = bytes(payload)
                    mime = sniff_mime(data)
                    if mime != "audio/wav":
                        raise ValueError(
                            f"sample_frames(fake=False): doc {doc_id} is "
                            f"{mime}, only audio/wav is decodable here"
                        )
                    samples, rate = decode_wav(data)
                    n = len(samples)
                    n_frames = max(1, min(max_frames, n // max(1, rate // 10)))
                    flen = n // n_frames
                    for i in range(n_frames):
                        start = (i * n) // n_frames
                        window = samples[start:start + flen]
                        rows.append(
                            (
                                doc_id,
                                i,
                                start * 1000 // rate,
                                len(window),
                                hashlib.md5(window.tobytes()).hexdigest(),
                            )
                        )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "doc_id", "frame_idx", "ts_ms", "frame_chars",
                        "frame_md5",
                    ],
                )

        return media.select("doc_id", "payload").mapInPandas(
            _audio_frames, FRAME_SCHEMA
        )

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                text = bytes(payload).decode("utf-8", errors="replace")
                n_chars = len(text)
                n_frames = max(1, min(max_frames, n_chars // 100))
                duration_ms = n_chars * 10
                flen = n_chars // n_frames
                for i in range(n_frames):
                    start = (i * n_chars) // n_frames
                    sl = text[start:start + flen]
                    rows.append(
                        (
                            doc_id,
                            i,
                            (i * duration_ms) // n_frames,
                            len(sl),
                            hashlib.md5(sl.encode("utf-8")).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "ts_ms", "frame_chars", "frame_md5",
                ],
            )

    return media.select("doc_id", "payload").mapInPandas(_frames, FRAME_SCHEMA)


RESIZE_SCHEMA = "doc_id long, orig_chars long, resized_chars long, resized_md5 string"


IMAGE_RESIZE_SCHEMA = (
    "doc_id long, orig_width int, orig_height int, resized_width int, "
    "resized_height int, resized_md5 string"
)


def resize_media(
    media: DataFrame, *, target_chars: int = 256, target_px: int = 16,
    fake: bool = True,
) -> DataFrame:
    """Resize/downsample: bound each payload to a target size. fake=True
    truncates the utf-8 text to ``target_chars`` (deterministic,
    oracle-expressible). fake=False → REAL nearest-neighbor resample of
    the decoded PNG raster to ``target_px``×``target_px`` (aspect not
    preserved — thumbnail normalization), emitting
    ``IMAGE_RESIZE_SCHEMA`` with the md5 of the re-encoded PNG."""
    if not fake:

        def _resize_real(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            import hashlib

            from ..functions.codecs import (
                decode_png,
                encode_png,
                resize_nearest,
                sniff_mime,
            )

            for pdf in batches:
                rows = []
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                    data = bytes(payload)
                    mime = sniff_mime(data)
                    if mime != "image/png":
                        raise ValueError(
                            f"resize_media(fake=False): doc {doc_id} is "
                            f"{mime}, only image/png is decodable here"
                        )
                    img = decode_png(data)
                    small = resize_nearest(img, target_px, target_px)
                    rows.append(
                        (
                            doc_id,
                            img.shape[1],
                            img.shape[0],
                            small.shape[1],
                            small.shape[0],
                            hashlib.md5(encode_png(small)).hexdigest(),
                        )
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "doc_id", "orig_width", "orig_height",
                        "resized_width", "resized_height", "resized_md5",
                    ],
                )

        return media.select("doc_id", "payload").mapInPandas(
            _resize_real, IMAGE_RESIZE_SCHEMA
        )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            texts = [
                bytes(p).decode("utf-8", errors="replace")
                for p in pdf["payload"]
            ]
            resized = [t[:target_chars] for t in texts]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_chars": [len(t) for t in texts],
                    "resized_chars": [len(r) for r in resized],
                    "resized_md5": [
                        hashlib.md5(r.encode("utf-8")).hexdigest()
                        for r in resized
                    ],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(_resize, RESIZE_SCHEMA)


PHASH_SCHEMA = "doc_id long, phash long"


def phash_media(media: DataFrame, *, fake: bool = True) -> DataFrame:
    """Perceptual-hash fingerprinting over the binary payload — the
    multimodal entry into the dedup family (functions/phash.py has the
    integer-DCT algebra): one 63-bit pHash per media row, feeding
    ``operators.dedup.banded_hamming_pairs`` exactly like simhash
    feeds the text near-dup family.

    fake=True → the deterministic text-raster stand-in (codepoints
    tile the 32×32 raster) — the DuckDB-reproducible ORACLE form the
    registered ``dedup_phash_pairs`` query uses. fake=False → REAL
    decode dispatched on magic bytes — PNG → BT.601 integer luma +
    nearest 32×32 resample, WAV → spectro-temporal energy raster
    (``gray_from_wav``) — pytest-verified over generated fixtures
    (tests/test_phash.py); other payloads raise ValueError. Images
    and audio share the one exact int64 DCT kernel and the one banded
    dedup tail, and a pipeline can validate plumbing on the fake and
    flip to real decode unchanged.

    Scale shape: one Arrow-batched map over the media table (the
    8×32 · 32×32 · 32×8 integer matmuls are ~50 µs/row); the output
    is 8 bytes of hash per row regardless of payload size, so
    everything downstream of this projection is hash-sized."""
    from ..functions.phash import gray_from_png, gray_from_wav
    from ..functions.phash import phash_from_gray, phash_from_text

    if fake:

        def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "phash": [
                            phash_from_text(bytes(p).decode("utf-8"))
                            for p in pdf["payload"]
                        ],
                    }
                )

    else:

        def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from ..functions.codecs import sniff_mime

            for pdf in batches:
                hashes = []
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                    data = bytes(payload)
                    mime = sniff_mime(data)
                    if mime == "image/png":
                        gray = gray_from_png(data)
                    elif mime == "audio/wav":
                        gray = gray_from_wav(data)
                    else:
                        raise ValueError(
                            f"phash_media(fake=False): doc {doc_id} is "
                            f"{mime}; image/png and audio/wav are "
                            "hashable here"
                        )
                    hashes.append(phash_from_gray(gray))
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "phash": hashes}
                )

    return media.select("doc_id", "payload").mapInPandas(
        _hash, PHASH_SCHEMA
    )
