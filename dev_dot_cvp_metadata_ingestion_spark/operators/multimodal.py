"""Multimodal column plumbing (beyond-reference).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. The Spark-side plumbing — schema, Arrow batching through
``mapInPandas``, partition-sized batches — is real and tested; the
actual media decode is STUBBED (the codec libraries are not in this
container): ``decode_features(..., fake=True)`` computes deterministic
byte-level features, and ``fake=False`` raises NotImplementedError at
the exact point a real decoder (PIL/ffmpeg) would plug in.

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


def decode_features(media: DataFrame, *, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    fake=True → deterministic byte-level features (length, md5, mean
    byte value) standing in for decode→resize→embed. fake=False is the
    real-decoder socket and raises NotImplementedError.
    """
    if not fake:
        raise NotImplementedError(
            "real media decode requires codec libraries (PIL/ffmpeg) not "
            "present in this environment; plug the decoder in here"
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
    10 ms/char) so the full plumbing is oracle-checkable. fake=False
    is the real ffmpeg socket.
    """
    if not fake:
        raise NotImplementedError(
            "real frame sampling requires ffmpeg bindings not present in "
            "this environment; plug the demuxer in here"
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


def resize_media(
    media: DataFrame, *, target_chars: int = 256, fake: bool = True
) -> DataFrame:
    """Resize/downsample: bound each payload to a target size. fake=True
    truncates the utf-8 text to ``target_chars`` (deterministic,
    oracle-expressible); fake=False is the real resampler socket."""
    if not fake:
        raise NotImplementedError(
            "real resize requires image codecs (PIL) not present in this "
            "environment; plug the resampler in here"
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
