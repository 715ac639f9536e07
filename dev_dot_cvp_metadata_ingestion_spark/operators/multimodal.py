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
