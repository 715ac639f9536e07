"""Multimodal plumbing: Arrow-batched fakes, generator fan-out shape,
and the honest real-decoder sockets."""

from __future__ import annotations

import pytest

from dev_dot_cvp_metadata_ingestion_spark.operators.multimodal import (
    attach_binary,
    decode_features,
    resize_media,
    sample_frames,
)


@pytest.fixture()
def media(spark):
    docs = spark.createDataFrame(
        [(1, "a" * 50), (2, "b" * 250), (3, "c" * 1000), (4, "")],
        "doc_id long, text string",
    )
    return attach_binary(docs, "doc_id", "text")


def test_frame_fanout_scales_with_length(media):
    rows = sample_frames(media, fake=True).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    # n_frames = max(1, min(4, chars // 100))
    assert len(per_doc[1]) == 1   # 50 chars
    assert len(per_doc[2]) == 2   # 250 chars
    assert len(per_doc[3]) == 4   # 1000 chars, capped
    assert len(per_doc[4]) == 1   # empty payload still yields one frame
    f = sorted(per_doc[3], key=lambda r: r.frame_idx)
    assert [x.frame_idx for x in f] == [0, 1, 2, 3]
    assert [x.ts_ms for x in f] == [0, 2500, 5000, 7500]
    assert all(x.frame_chars == 250 for x in f)


def test_resize_truncates_to_target(media):
    rows = {r.doc_id: r for r in resize_media(media, target_chars=256).collect()}
    assert rows[1].resized_chars == 50
    assert rows[3].orig_chars == 1000 and rows[3].resized_chars == 256
    assert rows[4].resized_chars == 0


@pytest.mark.parametrize(
    "op", [decode_features, sample_frames, resize_media]
)
def test_real_decoder_sockets_raise(media, op):
    with pytest.raises(NotImplementedError):
        op(media, fake=False)
