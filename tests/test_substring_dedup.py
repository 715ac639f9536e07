"""Hand-crafted fixtures for the repeated-substring family: planted
duplicate passages with computable expected spans, and the scrub's
conservative boundary rule (tokens vouched for by any novel-context
shingle survive; only the deep interior of a later copy is removed)."""

from __future__ import annotations

from dev_dot_cvp_metadata_ingestion_spark.plans import registry

registry.load_all()


def _write(spark, texts, tmp_path):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def _w(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_planted_shared_passage_detected_in_both_docs(spark, tmp_path):
    shared = _w("dup", 20)  # 20-token passage present in both docs
    texts = [
        _w("a", 10) + " " + shared + " " + _w("b", 10),
        _w("c", 10) + " " + shared + " " + _w("d", 10),
        _w("e", 30),  # control: fully novel
    ]
    d = _write(spark, texts, tmp_path)
    spans = {
        (r["doc_id"], r["start_pos"], r["span_tokens"])
        for r in registry.QUERIES["documents_repeated_substrings"](
            spark, d
        ).collect()
    }
    # windows fully inside the shared passage: positions 10..22 in both
    # docs -> one maximal run each, span = 22-10+8 = 20 tokens
    assert spans == {(0, 10, 20), (1, 10, 20)}


def test_scrub_keeps_first_copy_and_interior_scrubs_second(spark, tmp_path):
    shared = _w("dup", 20)
    texts = [
        _w("a", 10) + " " + shared + " " + _w("b", 10),
        _w("c", 10) + " " + shared + " " + _w("d", 10),
    ]
    d = _write(spark, texts, tmp_path)
    out = {
        r["doc_id"]: r
        for r in registry.QUERIES["documents_substring_scrubbed"](
            spark, d
        ).collect()
    }
    # doc 0 holds every duplicated shingle's first occurrence: intact
    assert out[0]["text_clean"] == texts[0]
    assert out[0]["n_removed"] == 0
    # doc 1: token t (in 10..29 span) is removed iff EVERY covering
    # window sits inside the duplicated run [10, 22] — i.e. t-7 >= 10
    # and t <= 22 -> tokens 17..22 (the deep interior; boundary tokens
    # keep a novel-context witness window). Conservative by design.
    expect_removed = [f"dup{i}" for i in range(7, 13)]
    kept = out[1]["text_clean"].split()
    assert out[1]["n_removed"] == len(expect_removed)
    for w in expect_removed:
        assert w not in kept
    # everything else survives, in order
    assert kept == [
        w for w in texts[1].split() if w not in expect_removed
    ]
