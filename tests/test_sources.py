"""Source-layer tests: gzip transparency (S3), header audit (S6),
NDJSON provenance (S2/S5)."""

from __future__ import annotations

import gzip
import json

from pyspark.sql import functions as F

from dev_dot_cvp_metadata_ingestion_spark.sources.files import (
    audit_csv_headers,
    file_lines,
    file_lines_sniffed,
    records_from_dir,
)
from dev_dot_cvp_metadata_ingestion_spark.sources.rules import parse_rules_ini


def test_gzip_transparent_read(spark, tmp_path):
    d = tmp_path / "gz"
    d.mkdir()
    recs = [{"a": i, "b": f"x{i}"} for i in range(5)]
    payload = "\n".join(json.dumps(r) for r in recs).encode()
    (d / "plain.json").write_bytes(payload)
    with gzip.open(d / "compressed.json.gz", "wb") as fh:
        fh.write(payload)

    lines = file_lines(spark, str(d))
    per_file = {
        r.file_path.split("/")[-1]: r.n
        for r in lines.groupBy("file_path")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_file == {"plain.json": 5, "compressed.json.gz": 5}

    records = records_from_dir(spark, str(d))
    assert records.count() == 10
    # identical record content from both codecs
    agg = records.groupBy("a").count().collect()
    assert all(r["count"] == 2 for r in agg)


def test_gzip_magic_byte_fallback(spark, tmp_path):
    # the reference sniffs 1f8b regardless of name
    # (cvp_bucket_event_lambda_handler.py:28-30): a gzip object WITHOUT
    # the .gz extension must still decompress via the sniffed source
    d = tmp_path / "sniff"
    d.mkdir()
    lines_txt = [f"line {i}" for i in range(7)]
    payload = ("\n".join(lines_txt) + "\n\n").encode()
    (d / "plain.log").write_bytes(payload)
    (d / "hidden_gzip").write_bytes(gzip.compress(payload))  # no extension

    out = file_lines_sniffed(spark, str(d))
    rows = out.collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r.file_path.split("/")[-1], []).append(
            (r.line_no, r.line)
        )
    for fname in ("plain.log", "hidden_gzip"):
        got = sorted(by_file[fname])
        assert got == [(i + 1, f"line {i}") for i in range(7)], fname
    # provenance: file_size is the on-disk (compressed) size
    sizes = {r.file_path.split("/")[-1]: r.file_size for r in rows}
    assert sizes["hidden_gzip"] == len(gzip.compress(payload))


def test_file_lines_ordering_and_numbering(spark, tmp_path):
    # line_no numbers NON-BLANK lines 1..n in file order (serial_id
    # fallback, validator.py:398-400), identical in both sources
    d = tmp_path / "ord"
    d.mkdir()
    (d / "f.log").write_text("a\n\nb\r\nc\n   \nd\n")
    # empty and whitespace-only lines are skipped and not counted
    expect = [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    for src in (file_lines, file_lines_sniffed):
        got = sorted(
            (r.line_no, r.line) for r in src(spark, str(d)).collect()
        )
        assert got == expect, src.__name__


def test_header_audit(spark, tmp_path):
    d = tmp_path / "csv"
    d.mkdir()
    (d / "good.csv").write_text(
        "DeviceID,utc,local,blank,vsl_mph\n1,2019,2019,x,50\n"
    )
    (d / "bad.csv").write_text(
        "device,utc,wrong,blank,vsl_mph\n1,2019,2019,x,50\n"
    )
    ruleset = parse_rules_ini(
        open("/root/reference/odevalidator/csvconfig_2.ini").read()
    )
    audits = audit_csv_headers(spark, str(d), ruleset)
    rows = {
        (r.file_path.split("/")[-1], r.position): (r.header_field, r.config_field)
        for r in audits.collect()
    }
    # case-insensitive: DeviceID matches deviceid → no warning for good.csv
    assert not any(f == "good.csv" for f, _ in rows)
    assert rows[("bad.csv", 0)] == ("device", "deviceid")
    assert rows[("bad.csv", 2)] == ("wrong", "local")
    assert len(rows) == 2
