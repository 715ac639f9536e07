"""Source-layer tests: gzip transparency (S3), header audit (S6),
NDJSON provenance (S2/S5)."""

from __future__ import annotations

import gzip
import json

from pyspark.sql import functions as F

from dev_dot_cvp_metadata_ingestion_spark.sources.files import (
    audit_csv_headers,
    file_lines,
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
