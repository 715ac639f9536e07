"""File sources — S1-S6 (SURVEY §2.1).

The reference is fed one S3 object per Lambda invocation; here a
directory (or glob) of objects IS the source, and every per-file
behavior becomes a column computed from the hidden ``_metadata`` struct:

* S1 event decode  → file discovery; path from ``_metadata.file_path``
  (URL-unquote applied, matching unquote_plus at
  bucket_event_lambda_handler.py:18)
* S2 object stats  → ``_metadata.file_size`` / ``file_modification_time``
* S3 gzip sniff    → Spark's text/json readers decompress ``.gz`` by
  extension natively (the reference sniffs magic bytes because Lambda
  streams have no names, cvp_bucket_event_lambda_handler.py:28-30)
* S4 line scan     → ``spark.read.text`` + blank-line filter
  (cvp…:40-64)
* S5 NDJSON parse  → ``spark.read.json`` (permissive) or from_json
* S6 positional CSV → explicit schema in RULE ORDER, header skipped
  (validator.py:419-442)

Scale: file listing is driver-side but parallelized by Spark's
InMemoryFileIndex; static-prefix filtering (P4) is applied as a
``pathGlobFilter``/filter on the path column so partition pruning can
skip directories before any read.
"""

from __future__ import annotations

from urllib.parse import unquote_plus

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from .rules import RuleSet

URL_UNQUOTE = F.udf(unquote_plus, StringType())  # S1; off the hot path (once/file)


def file_lines(
    spark: SparkSession,
    path: str,
    *,
    recursive: bool = True,
) -> DataFrame:
    """S3+S4: one row per non-blank line of every file under ``path``
    (gz transparently decompressed), with file provenance columns:
    (file_path, file_size, file_mtime, line_no, line).

    line_no is the 1-based position within the file — the reference's
    serial_id fallback (validator.py:398-400). Computed with a window
    per file, the only shuffle in this source.
    """
    from pyspark.sql import Window as W

    raw = (
        spark.read.option("recursiveFileLookup", str(recursive).lower())
        .text(path)
        .select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.file_size").alias("file_size"),
            F.col("_metadata.file_modification_time").alias("file_mtime"),
            F.col("value").alias("line"),
        )
        .filter(F.trim("line") != "")
    )
    w = W.partitionBy("file_path").orderBy(F.monotonically_increasing_id())
    return raw.withColumn("line_no", F.row_number().over(w))


def parse_ndjson(lines: DataFrame, schema: StructType | None = None) -> DataFrame:
    """S5: JSON-decode the line column. With an explicit (permissive,
    all-nullable) schema this stays a single-pass from_json; without
    one the caller should use spark.read.json for schema inference."""
    if schema is None:
        raise ValueError(
            "provide an explicit schema (permissive StructType) — "
            "schema-on-read inference belongs in spark.read.json"
        )
    return lines.withColumn("record", F.from_json("line", schema, {"mode": "PERMISSIVE"}))


def records_from_dir(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Convenience S3-S5 path: NDJSON records with file provenance.
    Uses spark.read.json (schema inferred or given) so Catalyst prunes
    unused record fields at the scan."""
    reader = spark.read.option("recursiveFileLookup", "true")
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    return df.select(
        F.col("_metadata.file_path").alias("file_path"),
        F.col("_metadata.file_size").alias("file_size"),
        F.col("_metadata.file_modification_time").alias("file_mtime"),
        "*",
    )


def csv_records(
    spark: SparkSession, path: str, ruleset: RuleSet
) -> DataFrame:
    """S6: positional CSV mapped to field names BY RULE ORDER (the
    header row is skipped, not trusted — validator.py:419-432). All
    columns string-typed; rule checks cast as the reference does."""
    schema = StructType(
        [StructField(rule.path, StringType(), True) for rule in ruleset.rules]
    )
    reader = (
        spark.read.option("recursiveFileLookup", "true")
        .option("header", str(ruleset.has_header).lower())
        .schema(schema)
    )
    df = reader.csv(path)
    return df.select(
        F.col("_metadata.file_path").alias("file_path"),
        "*",
    )


def audit_csv_headers(
    spark: SparkSession, path: str, ruleset: RuleSet
) -> DataFrame:
    """S6 header audit (validator.py:434-442): compare each file's
    header row case-insensitively against the rule order; one warning
    row per mismatched position.

    Output: (file_path, position, header_field, config_field).
    """
    from pyspark.sql import Window as W

    raw = (
        spark.read.option("recursiveFileLookup", "true")
        .text(path)
        .select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("value").alias("line"),
        )
    )
    w = W.partitionBy("file_path").orderBy(F.monotonically_increasing_id())
    headers = (
        raw.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("file_path", F.split(F.col("line"), ",").alias("fields"))
    )
    audits = []
    for i, rule in enumerate(ruleset.rules):
        header_field = F.trim(F.element_at("fields", i + 1))
        audits.append(
            F.when(
                F.lower(header_field) != rule.path.lower(),
                F.struct(
                    F.lit(i).alias("position"),
                    F.lower(header_field).alias("header_field"),
                    F.lit(rule.path.lower()).alias("config_field"),
                ),
            )
        )
    return (
        headers.select(
            "file_path",
            F.explode(
                F.filter(F.array(*audits), lambda x: x.isNotNull())
            ).alias("a"),
        )
        .select("file_path", "a.position", "a.header_field", "a.config_field")
    )


def static_prefix_filter(df: DataFrame, prefixes: list[str], *, path_col: str = "file_path") -> DataFrame:
    """P4: keep files under one of the static prefixes AND deeper than
    prefix-depth+1 (root files ignored), replicating
    cvp_bucket_event_lambda_handler.py:244-254 on the path column."""
    p = F.col(path_col)
    conds = None
    for prefix in prefixes:
        depth_ok = (
            F.size(F.split(p, "/")) - 1 > prefix.count("/") + 1
        )
        c = p.startswith(prefix) & depth_ok
        conds = c if conds is None else conds | c
    return df.filter(conds) if conds is not None else df
