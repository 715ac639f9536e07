"""File-metadata projection — P1-P3, S1-S2 (SURVEY §2.1-§2.2).

Builds the per-file metadata document the reference indexes into
Elasticsearch (bucket_event_lambda_handler.py:41-89): object stats,
derived size, ISO mtime, and path-derived dimensional tokens:

* ``Dataset`` = first path segment (line 49)
* waze branch: Hive-style ``type=`` / ``table=`` / ``state=`` tokens
  (lines 53-73)
* cv branch: DataProvider / DataType = 2nd / 3rd segments (lines 74-85)

Deviation (documented, SURVEY §7.5): the reference gates token
extraction on a substring test (``'type' in key``) then splits on
``'/type='`` — a key containing 'type' without the Hive token would
crash it. Here extraction is a guarded regexp: the token column is NULL
unless ``/type=`` is actually present.

Scale: pure narrow projections on the file-catalog DataFrame — no
shuffle, fully codegen'd, safe at any file count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hive_token(key: Column, name: str) -> Column:
    """Extract a Hive-style ``name=value`` token from a path (P2)."""
    return F.nullif(F.regexp_extract(key, f"/{name}=([^/]+)", 1), F.lit(""))


def dataset_of(key: Column) -> Column:
    return F.split(key, "/").getItem(0)


def file_metadata(
    files: DataFrame,
    *,
    key: str = "key",
    content_length: str = "content_length",
    last_modified: str = "last_modified",
    content_type: str = "content_type",
    etag: str = "etag",
    environment: str = "dev",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Metadata document per file (wide union of the waze and cv
    branches; inapplicable token columns are NULL)."""
    k = F.col(key)
    dataset = dataset_of(k)
    is_waze = dataset == "waze"
    is_cv = dataset == "cv"
    segs = F.split(k, "/")
    return files.select(
        k.alias("Key"),
        F.col(content_length).cast("long").alias("ContentLength"),
        (F.col(content_length) / F.lit(1024**2)).alias("SizeMiB"),
        F.date_format(F.col(last_modified), "yyyy-MM-dd'T'HH:mm:ss").alias(
            "LastModified"
        ),
        F.col(content_type).alias("ContentType"),
        F.col(etag).alias("ETag"),
        dataset.alias("Dataset"),
        F.lit(environment).alias("Environment"),
        F.when(is_waze, hive_token(k, "type")).alias("TrafficType"),
        F.when(is_waze, hive_token(k, "table")).alias("TableName"),
        F.when(is_waze, hive_token(k, "state")).alias("State"),
        F.when(is_cv, segs.getItem(1)).alias("DataProvider"),
        F.when(is_cv, segs.getItem(2)).alias("DataType"),
        *[F.col(c) for c in passthrough],
    )


ZERO_BYTE_SENTINEL = 166  # empty Waze payload (bucket_event_lambda_handler.py:129)


def _metric(
    namespace: str,
    metric_name: str,
    dim1: tuple[str, Column],
    dim2: tuple[str, Column] | None,
    value: Column,
    unit: str = "Count",
) -> list[Column]:
    cols = [
        F.lit(namespace).alias("namespace"),
        F.lit(metric_name).alias("metric_name"),
        F.lit(dim1[0]).alias("dim1_name"),
        dim1[1].cast("string").alias("dim1_value"),
        (F.lit(dim2[0]) if dim2 else F.lit(None).cast("string")).alias("dim2_name"),
        (dim2[1].cast("string") if dim2 else F.lit(None).cast("string")).alias(
            "dim2_value"
        ),
        value.cast("double").alias("value"),
        F.lit(unit).alias("unit"),
    ]
    return cols


def file_metrics(
    meta: DataFrame,
    *,
    bucket: str = "bucket",
    submissions_bucket: str = "submissions",
    curated_bucket: str = "curated",
) -> DataFrame:
    """The four CloudWatch counter shapes as one ``metrics`` DataFrame
    (namespace, metric_name, dims, value, unit) — the reference's
    per-file put_metric_data calls become grouped counts
    (bucket_event_lambda_handler.py:105-198):

    * waze submissions: counts by (State, TrafficType), value 1/file
    * waze zero-byte:   ContentLength==166 counts by (State, TrafficType)
    * cv submissions:   counts by (DataProvider, DataType), value 10/file
      (the reference literally publishes 10, line 168 — replicated)
    * waze curated:     counts by (State, TableName), value 1/file

    Scale: groupBy on low-cardinality dims — map-side partial aggregation
    makes these nearly free regardless of file count.
    """
    b = F.col(bucket)
    waze_sub = meta.filter((b == submissions_bucket) & (F.col("Dataset") == "waze"))
    cv_sub = meta.filter((b == submissions_bucket) & (F.col("Dataset") == "cv"))
    curated = meta.filter((b == curated_bucket) & (F.col("Dataset") != "manifest"))

    m1 = waze_sub.groupBy("State", "TrafficType").count().select(
        *_metric(
            "dot-sdc-waze-submissions-bucket-metric",
            "Counts by state and traffic type",
            ("State", F.col("State")),
            ("TrafficType", F.col("TrafficType")),
            F.col("count"),
        )
    )
    m2 = (
        waze_sub.filter(F.col("ContentLength") == ZERO_BYTE_SENTINEL)
        .groupBy("State", "TrafficType")
        .count()
        .select(
            *_metric(
                "dot-sdc-waze-zero-byte-submissions-metric",
                "Zero Byte Submissions by State and traffic type",
                ("State", F.col("State")),
                ("TrafficType", F.col("TrafficType")),
                F.col("count"),
            )
        )
    )
    m3 = cv_sub.groupBy("DataProvider", "DataType").count().select(
        *_metric(
            "dot-sdc-cv-submissions-bucket-metric",
            "Counts by provider and datatype",
            ("DataProvider", F.col("DataProvider")),
            ("DataType", F.col("DataType")),
            F.col("count") * 10,
        )
    )
    m4 = curated.groupBy("State", "TableName").count().select(
        *_metric(
            "dot-sdc-waze-curated-bucket-metric",
            "Counts by state and table name",
            ("State", F.col("State")),
            ("TableName", F.col("TableName")),
            F.col("count"),
        )
    )
    return m1.unionByName(m2).unionByName(m3).unionByName(m4)


CV_SUBMISSIONS_NAMESPACE = "dot-sdc-cv-submissions-bucket-metric"

MESSAGE_METRIC_SHAPES = (
    ("Counts by provider and datatype", "files"),
    ("Valid counts by provider and datatype", "valid"),
    ("Invalid counts by provider and datatype", "invalid"),
    ("Data file count by provider and datatype", "files"),
)


def message_metrics(
    tallies: DataFrame,
    *,
    provider: str = "DataProvider",
    data_type: str = "DataType",
    valid_messages: str = "num_valid_messages",
    error_messages: str = "num_error_messages",
) -> DataFrame:
    """A5: record-level valid/invalid message counters by
    (DataProvider, DataType) — the reference's production canary
    (cvp_bucket_event_lambda_handler.py:177-221). Per file it publishes
    four put_metric_data shapes with Value = 1, num_valid_messages,
    num_error_messages, 1; grouped here the per-file Value=1 puts fold
    into file counts and the message counts sum.

    Input: one row per file carrying the dims and the per-file tallies
    (the return shape of the A2 tally aggregate joined to P1 path
    tokens).

    Scale: ONE map-side-combinable groupBy on low-cardinality dims,
    then a stack() unpivot into the four metric shapes — no union of
    re-scanned branches, no second shuffle.
    """
    g = tallies.groupBy(provider, data_type).agg(
        F.count(F.lit(1)).alias("files"),
        F.sum(valid_messages).alias("valid"),
        F.sum(error_messages).alias("invalid"),
    )
    stack_args = ", ".join(
        f"'{name}', CAST({col} AS DOUBLE)" for name, col in MESSAGE_METRIC_SHAPES
    )
    return g.select(
        F.lit(CV_SUBMISSIONS_NAMESPACE).alias("namespace"),
        F.expr(
            f"stack({len(MESSAGE_METRIC_SHAPES)}, {stack_args})"
            " AS (metric_name, value)"
        ),
        F.lit("DataProvider").alias("dim1_name"),
        F.col(provider).cast("string").alias("dim1_value"),
        F.lit("DataType").alias("dim2_name"),
        F.col(data_type).cast("string").alias("dim2_value"),
        F.lit("Count").alias("unit"),
    ).select(
        "namespace",
        "metric_name",
        "dim1_name",
        "dim1_value",
        "dim2_name",
        "dim2_value",
        "value",
        "unit",
    )
