"""End-to-end CVP pipeline (SURVEY §3.4) — the batch replacement for
the reference's per-file Lambda: directory in → four tables out.

    records  = scan (S3-S5) + provenance
    results  = rule validation (compiled Columns) + sequential windows
    metadata = per-file document incl. MessageCount (A1)
    tallies  = per-file A2 aggregates
    metrics  = CloudWatch counter shapes (A4-A6)

Everything is one lineage; Catalyst prunes record fields the rules
never touch, and the only shuffles are the per-file window (sequential)
and the per-file/ per-dim aggregates.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.types import StructType

from ..operators.metadata import file_metadata, file_metrics
from ..operators.sequential import SequentialSpec, sequential_results
from ..operators.validation import skip_flag_exprs, validate
from ..sources.files import file_lines, file_lines_chunked
from ..sources.rules import RuleSet

N_SEQ_ID = "metadata.serialId"


@dataclass
class PipelineResult:
    records: DataFrame
    validation: DataFrame  # long field results
    sequential: DataFrame  # long sequential results
    tallies: DataFrame  # per-file A2
    file_counts: DataFrame  # per-file record counts (A1)


def run_cv_pipeline(
    spark: SparkSession,
    input_dir: str,
    ruleset: RuleSet,
    schema: StructType | None = None,
    *,
    chunked: bool = False,
) -> PipelineResult:
    """Batch pipeline over a directory of NDJSON CV files.

    ``record_uid`` is the file's 1-based non-blank line number — the
    reference's own serial fallback (validator.py:398-400). It is
    DETERMINISTIC under stage retry (derived structurally from the
    line position, never from monotonically_increasing_id, whose
    values change when a shuffle-map stage is recomputed —
    SPARK-23207 class), and unique within a file; every aggregate
    over it also groups by ``file_path``.

    ``schema`` is the record schema; when omitted it is inferred with
    one ``spark.read.json`` pass (same cost the previous inferred-read
    paid).

    ``chunked=True`` reads via :func:`file_lines_chunked`, bounding
    executor memory by the block-split size instead of the largest
    single object — the setting for corpora with multi-GB objects;
    output is identical.
    """
    if schema is None:
        schema = (
            spark.read.option("recursiveFileLookup", "true")
            .json(input_dir)
            .schema
        )
    reader = file_lines_chunked if chunked else file_lines
    records = (
        reader(spark, input_dir)
        .select(
            "file_path",
            "file_size",
            "file_mtime",
            F.col("line_no").alias("record_uid"),
            F.from_json("line", schema, {"mode": "PERMISSIVE"}).alias("_rec"),
        )
        .select("file_path", "file_size", "file_mtime", "record_uid", "_rec.*")
    )
    schema = records.schema

    validation = validate(records, ruleset, ["file_path", "record_uid"])

    ts = lambda c: F.to_timestamp(  # noqa: E731
        F.regexp_replace(F.col(c), "Z$", "+00:00")
    )
    spec = SequentialSpec(
        file=F.col("file_path"),
        bundle_id=F.col(f"{N_SEQ_ID}.bundleId"),
        serial_number=F.col(f"{N_SEQ_ID}.serialNumber"),
        record_id=F.col(f"{N_SEQ_ID}.recordId"),
        bundle_size=F.col(f"{N_SEQ_ID}.bundleSize"),
        record_generated_at=ts("metadata.recordGeneratedAt"),
        ode_received_at=ts("metadata.odeReceivedAt"),
        has_log_file_name=F.col("metadata.logFileName").isNotNull(),
        skip_flags=skip_flag_exprs(ruleset, schema),
    )
    sequential = (
        sequential_results(records, spec)
        if ruleset.sequential
        else spark.createDataFrame(
            [],
            "file string, serial_number long, field_path string, "
            "valid boolean, details string",
        )
    )

    file_counts = records.groupBy("file_path").agg(
        F.count(F.lit(1)).alias("MessageCount")
    )

    # A2 tallies (cvp_bucket_event_lambda_handler.py:115-153)
    tallies = validation.groupBy("file_path").agg(
        F.count_distinct("record_uid").alias("num_messages_total"),
        F.count(F.lit(1)).alias("num_validations"),
        F.sum((~F.col("valid")).cast("long")).alias("num_errors"),
        F.count_distinct(
            F.when(~F.col("valid"), F.col("record_uid"))
        ).alias("num_error_messages"),
    ).withColumn(
        "num_valid_messages",
        F.col("num_messages_total") - F.col("num_error_messages"),
    )
    return PipelineResult(
        records=records,
        validation=validation,
        sequential=sequential,
        tallies=tallies,
        file_counts=file_counts,
    )


def observe_pipeline(
    result: PipelineResult,
) -> tuple[PipelineResult, dict[str, "Observation"]]:
    """S10 log sink, Spark-first: the reference logs per-file progress
    and error counts to CloudWatch Logs as it iterates records
    (common/logger_utility.py:6-43, validator.py:392-393). The Spark
    replacement is the ``Observation`` API — named aggregate metrics
    that ride the EXISTING actions (writes), costing zero extra jobs,
    instead of separate ``count()`` jobs or driver-side loops.

    Returns a result whose ``validation`` / ``records`` frames are
    observed plus the Observation handles. An Observation only fires
    when its OWN node executes, so ``file_counts`` is rebuilt from the
    observed records frame — ``write_tables`` on the returned result
    then triggers both observations with no extra action. Use
    :func:`log_progress` to render them as the reference's log lines.
    """
    from pyspark.sql import Observation

    obs_records = Observation("cv_records")
    obs_validation = Observation("cv_validation")
    records = result.records.observe(
        obs_records,
        F.count(F.lit(1)).alias("n_records"),
        F.approx_count_distinct("file_path").alias("n_files"),
    )
    validation = result.validation.observe(
        obs_validation,
        F.count(F.lit(1)).alias("n_validations"),
        F.sum((~F.col("valid")).cast("long")).alias("n_errors"),
    )
    file_counts = records.groupBy("file_path").agg(
        F.count(F.lit(1)).alias("MessageCount")
    )
    observed = PipelineResult(
        records=records,
        validation=validation,
        sequential=result.sequential,
        tallies=result.tallies,
        file_counts=file_counts,
    )
    return observed, {"records": obs_records, "validation": obs_validation}


def log_progress(observations: dict, logger=None) -> dict[str, dict]:
    """Render observed pipeline counters as the reference's progress
    log lines (logger_utility.py:24-43). Call AFTER an action has run
    on the observed frames; blocks until the metrics are available."""
    import logging

    log = logger or logging.getLogger("cv_pipeline")
    metrics = {name: dict(obs.get) for name, obs in observations.items()}
    for name, vals in metrics.items():
        log.info("pipeline progress %s: %s", name, vals)
    return metrics


def run_file_metadata_pipeline(
    files: DataFrame, environment: str = "dev"
) -> tuple[DataFrame, DataFrame]:
    """Generic (Waze/curated) path §3.2: metadata docs + metric shapes
    from a file catalog (bucket, key, content_length, last_modified,
    content_type, etag)."""
    meta = file_metadata(files, environment=environment, passthrough=("bucket",))
    return meta, file_metrics(meta)


def write_tables(result: PipelineResult, out_dir: str) -> dict[str, str]:
    """S8/S9 as tables: the reference's Elasticsearch index and
    CloudWatch puts become partition-friendly parquet appends —
    idempotent re-runs overwrite per path, and the validation results
    partition by file so downstream readers prune to one file's output.

    Returns {table_name: path}.
    """
    paths = {}
    for name, df, partition in [
        ("validation_results", result.validation, None),
        ("sequential_results", result.sequential, None),
        ("file_tallies", result.tallies, None),
        ("file_counts", result.file_counts, None),
    ]:
        path = f"{out_dir}/{name}"
        writer = df.write.mode("overwrite")
        if partition:
            writer = writer.partitionBy(partition)
        writer.parquet(path)
        paths[name] = path
    return paths
