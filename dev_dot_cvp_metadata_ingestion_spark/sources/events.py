"""S1: SNS-wrapped S3 event decoding (SURVEY §2.1).

The reference's Lambda entry receives an SNS envelope whose Message is
an S3 event; it extracts bucket + URL-unquoted key
(bucket_event_lambda_handler.py:14-26). In the engine, arrival
discovery is the file source — but event-feed ingestion (e.g. an SQS
dump or event-log table) still needs the decode, exposed both as a
driver-side helper and as a Column recipe over an events table.
"""

from __future__ import annotations

import json
from urllib.parse import unquote_plus

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def decode_s3_event(event: dict) -> tuple[str, str]:
    """Driver-side decode of one SNS-wrapped S3 event → (bucket, key),
    key URL-unquoted with '+'→space (unquote_plus), matching
    bucket_event_lambda_handler.py:14-26."""
    sns_message = json.loads(event["Records"][0]["Sns"]["Message"])
    record = sns_message["Records"][0]["s3"]
    return record["bucket"]["name"], unquote_plus(record["object"]["key"])


def decode_s3_event_col(event_json: Column) -> list[Column]:
    """The same decode as Column expressions over a string column of
    SNS event JSON — for ingesting an event feed as a table. Returns
    [bucket, key] columns (key URL-decoded, + → space)."""
    msg = F.get_json_object(event_json, "$.Records[0].Sns.Message")
    bucket = F.get_json_object(msg, "$.Records[0].s3.bucket.name")
    key = F.url_decode(
        F.get_json_object(msg, "$.Records[0].s3.object.key")
    )
    return [bucket.alias("bucket"), key.alias("key")]


def decode_s3_events(df: DataFrame, event_col: str = "event_json") -> DataFrame:
    return df.select(*decode_s3_event_col(F.col(event_col)))
