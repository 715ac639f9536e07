"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference CVP metadata-ingestion pipeline
(jacob6838/dev-dot-cvp-metadata-ingestion), re-expressed Spark-first.

Layout:
    session    — SparkSession factory tuned for local[N] and cluster use
    sources    — table catalog, file sources, record parsers, rule configs
    functions  — scalar/column function library (paths, text, vectors)
    operators  — validation, sequential, aggregates, dedup, similarity
    plans      — end-to-end composed pipelines
    streaming  — structured-streaming variants of the batch pipelines
"""

__version__ = "0.1.0"
