"""Distributed heavy hitters: per-partition Misra-Gries candidate
summaries + an exact semi-join recount — frequent items at 100 TB
without shuffling the whole vocabulary.

A plain ``groupBy(word).count().filter(freq > phi*n)`` is exact but
shuffles EVERY distinct word — at web scale that is billions of
grouping keys moved to keep a few thousand. Misra-Gries (1982; the
"Frequent" algorithm) keeps at most ``ceil(1/phi)`` counters per
partition and guarantees every item with LOCAL count > phi * n_p
survives the summary. By pigeonhole, any item with GLOBAL count
> phi * n must exceed phi * n_p in at least one partition, so the
union of per-partition survivors is a SUPERSET of the true heavy
hitters under ANY partitioning — which is why the two-phase result
(exact recount restricted to candidates, then the exact threshold
filter) is bit-identical to the naive full aggregate: the sketch only
prunes, never decides. Partition-count invariance of the FINAL output
is pinned in tests/test_partition_invariance.py; the superset property
is what makes that hold even though the candidate set itself is
partitioning-dependent.

The per-partition summary is Arrow-batched pandas (repo UDF policy: no
per-row Python UDFs; ``mapInPandas`` is the sanctioned Python path) —
each batch folds into the counter dict via one vectorized
``value_counts``, and overflow beyond capacity is resolved by the
batched decrement: subtract the (cap+1)-th largest counter value from
all and drop the non-positive. Each unit of decrement removes at least
cap+1 from the summary's total mass, the same ledger as unit
decrements, so the classic undercount bound (≤ n_p/(cap+1)) — and with
it the superset guarantee — survives batching.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mg_candidates(items: DataFrame, col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries survivors of ``items[col]`` (one
    string column in, one ``word`` string column out, ≤ ``capacity``
    rows per input partition)."""
    import pandas as pd

    def summarize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters: dict[str, int] = {}
        for pdf in batches:
            vc = pdf[col].value_counts()
            for w, c in vc.items():
                counters[w] = counters.get(w, 0) + int(c)
            if len(counters) > capacity:
                vals = sorted(counters.values(), reverse=True)
                delta = vals[capacity]  # the (cap+1)-th largest
                counters = {
                    w: c - delta for w, c in counters.items() if c > delta
                }
        # explicit object dtype: an empty partition's [] would default
        # to float64 and fail the Arrow string conversion
        yield pd.DataFrame(
            {"word": pd.Series(list(counters.keys()), dtype="object")}
        )

    return items.select(F.col(col).alias(col)).mapInPandas(
        summarize, "word string"
    )


def heavy_hitters(
    items: DataFrame, col: str, threshold_ppm: int, capacity: int | None = None
) -> DataFrame:
    """All values of ``items[col]`` with frequency strictly above
    ``threshold_ppm`` parts-per-million of the total row count, with
    EXACT counts — (word, n_occurrences, freq_ppm), unordered.

    ``capacity`` defaults to ``ceil(1e6 / threshold_ppm)``, the
    smallest Misra-Gries size that guarantees no true heavy hitter is
    pruned. Scale shape: one Arrow map-side pass produces ≤ capacity
    candidate rows per partition; the exact recount aggregates only
    candidate-matching rows (broadcast semi-join — the candidate
    relation is partitions × capacity, config-scale); the total row
    count is a single-row aggregate. Nothing vocabulary-sized ever
    shuffles."""
    if capacity is None:
        capacity = -(-1_000_000 // threshold_ppm)
    it = items.select(F.col(col).alias("_w"))
    cand = mg_candidates(items, col, capacity).distinct()
    total = it.agg(F.count(F.lit(1)).alias("n_total"))
    counts = (
        it.join(F.broadcast(cand), it["_w"] == cand["word"], "leftsemi")
        .groupBy(F.col("_w").alias("word"))
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(
            F.col("n_occurrences") * F.lit(1_000_000)
            > F.lit(threshold_ppm) * F.col("n_total")
        )
        .select(
            "word",
            "n_occurrences",
            F.expr("n_occurrences * 1000000L div n_total").alias("freq_ppm"),
        )
    )
