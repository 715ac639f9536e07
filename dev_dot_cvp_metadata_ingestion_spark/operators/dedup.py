"""Deduplication operators for LLM-scale corpora (beyond-reference,
BASELINE.json north star): exact, MinHash+LSH, SimHash, n-gram Jaccard.

All pure Column expressions / DataFrame ops — no UDFs — so each stage
is codegen'd and shuffle-efficient:

* exact: hash-groupBy on a normalized md5 fingerprint. One shuffle on
  the fingerprint; at 100 TB this is the cheapest possible dedup.
* MinHash+LSH: shingle → per-hash min (map-side only) → band explode →
  self-join on (band, value) → exact-Jaccard verify on the candidates.
  The join key is the band hash, so the shuffle moves only
  (doc_id, band) pairs, never the text; candidate verification joins
  shingle arrays back by doc_id. This is the standard near-dup pattern
  that scales linearly in corpus size instead of O(n²).
* SimHash: explode tokens → groupBy doc with 16 bit-vote sums →
  recombine; one shuffle on doc_id (map-side combine applies).
* n-gram Jaccard: exact pairwise within a blocking key (source) —
  quadratic inside blocks only, the classic blocked-verify step.

Hash base: the first 8 hex chars of md5 → uint32, identical in Spark
(`conv(substring(md5(s),1,8),16,10)`) and DuckDB
(`('0x'||substr(md5(s),1,8))::BIGINT`), keeping every derived hash
oracle-reproducible.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.relations import rebalance_narrow_scan
from ..functions.text import content_fingerprint, tokens

MINHASH_P = 2_147_483_647  # 2^31 - 1


def base_hash(s: Column) -> Column:
    """First 8 md5 hex chars as uint32 — the cross-engine hash seed."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles (empty array when too few tokens).

    Built as n-1 zip_with passes against shifted slices of the token
    array instead of per-index element_at lookups — ~12× faster under
    Spark's interpreted higher-order functions, identical output."""
    t = tokens(text)
    size = F.size(t)
    if n == 1:
        return F.array_distinct(t)
    acc = t
    for k in range(1, n):
        shifted = F.slice(t, k + 1, F.greatest(size - k, F.lit(0)))
        # zip_with pads the shorter side with NULL; concat(x, NULL) is
        # NULL, and the final slice drops that tail
        acc = F.zip_with(acc, shifted, lambda x, y: F.concat(x, F.lit(" "), y))
    made = F.slice(acc, 1, F.greatest(size - (n - 1), F.lit(1)))
    return F.when(size >= n, F.array_distinct(made)).otherwise(
        F.array().cast("array<string>")
    )


def ordered_grams(text: Column, n: int) -> Column:
    """Positional (non-distinct) n-word grams in document order — the
    rolling-window input winnowing needs; same shifted-slice zip_with
    construction as :func:`shingles` minus the distinct."""
    t = tokens(text)
    size = F.size(t)
    if n == 1:
        return t
    acc = t
    for k in range(1, n):
        shifted = F.slice(t, k + 1, F.greatest(size - k, F.lit(0)))
        acc = F.zip_with(acc, shifted, lambda x, y: F.concat(x, F.lit(" "), y))
    made = F.slice(acc, 1, F.greatest(size - (n - 1), F.lit(1)))
    return F.when(size >= n, made).otherwise(F.array().cast("array<string>"))


def winnow_fingerprints(
    df: DataFrame, text_col: str = "text", n: int = 4, w: int = 5,
    out: str = "fingerprints",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every positional n-gram,
    slide a window of ``w`` hashes, keep each window's minimum, distinct
    the minima. Guarantees any shared run of ``n + w - 1`` tokens
    between two documents produces at least one common fingerprint,
    with ~2/(w+1) of grams selected — the bounded-size rolling-hash
    sketch for plagiarism/overlap detection. Appends array column
    ``out``; map-side only, no shuffle, linear in corpus size.

    Short-document convention (documented, mirrored in the oracle SQL):
    fewer than ``w`` gram hashes but at least one → the single global
    minimum; no grams (< ``n`` tokens) → empty, no fingerprints.

    DataFrame-level ON PURPOSE: the window minima reference the gram
    hash array many times (once per sliding position), and Catalyst
    does not share subexpressions across references inside ``transform``
    lambdas — a single fused Column expression re-derived
    tokenize→grams→md5 per WINDOW, measured 87 s at sf0.1. Staging
    ``_hs`` as a real column makes each reference an attribute read
    (CollapseProject keeps multi-referenced non-cheap aliases
    materialized), same output, 87 s → ~1 s."""
    hs_col = F.col("_hs")
    nh = F.size(hs_col)
    mins = F.transform(
        F.sequence(F.lit(1), nh - w + 1),
        lambda j: F.array_min(F.slice(hs_col, j, F.lit(w))),
    )
    fps = (
        F.when(nh >= w, F.array_distinct(mins))
        .when(nh > 0, F.array(F.array_min(hs_col)))
        .otherwise(F.array().cast("array<bigint>"))
    )
    # rebalance (r15): the gram-hash + window-minima projection
    # otherwise runs inside the single-task scan (guide §2.5 input
    # skew; no-op on an already-parallel scan); per-row values are
    # partitioning-independent
    return (
        rebalance_narrow_scan(df).withColumn(
            "_hs", F.transform(ordered_grams(F.col(text_col), n), base_hash)
        )
        .withColumn(out, fps)
        .drop("_hs")
    )


def _perm(a: int, b: int):
    # factory closure: a default-arg lambda would change the lambda
    # arity pyspark infers for the higher-order function
    return lambda x: (x * a + b) % MINHASH_P


def exact_duplicates(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup on the normalized content fingerprint: one row per
    distinct content with the keeper id (min id) and copy count."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            content_fingerprint(F.col(text_col)).alias("fingerprint"),
        )
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_signatures(
    docs: DataFrame, id_col: str, text_col: str, num_hashes: int = 8, n: int = 3
) -> DataFrame:
    """(doc_id, minh_0..minh_{k-1}) — the per-document signature.
    Base hashes are materialized as a column first so the md5 runs once
    per shingle, not once per hash function."""
    hs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.transform(shingles(F.col(text_col), n), base_hash).alias("hs"),
    )

    return hs.select(
        "doc_id",
        *[
            F.array_min(
                F.transform("hs", _perm(2 * j + 3, 7919 * j + 1))
            ).alias(f"minh_{j}")
            for j in range(num_hashes)
        ],
    )


def _shingle_hashes(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(doc_id, hs): shingle hashes as a real column — as inline
    expressions the md5 would be recomputed once per hash function. The
    verify step intersects the HASH arrays (long compares, not string
    compares) — same Jaccard both engines since both intersect the same
    hashes."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.transform(shingles(F.col(text_col), n), base_hash).alias("hs"),
    )


def _has_n_tokens(text_col: str, n: int) -> Column:
    """True iff the text has >= n whitespace-separated tokens — exactly
    the docs whose n-shingle set is non-empty. Expressed as ONE regex
    (n \\S+ runs separated by \\s+) instead of
    ``size(shingles(text)) > 0``: a filter predicate gets pushed below
    the shared projection into EVERY scan branch, and the size-of-
    shingles form re-derives the tokenize→shingle→md5 lineage per
    branch (measured +25% on dedup_minhash_pairs at sf0.1); the regex
    is a single scan-level pattern match, and it prunes the rows before
    they shuffle."""
    return F.col(text_col).rlike(r"\S+" + r"\s+\S+" * (n - 1))


def lsh_near_duplicates(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    n: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """MinHash-LSH candidate generation (1-row bands → recall
    1-(1-J)^k) + exact-Jaccard verification at ``threshold``.

    Returns (doc_id_a, doc_id_b, jaccard), a < b. The candidate join
    shuffles only (band, minhash, doc_id) tuples; text/shingles rejoin
    by doc_id for the verify step.

    This form is PURE — no persist, no hidden cache handles. The
    shingle-hash frame (tokenize → shingle → md5, the most expensive
    projection here) is consumed by three branches (signature + both
    verify sides); pinning it behind a repartition-by-doc_id exchange
    makes all three branches identical exchange subtrees, so Spark's
    ReuseExchange computes the lineage ONCE and the other consumers
    read the shuffle files. Costs one shuffle of (doc_id, hash-array)
    — far cheaper than re-evaluating the md5 lineage 3×, and the
    verify joins reuse the doc_id partitioning. For iterative use
    across several calls, ``lsh_near_duplicates_scoped`` persists the
    frame instead.
    """
    hs = _shingle_hashes(
        rebalance_narrow_scan(docs.filter(_has_n_tokens(text_col, n))),
        id_col, text_col, n,
    ).repartition(F.col("doc_id"))
    return _lsh_pairs_plan(hs, num_hashes, threshold)


def lsh_near_duplicates_banded(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """Multi-row-band LSH (classic b×r banding): a candidate needs ALL
    ``rows_per_band`` minhashes of some band to agree, so the match
    probability is 1-(1-J^r)^b — the precision-leaning operating point.
    With the same ``num_hashes`` budget as the 1-row form (b=8,r=1 →
    b=4,r=2 here), candidate volume drops roughly quadratically in the
    collision rate, which at 100 TB is the difference between a verify
    join over billions vs millions of pairs; recall is recovered by
    raising num_hashes, not by widening bands. Same pinned shingle-hash
    frame and verify step as :func:`lsh_near_duplicates`."""
    hs = _shingle_hashes(
        rebalance_narrow_scan(docs.filter(_has_n_tokens(text_col, n))),
        id_col, text_col, n,
    ).repartition(F.col("doc_id"))
    return _lsh_pairs_plan(hs, num_hashes, threshold, rows_per_band)


def _lsh_pairs_plan(
    hs: DataFrame, num_hashes: int, threshold: float, rows_per_band: int = 1
) -> DataFrame:
    cands = _lsh_candidates(hs, num_hashes, rows_per_band)
    return _verify_pairs(hs, cands, threshold)


def _lsh_candidates(
    hs: DataFrame, num_hashes: int, rows_per_band: int = 1
) -> DataFrame:
    """Distinct banded candidate pairs (doc_id_a < doc_id_b) — the
    stage BEFORE exact verification, exposed separately so the quality
    report can measure candidate precision."""
    if num_hashes % rows_per_band != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by rows_per_band "
            f"({rows_per_band}); leftover hash functions would be silently "
            "dropped, weakening recall"
        )
    # Docs with fewer than n tokens have an empty shingle set, so every
    # minhash is NULL — and Spark STRUCT equality treats NULL fields as
    # equal, which would pair every such doc with every other in each
    # band (quadratic candidate blow-up + 0/0 Jaccard). Callers filter
    # them out scan-side (_has_n_tokens — cheap, prunes before the
    # shuffle); the banded join below additionally rejects NULL-field
    # values outright, so even an unfiltered caller cannot produce the
    # quadratic blow-up. (A size(hs)>0 filter here would be pushed into
    # every scan branch and re-derive the md5 lineage per branch —
    # measured +25% at sf0.1.)
    sigs = hs.select(
        "doc_id",
        *[
            F.array_min(
                F.transform("hs", _perm(2 * j + 3, 7919 * j + 1))
            ).alias(f"minh_{j}")
            for j in range(num_hashes)
        ],
    )
    if rows_per_band == 1:
        band_structs = [
            F.struct(F.lit(j).alias("band"), F.col(f"minh_{j}").alias("value"))
            for j in range(num_hashes)
        ]
    else:
        # b×r banding: the band key is the TUPLE of r minhashes — all
        # must agree for a candidate (match prob 1-(1-J^r)^b)
        band_structs = [
            F.struct(
                F.lit(j).alias("band"),
                F.struct(
                    *[
                        F.col(f"minh_{j * rows_per_band + k}").alias(f"v{k}")
                        for k in range(rows_per_band)
                    ]
                ).alias("value"),
            )
            for j in range(num_hashes // rows_per_band)
        ]
    bands = sigs.select(
        "doc_id",
        F.explode(F.array(*band_structs)).alias("b"),
    ).select("doc_id", "b.band", "b.value")
    # scale note: bands grow with the corpus, so the self-join is
    # PINNED to a shuffle hash join (the repeated-substrings device,
    # r15): left to the planner, the size estimate at bench scale
    # picks a BROADCAST of the corpus-derived band relation, which
    # both funnels the join into a single task locally (the exchange
    # is what creates parallelism here — measured 2.5× on the posting
    # form) and is exactly the corpus-sized-broadcast shape that dies
    # at 100 TB; the pinned join shuffles (band, value) tuples —
    # linear — and a hot bucket is an AQE-splittable join partition.
    # shuffle_hash, not merge: band keys are fixed-width, the sort
    # buys nothing (A/B at sf0.1: 3.8 s hash / 4.1 none / 4.5 merge)
    left = bands.alias("l")
    right = bands.hint("shuffle_hash").alias("r")
    cands = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.value") == F.col("r.value"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_id_a"),
            F.col("r.doc_id").alias("doc_id_b"),
        )
        .distinct()
    )
    return cands


def _verify_pairs(
    hs: DataFrame, cands: DataFrame, threshold: float
) -> DataFrame:
    """Exact shingle-hash Jaccard over candidate pairs, filtered at
    ``threshold`` — (doc_id_a, doc_id_b, jaccard)."""
    a = hs.select(
        F.col("doc_id").alias("doc_id_a"),
        F.array_distinct("hs").alias("sh_a"),
    )
    b = hs.select(
        F.col("doc_id").alias("doc_id_b"),
        F.array_distinct("hs").alias("sh_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    # union > 0 is guaranteed by the empty-signature filter above, but
    # guard the division anyway so ANSI mode can never DIVIDE_BY_ZERO
    jaccard = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    out = (
        cands.join(a, "doc_id_a")
        .join(b, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            jaccard.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def lsh_quality_report(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """How good is this LSH banding config on THIS corpus: one row
    (n_candidates, n_true_pairs, n_verified, candidate_precision,
    recall) comparing the banded candidate set against exact ground
    truth at ``threshold``.

    Ground truth is EXACT for J > 0 pairs without an all-pairs join:
    any pair with positive Jaccard shares a shingle, so the
    shingle-hash posting-list self-join enumerates every true pair
    (fan-out bounded by shingle document frequency — on a corpus with
    pathological hot shingles, run the report on a sample, which is
    how banding configs are tuned in practice anyway). Verified LSH
    output is by construction candidates ∩ truth, so
    candidate_precision = n_verified / n_candidates (how much verify
    work the banding wastes) and recall = n_verified / n_true_pairs
    (what the banding misses) — the two knobs the b×r operating point
    trades (match prob 1-(1-J^r)^b)."""
    hs = _shingle_hashes(
        rebalance_narrow_scan(docs.filter(_has_n_tokens(text_col, n))),
        id_col, text_col, n,
    ).repartition(F.col("doc_id"))
    cands = _lsh_candidates(hs, num_hashes, rows_per_band)
    verified = _verify_pairs(hs, cands, threshold)
    # truth via posting-COUNT intersection: the shared-hash count per
    # pair falls out of the posting self-join's aggregate directly
    # (i = #collisions), so no per-pair array rejoin — measured 17.1 s
    # → (see SCALE.md) at sf0.1 vs the _verify_pairs form, same rows
    posting = hs.select(
        "doc_id", F.explode(F.array_distinct("hs")).alias("h")
    )
    sizes = posting.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        posting.alias("l")
        .join(
            # pinned shuffle join — see ngram_jaccard_pairs (r15)
            posting.hint("shuffle_merge").alias("r"),
            (F.col("l.h") == F.col("r.h"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(
            F.col("l.doc_id").alias("doc_id_a"),
            F.col("r.doc_id").alias("doc_id_b"),
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("sz").alias("la"))
    sb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("sz").alias("lb"))
    truth = (
        inter.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .filter(
            F.col("i").cast("double")
            / (F.col("la") + F.col("lb") - F.col("i"))
            >= threshold
        )
    )
    n_cand = cands.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_true_pairs"))
    n_ver = verified.agg(F.count(F.lit(1)).alias("n_verified"))
    return (
        n_cand.crossJoin(n_truth)
        .crossJoin(n_ver)
        .select(
            "n_candidates",
            "n_true_pairs",
            "n_verified",
            F.when(
                F.col("n_candidates") > 0,
                F.col("n_verified").cast("double") / F.col("n_candidates"),
            )
            .otherwise(F.lit(1.0))
            .alias("candidate_precision"),
            F.when(
                F.col("n_true_pairs") > 0,
                F.col("n_verified").cast("double") / F.col("n_true_pairs"),
            )
            .otherwise(F.lit(1.0))
            .alias("recall"),
        )
    )


def _band_frame(hs: DataFrame, num_hashes: int) -> DataFrame:
    """(doc_id, band, value): the 1-row-band LSH keys of a shingle-hash
    frame — the SAME permutation family as every other LSH form here
    (``_perm(2j+3, 7919j+1)``), factored out so the cross-corpus join
    and the persisted index (``sources/catalog.py:write_lsh_index``)
    key identically and a probe against a prebuilt index returns
    exactly what the in-query cross join would."""
    sigs = hs.select(
        "doc_id",
        *[
            F.array_min(
                F.transform("hs", _perm(2 * j + 3, 7919 * j + 1))
            ).alias(f"minh_{j}")
            for j in range(num_hashes)
        ],
    )
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.col(f"minh_{j}").alias("value"),
                    )
                    for j in range(num_hashes)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band", "b.value")


def lsh_cross_near_duplicates(
    left_docs: DataFrame,
    right_docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    n: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs ACROSS two corpora (e.g.
    eval-split docs vs train-split docs for fuzzy decontamination):
    candidates are (left, right) band collisions, verified by exact
    shingle Jaccard at ``threshold``. Returns
    (doc_id_left, doc_id_right, jaccard).

    Same banded shape as the self-join form — the candidate join
    shuffles only (band, minhash, doc_id) tuples, linear in corpus
    size, never all-pairs — but with no ``a < b`` constraint since the
    two sides are disjoint corpora. Empty signatures are filtered on
    both sides before their repartition pins (same NULL-collision
    hazard as the self-join)."""
    lh = _shingle_hashes(
        left_docs.filter(_has_n_tokens(text_col, n)), id_col, text_col, n
    ).repartition(F.col("doc_id"))
    rh = _shingle_hashes(
        right_docs.filter(_has_n_tokens(text_col, n)), id_col, text_col, n
    ).repartition(F.col("doc_id"))

    cands = (
        _band_frame(lh, num_hashes)
        .alias("l")
        .join(
            _band_frame(rh, num_hashes).alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.value") == F.col("r.value")),
        )
        .select(
            F.col("l.doc_id").alias("doc_id_left"),
            F.col("r.doc_id").alias("doc_id_right"),
        )
        .distinct()
    )
    a = lh.select(
        F.col("doc_id").alias("doc_id_left"), F.array_distinct("hs").alias("sh_a")
    )
    b = rh.select(
        F.col("doc_id").alias("doc_id_right"), F.array_distinct("hs").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jaccard = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        cands.join(a, "doc_id_left")
        .join(b, "doc_id_right")
        .select("doc_id_left", "doc_id_right", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def lsh_probe_index(
    index_bands: DataFrame,
    index_shingles: DataFrame,
    probe_docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    n: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """The PROBE phase of cross-corpus near-dup detection, decoupled
    from corpus signature computation: ``index_bands`` (band, value,
    doc_id) and ``index_shingles`` (doc_id, shd) come from a persisted
    LSH index (``sources/catalog.py:write_lsh_index``), and only the
    PROBE documents are tokenized/minhashed here. Returns
    (doc_id_probe, doc_id_index, jaccard) — row-for-row what
    ``lsh_cross_near_duplicates(probe_docs, index_docs, ...)`` with
    the index's (num_hashes, n) would return (pinned in
    tests/test_lsh_index.py).

    This is the steady-state production shape for deduplicating or
    decontaminating each NEW shard against a 100 TB corpus: the corpus
    text is never re-read and never re-minhashed — only its index rows
    (tens of bytes per doc vs KB of text) are scanned — and the
    corpus-sized relations never shuffle: the candidate join
    broadcasts the probe-side band keys so index bands stream
    map-side, and the verify joins broadcast the candidate list and
    the probe shingle sets so index shingles stream map-side too. The
    only shuffle in the plan is the distinct over the (small)
    candidate pair set. Growing the corpus is ``append_lsh_index`` —
    no rebuild."""
    ph = _shingle_hashes(
        probe_docs.filter(_has_n_tokens(text_col, n)), id_col, text_col, n
    )
    pshd = ph.select(
        F.col("doc_id").alias("doc_id_probe"),
        F.array_distinct("hs").alias("sh_b"),
    )
    pb = _band_frame(ph, num_hashes).select(
        F.col("doc_id").alias("doc_id_probe"), "band", "value"
    )
    cands = (
        index_bands.alias("i")
        .join(F.broadcast(pb).alias("p"), ["band", "value"])
        .select(
            F.col("i.doc_id").alias("doc_id_index"),
            F.col("p.doc_id_probe").alias("doc_id_probe"),
        )
        .distinct()
    )
    a = index_shingles.select(
        F.col("doc_id").alias("doc_id_index"), F.col("shd").alias("sh_a")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jaccard = F.when(union > 0, inter.cast("double") / union).otherwise(
        F.lit(0.0)
    )
    return (
        F.broadcast(cands)
        .join(a, "doc_id_index")
        # A replayed ingest batch whose append_lsh_index already
        # committed leaves duplicate (identical) index rows per doc —
        # the sink's first-seen gate tolerates them, but without this
        # dedup every OTHER probe consumer would emit duplicate
        # (probe, index, jaccard) rows (ADVICE r8). Deduping HERE —
        # after the broadcast candidate join — keeps the relation
        # candidate-pair-sized; a dropDuplicates on index_shingles
        # itself would be a corpus-sized shuffle.
        .dropDuplicates(["doc_id_probe", "doc_id_index"])
        .join(F.broadcast(pshd), "doc_id_probe")
        .select("doc_id_probe", "doc_id_index", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


@contextmanager
def lsh_near_duplicates_scoped(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    n: int = 3,
    threshold: float = 0.3,
):
    """Caching ``lsh_near_duplicates``: the shared shingle-hash frame
    (consumed by the signature and both verify branches) is persisted
    for the block and unpersisted on exit — the explicit cache
    lifecycle, with no handle smuggled on the returned DataFrame. Run
    your actions inside the block."""
    hs = _shingle_hashes(
        docs.filter(_has_n_tokens(text_col, n)), id_col, text_col, n
    ).persist()
    try:
        yield _lsh_pairs_plan(hs, num_hashes, threshold)
    finally:
        hs.unpersist()


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
    max_iters: int = 25,
    rounds_out: list | None = None,
) -> DataFrame:
    """Duplicate CLUSTERS from pairwise candidates: connected
    components of the (a, b) pair graph over ``nodes``, labelled by
    the component's minimum id. (doc_id, cluster_id); singletons label
    themselves.

    Iterative min-label propagation with pointer jumping
    (label := min over neighbours' labels AND label[label], the
    path-halving step), so convergence is O(log D) rounds in the
    component diameter D — near-dup clusters are shallow, so 2-4
    rounds in practice. Each round is one join+aggregate shuffle on
    ids; ``localCheckpoint`` truncates the growing lineage so round k
    doesn't replan rounds 1..k-1. The loop is driver-side but each
    step is fully distributed — the driver only compares a per-round
    change count.

    ``rounds_out`` semantics (r15 optimization, noted per ADVICE r15):
    round 1 skips its convergence count (any graph with an edge
    changes a label in round 1), so an EDGELESS graph now runs and
    reports 2 rounds where it previously reported 1 — results and
    termination are unchanged; only the diagnostic round count moved.
    """
    # edges join every round: materialize once so the (potentially
    # expensive) pair lineage isn't re-executed per iteration
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint()

    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        # min label among neighbours
        nbr = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_min"))
        )
        # pointer jumping: my label's label
        parent = labels.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        jumped = labels.join(
            parent, labels.label == F.col("p_node"), "left"
        ).select("node", "label", F.col("p_label").alias("jump_min"))
        new_labels = (
            jumped.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nbr_min"), F.col("label")),
                    F.coalesce(F.col("jump_min"), F.col("label")),
                ).alias("new_label"),
                "label",
            )
        ).localCheckpoint()
        # round 1 skips the convergence count (r15): any graph with an
        # edge changes at least one label in round 1, so the count is
        # informative only from round 2 on — one fewer job per CC call
        # on every real graph. An EDGELESS graph pays one extra
        # (cheap) round before its round-2 count reads 0; termination
        # and results are unchanged.
        changed = (
            1
            if rounds == 1 and max_iters > 1
            else new_labels.filter(
                F.col("new_label") != F.col("label")
            ).count()
        )
        labels = new_labels.select(
            "node", F.col("new_label").alias("label")
        )
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint in {max_iters} rounds"
        )
    if rounds_out is not None:
        rounds_out.append(rounds)
    return labels.select(
        F.col("node").alias(id_col), F.col("label").alias("cluster_id")
    )


def connected_components_twostar(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
    max_iters: int = 50,
    rounds_out: list | None = None,
) -> DataFrame:
    """``connected_components`` via the alternating large-star /
    small-star algorithm (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14) — the O(log n)-round form whose
    per-round work is two groupBy-min shuffles over the EDGE relation,
    with no per-node label table joined back every round. (The
    pointer-jumping sibling is also O(log n) rounds thanks to its
    path-halving step; the trade is state shape, not round count —
    see SCALE.md for measured rounds/wall on chain and star
    fixtures.)

    Each round rewrites the edge set:

    * large-star — for every node u with min-incident-label
      m(u) = min({u} ∪ N(u)), each strictly-larger neighbour v > u is
      re-pointed at m(u).  Connectivity is preserved (v—u—m becomes
      v—m with u—m retained via v's own large-star emit or the
      small-star step) and edges only ever point "downhill".
    * small-star — edges are kept canonical (bigger, smaller); every
      bigger endpoint u re-points itself and all its smaller
      neighbours at m(u) = min of those neighbours.

    The fixpoint is a star forest: every non-root node holds exactly
    one edge to its component's minimum id, which IS the cluster
    label, so no separate label-propagation table is ever
    materialised.  Convergence is detected by an edge-set fingerprint
    (count + sum of per-edge xxhash64) staying fixed across a round —
    one aggregate action per round, vs the label-table join + count of
    the pointer-jumping form.  ``rounds_out`` (a list, appended with
    the round count) lets tests pin the measured O(log n) behaviour.

    Output identical to ``connected_components`` (same (id, cluster_id)
    relation, min-id labels, singletons label themselves) — pinned in
    tests/test_dedup_twostar.py and via the shared recursive-CTE
    oracle of ``dedup_clusters``.
    """
    # canonical undirected edges: (u, v) with u > v, self-loops dropped
    a, b = F.col(a_col), F.col(b_col)
    edges = (
        pairs.select(
            F.greatest(a, b).alias("u"), F.least(a, b).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    def fingerprint(e: DataFrame) -> tuple:
        row = e.agg(
            F.count(F.lit(1)).alias("c"),
            # bit_xor, not sum: order-insensitive over the distinct edge
            # set and immune to ANSI-mode long overflow
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).first()
        return (row["c"], row["h"])

    prev = fingerprint(edges)
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        # --- large-star: symmetrize, group by centre u, re-point the
        # strictly-larger neighbours at m(u) = min(u, min N(u)).
        sym = edges.select("u", "v").unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least(F.col("u"), F.col("_mn")).alias("m"))
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # --- small-star: edges are (bigger u, smaller v); every u
        # re-points itself and its smaller neighbours at min(N_small).
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(smins.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        cur = fingerprint(small)
        edges = small
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components_twostar: no fixpoint in {max_iters} rounds"
        )
    if rounds_out is not None:
        rounds_out.append(rounds)

    # star forest: every non-root points straight at its component min
    labels = nodes.select(F.col(id_col).alias("node")).join(
        edges.select(F.col("u").alias("node"), F.col("v").alias("root")),
        "node",
        "left",
    )
    return labels.select(
        F.col("node").alias(id_col),
        F.coalesce(F.col("root"), F.col("node")).alias("cluster_id"),
    )


def segment_boilerplate_removal(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    seg_tokens: int = 10,
    max_df: int = 2,
) -> DataFrame:
    """Corpus-level repeated-segment removal — the C4 / RefinedWeb
    boilerplate pass generalized from lines/paragraphs to fixed
    ``seg_tokens``-token windows (this corpus has no newlines; a real
    web corpus would segment on them instead, same plan). A segment
    whose distinct-document frequency exceeds ``max_df`` is boilerplate
    (navigation, license headers, templated sentences) and is dropped
    from EVERY document; survivors are reassembled in order.

    Scale shape: explode to (doc, pos, segment) — with
    ``posexplode_outer`` so zero-token docs keep a carrier row and no
    second pass over the doc relation is ever needed — then a
    two-phase distinct+count finds the HOT segments only (by
    construction a tiny relation — boilerplate is rare among distinct
    segments), a BROADCAST left join marks hotness, and ONE
    groupBy-doc conditional aggregation reassembles survivors and
    counts removals in the same shuffle. Total motion: the corpus is
    scanned twice (hot build + reassembly; scans are cheap, shuffles
    are not), the segment relation is shuffled once per purpose, and
    nothing doc-sized is ever broadcast or joined. Same
    small-hot-set-broadcast assumption as the stop-gram cap — an
    adversarial corpus where MOST distinct segments are hot would need
    the capped-join fallback, and the honest failure is an oversized
    broadcast, not wrong output.

    Output: (id, text_clean, n_segments, n_removed); docs whose every
    segment was boilerplate (or with no tokens) come back with
    ``text_clean = ''``.
    """
    toks = tokens(F.col(text_col))
    nseg = F.ceil(F.size(toks) / F.lit(float(seg_tokens))).cast("long")
    seg_at = lambda i: F.concat_ws(  # noqa: E731
        " ", F.slice(toks, i * seg_tokens + 1, seg_tokens)
    )
    segs = F.when(
        nseg > 0,
        F.transform(F.sequence(F.lit(0), (nseg - 1).cast("int")), seg_at),
    ).otherwise(F.array().cast("array<string>"))

    # rebalance (r15): the tokenize+segment projection otherwise runs
    # inside the single-task scan (guide §2.5; no-op on a parallel
    # scan); all downstream aggregates are integer/min_by-exact
    exploded = rebalance_narrow_scan(docs).select(
        F.col(id_col).alias("_sid"), segs.alias("_segs")
    ).select("_sid", F.posexplode_outer("_segs").alias("pos", "seg"))

    hot = (
        exploded.filter(F.col("seg").isNotNull())
        .select("seg", "_sid")
        .distinct()
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > max_df)
        .select("seg", F.lit(True).alias("_hot"))
    )
    is_kept = F.col("_hot").isNull() & F.col("seg").isNotNull()
    # r16 (ADVICE on the capped pair family, same shape): forced
    # broadcast → pinned shuffle_hash — hot segments grow with the
    # corpus; measured at parity-or-better locally
    return (
        exploded.join(hot.hint("shuffle_hash"), "seg", "left")
        .groupBy("_sid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(  # collect_list drops NULLs
                            F.when(is_kept, F.struct("pos", "seg"))
                        )
                    ),
                    lambda x: x["seg"],
                ),
                " ",
            ).alias("text_clean"),
            F.count("seg").alias("n_segments"),
            F.sum(F.coalesce(F.col("_hot").cast("long"), F.lit(0))).alias(
                "n_removed"
            ),
        )
        .select(
            F.col("_sid").alias(id_col),
            "text_clean",
            "n_segments",
            "n_removed",
        )
    )


def segment_first_occurrence_dedup(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    seg_tokens: int = 10,
) -> DataFrame:
    """Corpus-level FIRST-OCCURRENCE segment dedup — the C4 "three-
    sentence span" rule (Raffel et al. 2020 §2.2, public) generalized
    to fixed ``seg_tokens``-token windows: every distinct segment
    survives exactly once corpus-wide, at its first occurrence in
    (doc_id, pos) order; later occurrences are removed and survivors
    reassembled in order. Complements ``segment_boilerplate_removal``
    (which drops hot segments from EVERYONE): here singleton segments
    are untouched and a twice-seen segment keeps its first copy.

    Scale shape: explode to (doc, pos, segment) with posexplode_outer
    (zero-token docs keep a carrier row), then ONE groupBy on the
    segment finds each segment's first occurrence via ``min_by`` over
    the (doc_id, pos) struct — map-side partial aggregation combines
    the duplicate mass before the shuffle, so a segment repeated a
    million times moves one row per input partition, never a
    million-row window group. The firsts relation (≤ one row per
    DISTINCT segment) shuffle-joins back on the segment key — both
    sides hash-partitioned by segment, AQE skew-split eligible —
    and reassembly + removal counts ride one groupBy-doc shuffle.
    Nothing is broadcast (the firsts relation is corpus-sized by
    construction, unlike the boilerplate hot set).

    Output: (id, text_clean, n_segments, n_removed); a doc whose every
    segment appeared earlier elsewhere comes back ``text_clean = ''``.
    """
    toks = tokens(F.col(text_col))
    nseg = F.ceil(F.size(toks) / F.lit(float(seg_tokens))).cast("long")
    seg_at = lambda i: F.concat_ws(  # noqa: E731
        " ", F.slice(toks, i * seg_tokens + 1, seg_tokens)
    )
    segs = F.when(
        nseg > 0,
        F.transform(F.sequence(F.lit(0), (nseg - 1).cast("int")), seg_at),
    ).otherwise(F.array().cast("array<string>"))

    # rebalance (r15): the tokenize+segment projection otherwise runs
    # inside the single-task scan (guide §2.5; no-op on a parallel
    # scan); all downstream aggregates are integer/min_by-exact
    exploded = rebalance_narrow_scan(docs).select(
        F.col(id_col).alias("_sid"), segs.alias("_segs")
    ).select("_sid", F.posexplode_outer("_segs").alias("pos", "seg"))

    firsts = (
        exploded.filter(F.col("seg").isNotNull())
        .groupBy("seg")
        .agg(
            F.min_by(
                F.struct(
                    F.col("_sid").alias("fid"), F.col("pos").alias("fpos")
                ),
                F.struct(
                    F.col("_sid").alias("oid"), F.col("pos").alias("opos")
                ),
            ).alias("_first")
        )
        .select("seg", "_first.fid", "_first.fpos")
    )
    is_kept = (
        F.col("seg").isNotNull()
        & (F.col("_sid") == F.col("fid"))
        & (F.col("pos") == F.col("fpos"))
    )
    # merge-join pin: firsts has one row per DISTINCT segment —
    # corpus-sized by construction, never broadcast-safe; the local
    # planner's size estimate at test scale would happily broadcast it
    # and hide the 100 TB hazard (pin: tests/test_paragraph_dedup.py)
    return (
        exploded.join(firsts.hint("shuffle_merge"), "seg", "left")
        .groupBy("_sid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(  # collect_list drops NULLs
                            F.when(is_kept, F.struct("pos", "seg"))
                        )
                    ),
                    lambda x: x["seg"],
                ),
                " ",
            ).alias("text_clean"),
            F.count("seg").alias("n_segments"),
            F.sum(
                F.when(F.col("seg").isNotNull() & ~is_kept, F.lit(1))
                .otherwise(F.lit(0))
                .cast("long")
            ).alias("n_removed"),
        )
        .select(
            F.col("_sid").alias(id_col),
            "text_clean",
            "n_segments",
            "n_removed",
        )
    )


def ngram_jaccard_pairs_capped(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    n: int = 2,
    threshold: float = 0.05,
    metric: str = "jaccard",
    max_doc_freq: int = 50,
) -> DataFrame:
    """``ngram_jaccard_pairs`` with the stop-gram cap its docstring
    promised: grams whose within-block document frequency exceeds
    ``max_doc_freq`` generate NO candidates (their posting lists are
    the Σ df(g)² skew bombs — one sentence shared by half a block
    makes the uncapped join quadratic in the block), but every found
    pair is still verified EXACTLY against the full shingle arrays, so
    reported similarity values are never approximated. Semantics: a
    pair is missed only if every gram it shares is ubiquitous
    (df > cap) — precisely the pairs whose similarity rides on
    boilerplate. Candidate work is bounded by Σ_{{df(g)≤cap}} df(g)²
    ≤ cap × posting volume: linear in the corpus at fixed cap,
    regardless of skew (measured in SCALE.md)."""
    # rebalance (r15): parallelize the tokenize/shingle projection out
    # of a single-task scan (guide §2.5 input skew; no-op on an
    # already-parallel scan)
    sh = rebalance_narrow_scan(docs).select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("doc_id"),
        shingles(F.col(text_col), n).alias("sh"),
    )
    posts = sh.select("block", "doc_id", F.explode("sh").alias("gram"))
    hot = (
        posts.groupBy("block", "gram")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > max_doc_freq)
        .select("block", "gram")
    )
    # exact intersection without a full-array rejoin: cold collisions
    # fall out of the pair aggregate (i_cold = #shared cold grams),
    # hot grams rejoin as SMALL per-doc arrays (≤ the block's
    # boilerplate vocabulary) whose pairwise overlap tops i back up —
    # so the clean-corpus overhead shrinks to the df aggregate + the
    # hot-mark join (measured at sf0.1, unskewed: uncapped 4.7 s,
    # array-verify capped form 8.3 s, this form 6.6 s — 1.4× for the
    # skew insurance that is 15.6× the other way under boilerplate).
    # r15: ONE hot-marking join feeds both the cold side and the
    # per-doc aggregate (was a left_anti plus an inner join over the
    # same postings), and sizes + hot arrays ride ONE groupBy
    # (collect_list skips the null-for-cold entries; a doc with no hot
    # grams gets an empty array — same intersect the old
    # null-then-coalesce path produced).
    # r16 (ADVICE medium): the FORCED broadcast of hot is gone — hot
    # grows ~posting_volume/max_doc_freq with the corpus, so pinning a
    # broadcast is exactly the corpus-derived-broadcast shape the
    # shuffle-join pins exist to forbid (it would OOM at 100 TB where
    # an unhinted join degrades gracefully). Pinned to shuffle_hash
    # instead: A/B at sf0.1/32c beats even the old broadcast
    # (ngram_capped 3.87 → 3.62 s, containment_capped 3.19 → 2.85,
    # wjaccard_capped 2.70 → 2.47; plain unhinted was ~10% SLOWER than
    # broadcast because the planner's aggregate estimate picks SMJ).
    pf = posts.join(
        hot.withColumn("_hot", F.lit(True)).hint("shuffle_hash"),
        ["block", "gram"],
        "left",
    )
    cold = pf.filter(F.col("_hot").isNull()).drop("_hot")
    per_doc = pf.groupBy("block", "doc_id").agg(
        F.count(F.lit(1)).alias("sz"),
        F.sort_array(
            F.collect_list(F.when(F.col("_hot"), F.col("gram")))
        ).alias("hg"),
    )
    a = cold.alias("a")
    # pinned shuffle join — see ngram_jaccard_pairs (r15). Stays
    # shuffle_merge (r16 A/B: hash was FLAT here — 4.12 vs 3.98 /
    # 3.07 vs 3.19 — unlike the uncapped posting join; SMJ spills
    # gracefully at scale so the default keeps the safer strategy)
    b = cold.hint("shuffle_merge").alias("b")
    i_cold = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.block").alias("block"),
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .agg(F.count(F.lit(1)).alias("ic"))
    )
    empty = F.array().cast("array<string>")
    pa = per_doc.select(
        "block",
        F.col("doc_id").alias("doc_id_a"),
        F.col("sz").alias("la"),
        F.col("hg").alias("hg_a"),
    )
    pb = per_doc.select(
        "block",
        F.col("doc_id").alias("doc_id_b"),
        F.col("sz").alias("lb"),
        F.col("hg").alias("hg_b"),
    )
    inter = F.col("ic") + F.size(
        F.array_intersect(
            F.coalesce("hg_a", empty), F.coalesce("hg_b", empty)
        )
    )
    if metric == "jaccard":
        denom = F.col("la") + F.col("lb") - inter
        score_name = "jaccard"
    elif metric == "containment":
        denom = F.least(F.col("la"), F.col("lb"))
        score_name = "containment"
    else:
        raise ValueError(f"unknown metric {metric!r}")
    score = F.when(denom > 0, inter.cast("double") / denom).otherwise(
        F.lit(0.0)
    )
    return (
        i_cold.join(pa, ["block", "doc_id_a"])
        .join(pb, ["block", "doc_id_b"])
        .select(
            "block",
            "doc_id_a",
            "doc_id_b",
            score.alias(score_name),
        )
        .filter(F.col(score_name) >= threshold)
    )


def clusters_with_exact_contraction(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    n: int = 3,
    threshold: float = 0.3,
    max_iters: int = 25,
) -> DataFrame:
    """``connected_components`` over the LSH pair graph with EXACT
    duplicates contracted first — the dup-heavy-corpus scale path
    (SCALE.md dedup scaling probe): a c-sized exact-dup group
    contributes K_c = c(c-1)/2 pairs to the graph, so on web corpora
    (where most duplicate mass is byte-identical) contraction removes
    the quadratic bulk with one linear argmax before LSH runs at all.

    PROVABLY the same output as running CC on the full graph: docs
    with an identical token sequence have identical shingle sets,
    hence identical minhash signatures, hence identical band keys and
    identical verified pairs — contracting them onto their minimum
    doc_id preserves the component structure, and the component's
    min-rep label equals the component's min doc_id (each rep IS its
    group's minimum). Asserted by equality test on a corpus with
    injected exact-dup groups (tests/test_dedup_contraction.py).

    Contraction key is the raw token sequence (not the lowercased
    fingerprint ``dedup_exact`` reports on): the key must determine
    the shingle set exactly, or contraction could merge docs whose LSH
    behavior differs. Returns (id_col, cluster_id) for EVERY doc."""
    keyed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.md5(F.concat_ws("\x1f", tokens(F.col(text_col)))).alias("_ck"),
    )
    reps = keyed.groupBy("_ck").agg(F.min("doc_id").alias("rep"))
    rep_docs = keyed.join(
        reps.select(F.col("rep").alias("doc_id")), "doc_id", "left_semi"
    )
    pairs = lsh_near_duplicates(
        rep_docs, "doc_id", "text",
        num_hashes=num_hashes, n=n, threshold=threshold,
    )
    cc = connected_components(
        pairs, rep_docs.select("doc_id"), max_iters=max_iters
    )
    # expand each doc through its group's rep — no per-group arrays, so
    # a million-copy exact-dup group stays a plain (shuffle-join) row set
    return (
        keyed.select("doc_id", "_ck")
        .join(reps, "_ck")
        .join(cc.withColumnRenamed("doc_id", "rep"), "rep")
        .select(F.col("doc_id").alias(id_col), "cluster_id")
    )


def simhash16(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash: per-bit votes over token hashes (multiplicity
    kept), sign → bit. (doc_id, simhash)."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).select("doc_id", base_hash(F.col("tok")).alias("x"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("x"), i).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(16)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    sim = None
    for i in range(16):
        bit = F.when(F.col(f"v{i}") >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


def simhash60(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash (15 md5 hex chars per token — the widest hash
    whose value fits int64 in BOTH engines): per-bit votes over token
    hashes, sign → bit. The production width: 16 bits cannot block
    (4-bit bands give 16 buckets — the pair join is quadratic by
    construction), 60 bits give 32768 buckets per 15-bit band.
    (doc_id, simhash)."""
    # rebalance (r15): tokenize+md5 otherwise run inside the
    # single-task scan (guide §2.5); bit votes are integer sums, so
    # partitioning cannot change the result
    tok = rebalance_narrow_scan(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10)
        .cast("long")
        .alias("x"),
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("x"), i).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(60)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    sim = None
    for i in range(60):
        bit = F.when(F.col(f"v{i}") >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs via the Charikar/Manku banded scheme
    (Manku et al., WWW'07, public): split the 60-bit hash into 4
    15-bit bands; any pair within ``max_hamming`` ≤ 3 differs in at
    most 3 bit positions, so by pigeonhole at least one band matches
    exactly — candidates come from equality self-joins on (band,
    value), never an all-pairs hamming scan. Each candidate is then
    verified EXACTLY (bit_count of the xor), so reported distances
    are never approximate and false candidates cost only the verify
    expression.

    Scale shape: the simhash aggregate is one map-side-combined
    shuffle on doc_id (8 bytes of hash per doc regardless of length);
    the candidate join shuffles (band, value, doc_id, simhash) tuples
    keyed on 4 × 32768 band buckets — expected bucket size n/32768,
    so candidate volume tracks true near-dup density, and a hot
    bucket is an AQE-splittable join partition (a corpus where most
    docs hash alike is by definition near-duplicate-saturated, the
    same honest exposure as the LSH band join). The measured
    contrast with 16-bit banding (quadratic, 7.6 s at sf0.1 vs
    ~1 s) is in SCALE.md. Output: (doc_id_a, doc_id_b, hamming),
    each pair exactly once."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"max_hamming={max_hamming}: the 4-band scheme guarantees "
            "recall only for hamming <= 3 (pigeonhole)"
        )
    sim = simhash60(docs, id_col, text_col)
    bands = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", 15 * i)
                        .bitwiseAND(F.lit(32767))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.band", "b.val")
    a = bands
    # pinned shuffle join — see ngram_jaccard_pairs (r15); hash, not
    # merge: band keys are fixed-width ints, the sort buys nothing
    b = bands.hint("shuffle_hash").select(
        F.col("band").alias("band2"),
        F.col("val").alias("val2"),
        F.col("doc_id").alias("doc_id_b"),
        F.col("simhash").alias("simhash_b"),
    )
    cand = (
        a.join(
            b,
            (F.col("band") == F.col("band2"))
            & (F.col("val") == F.col("val2"))
            & (F.col("doc_id") < F.col("doc_id_b")),
        )
        .select(
            F.col("doc_id").alias("doc_id_a"),
            "doc_id_b",
            "simhash",
            "simhash_b",
        )
        .distinct()
    )
    hamming = F.bit_count(
        F.col("simhash").bitwiseXOR(F.col("simhash_b"))
    ).cast("long")
    return cand.select(
        "doc_id_a", "doc_id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    n: int = 2,
    threshold: float = 0.05,
    metric: str = "jaccard",
) -> DataFrame:
    """Exact n-gram Jaccard for every candidate pair inside a blocking
    key, as a POSTING-LIST similarity join: explode each doc's distinct
    grams, self-join on (block, gram), count shared grams per (a, b),
    rejoin the two set sizes, jaccard = i / (la + lb - i). Output
    (block, doc_id_a, doc_id_b, jaccard) is IDENTICAL to the naive
    all-pairs array-intersect form for any threshold > 0 (pairs sharing
    zero grams can't clear it), but the work is Σ_g df(g)² per block —
    gram document frequency, not block size, bounds the fan-out.
    Measured at sf0.1 (20 blocks × 250 docs): all-pairs array-intersect
    44.7 s → 4.2 s. At 100 TB this is also the shape that survives: the
    shuffles key on (block, gram) and (block, a, b) — both linear in
    posting volume — and when gram skew demands it, the stop-gram cap
    is :func:`ngram_jaccard_pairs_capped` (measured flat under a
    50%-boilerplate skew that makes THIS form quadratic; SCALE.md)."""
    # rebalance (r15): parallelize the tokenize/shingle projection out
    # of a single-task scan (guide §2.5 input skew; no-op on an
    # already-parallel scan)
    sh = rebalance_narrow_scan(docs).select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("doc_id"),
        shingles(F.col(text_col), n).alias("sh"),
    )
    # shingles() emits DISTINCT grams, so posting rows are unique per
    # (doc, gram) and set sizes are exact counts of the exploded rows
    posts = sh.select("block", "doc_id", F.explode("sh").alias("gram"))
    sizes = posts.groupBy("block", "doc_id").agg(
        F.count(F.lit(1)).alias("sz")
    )
    a = posts.alias("a")
    # pinned shuffle join (r15): the planner's size estimate broadcasts
    # the corpus-derived posting relation at bench scale, serializing
    # the join into one task (measured 6.0 → 2.4 s) — and a posting
    # broadcast is the shape that cannot exist at 100 TB anyway.
    # r16 (VERDICT item 1): shuffle_merge → shuffle_hash. The r15 pin
    # was only A/B'd at sf0.1 document density; on the realistic Zipf
    # corpus the driver measured it 2.3× SLOWER and anti-scaling (10.58
    # s @32c vs 5.64 s @8c) — the sort pass buys nothing on posting
    # keys and loses badly where grams are dense. Re-A/B'd on BOTH
    # corpora (tools/ab_ngram_join.py): realistic 32c hash 2.83 /
    # merge 3.44 / unhinted 4.14; realistic 8c hash 5.17 / merge 5.77
    # (32c < 8c restored); sf0.1 hash 1.81 ≈ merge 1.77 — the r15
    # sf0.1 win is retained. AQE skew-split applies to shuffled-hash
    # joins the same as sort-merge, so the hot-gram skew story at
    # scale is unchanged.
    b = posts.hint("shuffle_hash").alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.block").alias("block"),
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    la = sizes.select(
        "block", F.col("doc_id").alias("doc_id_a"), F.col("sz").alias("la")
    )
    lb = sizes.select(
        "block", F.col("doc_id").alias("doc_id_b"), F.col("sz").alias("lb")
    )
    if metric == "jaccard":
        denom = F.col("la") + F.col("lb") - F.col("i")
    elif metric == "containment":
        # asymmetric overlap |A∩B| / min(|A|,|B|): near 1.0 whenever
        # the smaller doc's grams are a subset of the larger's — the
        # quote-expansion / boilerplate-wrapping duplicates whose
        # Jaccard is diluted by the size imbalance
        denom = F.least(F.col("la"), F.col("lb"))
    else:
        raise ValueError(f"unknown metric {metric!r}")
    return (
        inter.join(la, ["block", "doc_id_a"])
        .join(lb, ["block", "doc_id_b"])
        .select(
            "block",
            "doc_id_a",
            "doc_id_b",
            (F.col("i").cast("double") / denom).alias(metric),
        )
        .filter(F.col(metric) >= threshold)
    )


def banded_hamming_pairs(
    hashes: DataFrame,
    hash_col: str = "phash",
    id_col: str = "doc_id",
    bits_per_band: int = 16,
    n_bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Banded Hamming-neighbor pairs over ANY 64-bit-or-narrower hash
    relation — the Manku banding scheme ``simhash_pairs`` uses,
    factored so other fingerprint families (the perceptual image hash,
    operators/multimodal.py:phash_media) reuse it: a pair within
    ``max_hamming`` ≤ n_bands−1 differs in at most n_bands−1 bit
    positions, so by pigeonhole at least one of the ``n_bands``
    disjoint bands matches exactly — candidates come from equality
    self-joins on (band, value), never an all-pairs Hamming scan, and
    each candidate is verified EXACTLY (bit_count of the xor).

    Scale shape: identical to ``simhash_pairs`` — one band-exploded
    self-join keyed on n_bands × 2^bits_per_band buckets (8 bytes of
    hash per row regardless of the hashed payload), hot buckets AQE-
    splittable. Output: (``id_col``_a, ``id_col``_b, hamming), each
    pair exactly once."""
    if not 0 <= max_hamming <= n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming}: the {n_bands}-band scheme "
            f"guarantees recall only for hamming <= {n_bands - 1} "
            "(pigeonhole)"
        )
    mask = (1 << bits_per_band) - 1
    bands = hashes.select(
        F.col(id_col).alias("_id"),
        F.col(hash_col).alias("_h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col(hash_col), bits_per_band * i)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("_id", "_h", "b.band", "b.val")
    # pinned shuffle join — see ngram_jaccard_pairs (r15); hash, not
    # merge: band keys are fixed-width ints, the sort buys nothing
    other = bands.hint("shuffle_hash").select(
        F.col("band").alias("band2"),
        F.col("val").alias("val2"),
        F.col("_id").alias("_id_b"),
        F.col("_h").alias("_h_b"),
    )
    cand = (
        bands.join(
            other,
            (F.col("band") == F.col("band2"))
            & (F.col("val") == F.col("val2"))
            & (F.col("_id") < F.col("_id_b")),
        )
        .select(
            F.col("_id").alias("_id_a"), "_id_b", "_h", "_h_b"
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("_h").bitwiseXOR(F.col("_h_b"))).cast(
        "long"
    )
    return cand.select(
        F.col("_id_a").alias(f"{id_col}_a"),
        F.col("_id_b").alias(f"{id_col}_b"),
        hamming.alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def phash_probe_pairs(
    spark,
    path: str,
    new_hashes: DataFrame,
    max_hamming: int = 3,
) -> DataFrame:
    """Incremental multimodal near-duplicate screening against the
    persisted fingerprint index
    (sources/catalog.py:write_phash_index) — the ingest-time question
    "is this new image batch already in the corpus?" answered without
    re-hashing or re-scanning indexed media: the batch's bands are
    computed JVM-side with the layout's recorded params, the batch's
    vbucket list is collected driver-side (≤ n_buckets values,
    config-scale) so the bucket predicate reaches the bands scan as a
    static PartitionFilter, candidates come from the (band, val)
    equality join, and every candidate is verified EXACTLY
    (bit_count of the xor — same contract as
    ``banded_hamming_pairs``, whose pigeonhole recall bound applies
    verbatim). Output: (doc_id, probe_id, hamming) — indexed id ×
    batch id, each pair once; batch members colliding with themselves
    (same id already indexed) are excluded.

    Scale shape: the scan reads only the batch's bucket partitions of
    8-byte hashes; the join is keyed on n_bands × 2^bits_per_band
    buckets; everything after the scan is batch-sized."""
    from ..sources.catalog import _phash_bands, read_phash_index

    bands_idx, meta = read_phash_index(spark, path)
    probe_bands = _phash_bands(
        new_hashes.select(
            F.col("doc_id").alias("probe_id"), "phash"
        ).withColumnRenamed("probe_id", "doc_id"),
        meta["bits_per_band"],
        meta["n_bands"],
        meta["n_buckets"],
    ).select(
        F.col("doc_id").alias("probe_id"),
        F.col("phash").alias("probe_phash"),
        F.col("band").alias("pband"),
        F.col("val").alias("pval"),
        "vbucket",
    )
    vbuckets = [
        r.vbucket for r in probe_bands.select("vbucket").distinct().collect()
    ]
    cand = (
        bands_idx.filter(F.col("vbucket").isin(vbuckets))
        .join(
            probe_bands.drop("vbucket"),
            (F.col("band") == F.col("pband"))
            & (F.col("val") == F.col("pval"))
            & (F.col("doc_id") != F.col("probe_id")),
        )
        .select("doc_id", "probe_id", "phash", "probe_phash")
        .distinct()
    )
    hamming = F.bit_count(
        F.col("phash").bitwiseXOR(F.col("probe_phash"))
    ).cast("long")
    return cand.select(
        "doc_id", "probe_id", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


# --------------------------------------------------------- sorted neighborhood


def sorted_neighborhood_candidates(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    *,
    window: int = 5,
    key_chars: int = 24,
    reverse_key: bool = False,
    materialize: bool = True,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD 1995):
    rank docs inside each block by an engine-stable sort key (the raw
    ``key_chars``-char text prefix — or the REVERSED text's prefix
    when ``reverse_key``, i.e. suffix-aligned ordering for the
    multi-pass variant), id tiebreak, then pair every doc
    with its next ``window`` neighbours in sort order. Candidate count
    is EXACTLY ``n_docs * window`` minus block tails — linear, the
    whole point of SNM versus the quadratic all-pairs inside a block —
    and the pairing is a pure equi-join: each row re-emits itself at
    ranks ``rk+1 .. rk+window`` (one ``explode`` over a
    constant-length array, map-side) and joins back on
    ``(block, rank)``. No range join, no self-join inequality, no
    per-pair shuffle beyond the one rank equi-join.

    Scale shape: the rank is a ``row_number`` windowed BY BLOCK — one
    hash shuffle on the block key plus an in-partition sort, never a
    global window. At 100 TB a skewed block is split by promoting more
    sort-key prefix into the block key (the classic multi-pass SNM
    device, same as the LSH band trick) — the candidate semantics
    degrade gracefully because neighbours still sort adjacently within
    the refined blocks. ASCII-binary string comparison orders
    identically in Spark and DuckDB (both compare codepoints /
    UTF-8 bytes — equal over the corpus's ASCII domain), which is what
    makes the rank, and therefore the candidate set, hash-exact.

    Returns (block, doc_id_a, doc_id_b, rank_gap, text_a, text_b)
    where ``doc_id_a`` is the LOWER-RANKED doc (sort order, not id
    order) and ``rank_gap`` in ``1..window``.
    """
    from pyspark.sql.window import Window

    key_src = (
        F.reverse(F.col(text_col)) if reverse_key else F.col(text_col)
    )
    # checkpointed by default: both join sides read the ranked
    # relation — without it the corpus scan AND the block sort run
    # once per side (plan-audited: 2 scans / 2 windows -> 1 each).
    # materialize=False keeps the lineage visible for plan pins.
    ranked = docs.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.substring(key_src, 1, key_chars).alias("snm_key"),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("block").orderBy("snm_key", "doc_id")
        ),
    )
    if materialize:
        ranked = ranked.localCheckpoint()
    left = ranked.select(
        "block",
        F.col("doc_id").alias("doc_id_a"),
        F.col("text").alias("text_a"),
        F.col("rk").alias("rk_a"),
        F.explode(
            F.array(*[F.col("rk") + F.lit(j) for j in range(1, window + 1)])
        ).alias("rk"),
    )
    right = ranked.select(
        "block",
        F.col("doc_id").alias("doc_id_b"),
        F.col("text").alias("text_b"),
        "rk",
    )
    # r16: pinned shuffle-hash — right is the corpus-sized ranked
    # relation (broadcast is the forbidden 100 TB shape, and it
    # serialized the downstream verify locally; see the verify joins)
    return left.join(right.hint("shuffle_hash"), ["block", "rk"]).select(
        "block",
        "doc_id_a",
        "doc_id_b",
        (F.col("rk") - F.col("rk_a")).cast("long").alias("rank_gap"),
        "text_a",
        "text_b",
    )


def sorted_neighborhood_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    *,
    window: int = 5,
    key_chars: int = 24,
    n: int = 2,
    threshold: float = 0.05,
) -> DataFrame:
    """SNM candidates verified by exact n-gram Jaccard. The verify is
    per-candidate array-intersect over the pair's shingle sets —
    affordable precisely because SNM caps candidates at
    ``n_docs * window`` (contrast ``ngram_jaccard_pairs``, whose
    posting-list join must bound the quadratic blow-up itself).
    Shingle sets are computed ONCE PER DOC and joined onto the
    candidates by id (r15 — the multipass verify's shape; inlining
    ``shingles(text_a)`` into the candidate projection tokenized every
    doc once per candidate it appears in, ~2·window× the work for
    identical arrays). Output
    (block, doc_id_a, doc_id_b, rank_gap, jaccard), unordered."""
    cand = sorted_neighborhood_candidates(
        docs,
        id_col,
        text_col,
        block_col,
        window=window,
        key_chars=key_chars,
    ).select("block", "doc_id_a", "doc_id_b", "rank_gap")
    t = docs.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("doc_id"),
        shingles(F.col(text_col), n).alias("sh"),
    )
    a = t.select(
        "block", F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sh_a")
    )
    b = t.select(
        "block", F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sh_b")
    )
    # r16: pinned shuffle-hash — the shingle relation is corpus-derived
    # (broadcast is the forbidden 100 TB shape; see the hot-mark joins)
    ver = cand.join(a.hint("shuffle_hash"), ["block", "doc_id_a"]).join(
        b.hint("shuffle_hash"), ["block", "doc_id_b"]
    )
    i = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    la = F.size("sh_a").cast("long")
    lb = F.size("sh_b").cast("long")
    jac = i.cast("double") / (la + lb - i)
    return ver.select(
        "block",
        "doc_id_a",
        "doc_id_b",
        "rank_gap",
        jac.alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def sorted_neighborhood_edit_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    *,
    window: int = 5,
    key_chars: int = 24,
    max_distance: int = 48,
) -> DataFrame:
    """SNM candidates verified by exact Levenshtein distance — the
    fuzzy-match half of the record-linkage pairing SNM was invented
    for. Edit distance is the right verify when duplicates are
    CHARACTER-level corruptions (OCR noise, typos, truncations) that
    token-set Jaccard under-scores; ``F.levenshtein`` is JVM-side
    (no Python) and exact-integer on both engines (verified parity
    incl. empty/transposition edges), so the row is hash-stable.

    Two provably-lossless cost cuts keep the most expensive verify in
    the family affordable (17.7 s → 1.5 s at sf0.1, SCALE.md):
    (1) a LENGTH-GAP prefilter — ``|len(a) - len(b)| > k`` lower-
    bounds the distance, so those candidates can't pass and the DP
    never runs; (2) Spark's THRESHOLDED ``levenshtein(a, b, k)`` —
    the banded O(len·k) DP that abandons a pair once the band minimum
    exceeds k, returning -1 (filtered) instead of finishing the
    O(len²) table. Within the threshold the banded DP is exact, so
    results are bit-identical to the unbounded form the DuckDB oracle
    runs. Output
    (block, doc_id_a, doc_id_b, rank_gap, edit_distance), unordered."""
    cand = sorted_neighborhood_candidates(
        docs,
        id_col,
        text_col,
        block_col,
        window=window,
        key_chars=key_chars,
    ).filter(
        F.abs(F.length("text_a") - F.length("text_b")) <= max_distance
    )
    return cand.select(
        "block",
        "doc_id_a",
        "doc_id_b",
        "rank_gap",
        F.levenshtein("text_a", "text_b", max_distance)
        .cast("long")
        .alias("edit_distance"),
    ).filter(F.col("edit_distance") >= 0)


def fingerprint_set_jaccard_pairs(
    posts: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "fingerprint",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard over ANY (id, fingerprint) posting relation — the
    modality-agnostic tail of the posting-list similarity join
    (``ngram_jaccard_pairs`` with the shingle front half factored
    away): distinct postings, self-join on the fingerprint, shared
    count per pair, set sizes rejoined, one final integer division.
    Callers bring whatever fingerprint a modality defines — sampled
    video-frame hashes, winnowed text fingerprints, audio chunk
    hashes — and inherit the same scale shape: shuffles key on the
    fingerprint and on the pair, fan-out is Σ_f df(f)² bounded by
    fingerprint document frequency (a ubiquitous fingerprint is the
    stop-gram regime — cap upstream if a modality can produce one).
    Returns (id_a, id_b, shared, size_a, size_b, jaccard) with
    id_a < id_b, unordered."""
    # checkpointed: the distinct posting relation feeds sizes AND both
    # self-join sides — without it the caller's (potentially Arrow-
    # batched) fingerprint lineage re-executes three times
    # (plan-audited on the video query: 12 scans -> 4)
    p = (
        posts.select(
            F.col(id_col).alias("id"), F.col(fp_col).alias("fp")
        )
        .distinct()
        .localCheckpoint()
    )
    sizes = p.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = p.alias("a")
    # pinned shuffle join — see ngram_jaccard_pairs (r15)
    b = p.hint("shuffle_merge").alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("size_b"))
    jac = F.col("shared").cast("double") / (
        F.col("size_a") + F.col("size_b") - F.col("shared")
    )
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.col("id_a").alias(f"{id_col}_a"),
            F.col("id_b").alias(f"{id_col}_b"),
            F.col("shared").cast("long").alias("shared"),
            F.col("size_a").cast("long").alias("size_a"),
            F.col("size_b").cast("long").alias("size_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def sorted_neighborhood_multipass_candidates(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    *,
    window: int = 5,
    key_chars: int = 24,
) -> DataFrame:
    """The union-distinct candidate relation of the two SNM passes
    (prefix and reversed-prefix sort keys), id-normalized to
    doc_id_a < doc_id_b — shared by the multipass Jaccard verify and
    the record-linkage match scorer. (block, doc_id_a, doc_id_b)."""
    ids = []
    for rev in (False, True):
        ids.append(
            sorted_neighborhood_candidates(
                docs,
                id_col,
                text_col,
                block_col,
                window=window,
                key_chars=key_chars,
                reverse_key=rev,
            ).select(
                "block",
                F.least("doc_id_a", "doc_id_b").alias("doc_id_a"),
                F.greatest("doc_id_a", "doc_id_b").alias("doc_id_b"),
            )
        )
    return ids[0].unionByName(ids[1]).distinct()


def sorted_neighborhood_multipass_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    *,
    window: int = 5,
    key_chars: int = 24,
    n: int = 2,
    threshold: float = 0.05,
) -> DataFrame:
    """MULTI-PASS sorted neighborhood — the form Hernández & Stolfo
    actually recommend: several cheap passes under DIFFERENT sort
    keys, candidate sets unioned, one verify. A single sort key has a
    blind spot by construction (a corrupted or missing first token
    teleports a record across the sort order); the second pass here
    sorts by the REVERSED text's prefix, so suffix-aligned near-dups
    that pass 1 separates become adjacent in pass 2. Union-distinct
    over id-normalized pairs keeps the verify exactly-once per pair;
    total candidates stay ≤ 2·n·window — two linear passes are far
    cheaper than one pass with a 2× window, because a doubled window
    pays everywhere while the second key pays only where it adds NEW
    adjacency. Both reverses are engine-stable over the corpus's
    ASCII domain (DuckDB reverses by grapheme, Spark by codepoint —
    identical on ASCII). Returns (block, doc_id_a, doc_id_b, jaccard)
    with doc_id_a < doc_id_b (id order — rank gaps are per-pass and
    dropped at the union), unordered."""
    cand = sorted_neighborhood_multipass_candidates(
        docs, id_col, text_col, block_col,
        window=window, key_chars=key_chars,
    )
    t = docs.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("doc_id"),
        shingles(F.col(text_col), n).alias("sh"),
    )
    a = t.select(
        "block", F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sh_a")
    )
    b = t.select(
        "block", F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sh_b")
    )
    # r16: pinned shuffle-hash — the shingle relation is corpus-derived
    # (broadcast is the forbidden 100 TB shape; see the hot-mark joins)
    ver = cand.join(a.hint("shuffle_hash"), ["block", "doc_id_a"]).join(
        b.hint("shuffle_hash"), ["block", "doc_id_b"]
    )
    i = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    la = F.size("sh_a").cast("long")
    lb = F.size("sh_b").cast("long")
    jac = i.cast("double") / (la + lb - i)
    return ver.select(
        "block", "doc_id_a", "doc_id_b", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def match_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    *,
    window: int = 5,
    key_chars: int = 24,
    n: int = 2,
    match_threshold_ppm: int = 500_000,
    edit_scale: int = 64,
) -> DataFrame:
    """Record-linkage match scoring (the Fellegi-Sunter decision
    shape): multipass-SNM candidates scored on two INDEPENDENT
    evidence channels — token-set overlap (bigram Jaccard, the
    reordering-robust channel) and character identity (Levenshtein
    similarity, the corruption-robust channel) — then averaged into
    one match score with an explicit decision bit. One channel alone
    misclassifies the other's failure mode: token Jaccard forgives a
    full word-order shuffle that edit distance flags, edit similarity
    forgives the single-char typo storm that shreds bigrams; a
    linkage DECISION (unlike a similarity RELATION) has to look at
    both before it fires.

    Entirely integer arithmetic — ppm Jaccard via integral division,
    edit similarity fading LINEARLY from 1e6 at zero edits to 0 at
    ``edit_scale`` edits (``greatest(0, 1e6 - (1e6·lev) div K)``),
    score as the integer mean — so every column is hash-exact with no
    float anywhere (stricter than the pair relations, whose single
    final division is a double). The fade-to-zero design is also the
    PERFORMANCE design: beyond K edits the channel contributes
    nothing, so the distance runs as Spark's THRESHOLDED banded DP
    (O(len·K), early-abandoning; -1 beyond K scores 0 — continuous at
    the boundary, no cliff) behind a length-gap short-circuit —
    measured 38.7 s → 8.9 s at sf0.1 (SCALE.md) versus the unbounded
    O(len²) table. Returns (block, doc_id_a, doc_id_b, jaccard_ppm,
    edit_sim_ppm, score_ppm, is_match), one row per candidate pair,
    unordered."""
    cand = sorted_neighborhood_multipass_candidates(
        docs, id_col, text_col, block_col,
        window=window, key_chars=key_chars,
    )
    # checkpointed: both join sides (a and b) derive from this relation,
    # so without it the corpus tokenize+shingle runs once PER SIDE
    # (r12 VERDICT "What's wrong #2") — materialize the per-doc shingle
    # sets once and let the pair join read them twice
    t = docs.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        shingles(F.col(text_col), n).alias("sh"),
    ).localCheckpoint()
    a = t.select(
        "block", F.col("doc_id").alias("doc_id_a"),
        F.col("text").alias("text_a"), F.col("sh").alias("sh_a"),
    )
    b = t.select(
        "block", F.col("doc_id").alias("doc_id_b"),
        F.col("text").alias("text_b"), F.col("sh").alias("sh_b"),
    )
    # r16: pinned shuffle-hash — see sorted_neighborhood verify joins
    j = cand.join(a.hint("shuffle_hash"), ["block", "doc_id_a"]).join(
        b.hint("shuffle_hash"), ["block", "doc_id_b"]
    )
    i = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    la = F.size("sh_a").cast("long")
    lb = F.size("sh_b").cast("long")
    union = la + lb - i
    scored = j.select(
        "block",
        "doc_id_a",
        "doc_id_b",
        F.when(union > 0, (F.lit(1000000).cast("long") * i).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias("_num"),
        union.alias("_den"),
        F.when(
            F.abs(F.length("text_a") - F.length("text_b")) > edit_scale,
            F.lit(-1),
        )
        .otherwise(F.levenshtein("text_a", "text_b", edit_scale))
        .cast("long")
        .alias("_lev"),
    ).select(
        "block",
        "doc_id_a",
        "doc_id_b",
        # union == 0 means BOTH bigram sets are empty — the token
        # channel has NO EVIDENCE, which must score 0, not 1e6: two
        # unrelated single-token docs are not a match, and "both
        # trivially empty" must not single-handedly clear the decision
        # threshold (review finding; identical short docs still match
        # through the edit channel alone)
        F.when(F.col("_den") > 0, F.expr("_num div _den"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("jaccard_ppm"),
        F.when(
            F.col("_lev") >= 0,
            F.greatest(
                F.lit(0).cast("long"),
                F.lit(1000000)
                - F.expr(f"(1000000L * _lev) div {edit_scale}"),
            ),
        )
        .otherwise(F.lit(0).cast("long"))
        .cast("long")
        .alias("edit_sim_ppm"),
    )
    score = F.expr("(jaccard_ppm + edit_sim_ppm) div 2")
    return scored.select(
        "block",
        "doc_id_a",
        "doc_id_b",
        "jaccard_ppm",
        "edit_sim_ppm",
        score.cast("long").alias("score_ppm"),
        (score >= match_threshold_ppm).alias("is_match"),
    )


def fingerprint_set_jaccard_pairs_capped(
    posts: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "fingerprint",
    threshold: float = 0.5,
    max_doc_freq: int = 50,
) -> DataFrame:
    """``fingerprint_set_jaccard_pairs`` with the stop-FINGERPRINT cap
    (the stop-gram device on media postings): a fingerprint whose
    document frequency exceeds ``max_doc_freq`` generates NO
    candidates — for media this is the black frame, the network-logo
    intro, the silence chunk: one ubiquitous frame shared by half the
    corpus makes the uncapped posting self-join quadratic in the
    corpus (df² candidate rows), and its presence carries no near-dup
    evidence. Every found pair is still scored EXACTLY: cold
    collisions count in the pair aggregate, hot fingerprints rejoin
    as SMALL per-doc sorted arrays (≤ the corpus's ubiquitous-frame
    vocabulary) whose pairwise intersection tops the shared count
    back up, and sizes come from the FULL posting relation — so
    jaccard values are never approximated, a pair is missed only if
    every frame it shares is ubiquitous (precisely the pairs whose
    similarity rides on boilerplate media). Candidate volume is
    bounded by Σ_{{df≤cap}} df² ≤ cap × posting volume — linear at
    fixed cap regardless of skew (measured flat in
    ``tools/bench_frame_skew.py`` as a planted ubiquitous frame's df
    grows 4×). Returns the same (id_a, id_b, shared, size_a, size_b,
    jaccard) schema as the uncapped form."""
    p = (
        posts.select(
            F.col(id_col).alias("id"), F.col(fp_col).alias("fp")
        )
        .distinct()
        .localCheckpoint()
    )
    df_rel = p.groupBy("fp").agg(F.count(F.lit(1)).alias("_df"))
    hot = df_rel.filter(F.col("_df") > max_doc_freq).select("fp")
    # ONE hot-marking join + ONE per-doc aggregate (r15 — see
    # ngram_jaccard_pairs_capped). r16 (ADVICE medium): forced
    # broadcast → pinned shuffle_hash (hot grows with the corpus;
    # measured at parity-or-better locally, graceful at scale).
    pf = p.join(
        hot.withColumn("_hot", F.lit(True)).hint("shuffle_hash"), "fp", "left"
    )
    cold = pf.filter(F.col("_hot").isNull()).drop("_hot")
    per_doc = pf.groupBy("id").agg(
        F.count(F.lit(1)).alias("sz"),
        F.sort_array(
            F.collect_list(F.when(F.col("_hot"), F.col("fp")))
        ).alias("hf"),
    )
    a = cold.alias("a")
    # pinned shuffle join — see ngram_jaccard_pairs (r15). Stays
    # shuffle_merge (r16 A/B: hash was FLAT here — 4.12 vs 3.98 /
    # 3.07 vs 3.19 — unlike the uncapped posting join; SMJ spills
    # gracefully at scale so the default keeps the safer strategy)
    b = cold.hint("shuffle_merge").alias("b")
    i_cold = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("ic"))
    )
    # empty-array literal typed from the POSTING relation's actual
    # fingerprint type (ADVICE r13): the function is modality-agnostic
    # over any (id, fingerprint) relation, so a bigint-hash caller
    # must get array<bigint> here, not a hardcoded array<string> that
    # fails analysis in coalesce/array_intersect
    from pyspark.sql.types import ArrayType

    empty = F.array().cast(ArrayType(p.schema["fp"].dataType))
    pa = per_doc.select(
        F.col("id").alias("id_a"),
        F.col("sz").alias("size_a"),
        F.col("hf").alias("hf_a"),
    )
    pb = per_doc.select(
        F.col("id").alias("id_b"),
        F.col("sz").alias("size_b"),
        F.col("hf").alias("hf_b"),
    )
    inter = F.col("ic") + F.size(
        F.array_intersect(F.coalesce("hf_a", empty), F.coalesce("hf_b", empty))
    )
    jac = inter.cast("double") / (
        F.col("size_a") + F.col("size_b") - inter
    )
    return (
        i_cold.join(pa, "id_a")
        .join(pb, "id_b")
        .select(
            F.col("id_a").alias(f"{id_col}_a"),
            F.col("id_b").alias(f"{id_col}_b"),
            inter.cast("long").alias("shared"),
            F.col("size_a").cast("long").alias("size_a"),
            F.col("size_b").cast("long").alias("size_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def weighted_jaccard_pairs_capped(
    w: DataFrame,
    threshold: float = 0.5,
    max_doc_freq: int = 100,
    block_col: str = "block",
    id_col: str = "doc_id",
    term_col: str = "term",
    w_col: str = "w",
) -> DataFrame:
    """Weighted (Ruzicka) Jaccard pairs over a per-doc term-weight
    relation ``(block, doc_id, term, w)`` with the stop-TERM cap — the
    fingerprint cap's device applied to WEIGHTED overlap. The uncapped
    shared-term self-join fans out Σ_t df_block(t)² per block, which a
    realistic Zipf head makes quadratic in block size (measured: 22×
    time at 10× docs in ``tools/bench_sf1_pairs.py`` — the superlinear
    surprise the sf1 spot-check exists to catch); here a term whose
    per-block document frequency exceeds ``max_doc_freq`` generates NO
    candidates, but every found pair is still scored EXACTLY: hot
    terms rejoin as small per-doc (term → w) maps (bounded by the
    block's hot vocabulary — the Zipf HEAD, tiny by definition) and
    ``map_zip_with`` adds their Σ min back, totals come from the full
    weight relation, so wjaccard is never approximated. A pair is
    missed only if every term it shares is ubiquitous in its block —
    precisely the stopword-only matches idf down-weights anyway.
    Candidate volume ≤ cap × posting volume, linear at fixed cap.
    Input contract: one row per (block, doc_id, term) — an upstream tf
    groupBy guarantees it (duplicates would corrupt sums AND collide
    in the hot maps). Returns (block, doc_id_a, doc_id_b,
    wjaccard ≥ threshold)."""
    p = w.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("doc_id"),
        F.col(term_col).alias("term"),
        F.col(w_col).alias("w"),
    ).localCheckpoint()
    df_rel = p.groupBy("block", "term").agg(F.count(F.lit(1)).alias("_df"))
    hot = df_rel.filter(F.col("_df") > max_doc_freq).select("block", "term")
    # ONE hot-marking join feeds both the cold candidate side and the
    # per-doc aggregate (r15 — was a left_anti plus an inner join over
    # the same posting relation), and the per-doc totals and hot maps
    # ride ONE groupBy instead of two (collect_list skips the
    # null-for-cold entries, so hm holds exactly the hot terms; a doc
    # with no hot terms gets an empty map — the same Σ min the old
    # null-then-coalesce path produced)
    # r16 (ADVICE medium): forced broadcast → pinned shuffle_hash —
    # see ngram_jaccard_pairs_capped
    pf = p.join(
        hot.withColumn("_hot", F.lit(True)).hint("shuffle_hash"),
        ["block", "term"],
        "left",
    )
    cold = pf.filter(F.col("_hot").isNull()).drop("_hot")
    per_doc = pf.groupBy("block", "doc_id").agg(
        F.sum("w").alias("s"),
        F.map_from_entries(
            F.sort_array(
                F.collect_list(
                    F.when(F.col("_hot"), F.struct("term", "w"))
                )
            )
        ).alias("hm"),
    )
    a = cold.select(
        "block", F.col("doc_id").alias("doc_id_a"), "term",
        F.col("w").alias("wa"),
    )
    # pinned shuffle join — see ngram_jaccard_pairs (r15)
    b = cold.hint("shuffle_merge").select(
        "block", F.col("doc_id").alias("doc_id_b"), "term",
        F.col("w").alias("wb"),
    )
    smin_cold = (
        a.join(b, ["block", "term"])
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("block", "doc_id_a", "doc_id_b")
        .agg(F.sum(F.least("wa", "wb")).alias("_smin_cold"))
    )
    # empty-map literal typed from the relation's actual term/weight
    # types (the fingerprint cap's ADVICE r13 lesson — a hardcoded
    # struct<string,long> fails analysis for non-string terms)
    from pyspark.sql.types import ArrayType, StructField, StructType

    t_term = p.schema["term"].dataType
    t_w = p.schema["w"].dataType
    empty_map = F.map_from_entries(
        F.array().cast(
            ArrayType(
                StructType(
                    [StructField("term", t_term), StructField("w", t_w)]
                )
            )
        )
    )
    pa = per_doc.select(
        "block",
        F.col("doc_id").alias("doc_id_a"),
        F.col("s").alias("s_a"),
        F.col("hm").alias("hm_a"),
    )
    pb = per_doc.select(
        "block",
        F.col("doc_id").alias("doc_id_b"),
        F.col("s").alias("s_b"),
        F.col("hm").alias("hm_b"),
    )
    # Σ min over hot terms: map_zip_with unions keys — a key on ONE
    # side must contribute 0, and Spark's least() IGNORES nulls, so
    # the both-sides guard is explicit
    hot_min = F.aggregate(
        F.map_values(
            F.map_zip_with(
                F.coalesce("hm_a", empty_map),
                F.coalesce("hm_b", empty_map),
                lambda _k, x, y: F.when(
                    x.isNotNull() & y.isNotNull(), F.least(x, y)
                ).otherwise(F.lit(0).cast(t_w)),
            )
        ),
        F.lit(0).cast(t_w),
        lambda acc, v: acc + v,
    )
    smin = F.col("_smin_cold") + hot_min
    wj = smin.cast("double") / (F.col("s_a") + F.col("s_b") - smin)
    return (
        smin_cold.join(pa, ["block", "doc_id_a"])
        .join(pb, ["block", "doc_id_b"])
        .select(
            "block", "doc_id_a", "doc_id_b", wj.alias("wjaccard")
        )
        .filter(F.col("wjaccard") >= threshold)
    )


def fingerprint_cap_report(
    posts: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "fingerprint",
    max_doc_freq: int = 50,
) -> DataFrame:
    """Accounting row for the stop-fingerprint cap — the same honesty
    contract as the stop-vertex cap's ``hub_cap_report``
    (operators/graph.py): a bound that silently drops candidate
    evidence must REPORT what it dropped (ADVICE r13).
    ``fingerprint_set_jaccard_pairs_capped`` misses a pair only when
    every fingerprint it shares is hot (df > max_doc_freq); this one
    row quantifies that blind spot on a given corpus:
    (n_fingerprints, n_postings, n_hot_fingerprints = fingerprints
    over the cap, hot_posting_volume = postings removed from the
    candidate join, candidates_avoided = Σ_{df>cap} C(df, 2) — the
    pair-candidate rows the cap removed). All integer aggregates off
    the fingerprint-sized df relation; one groupBy, no join."""
    p = (
        posts.select(
            F.col(id_col).alias("id"), F.col(fp_col).alias("fp")
        )
        .distinct()
    )
    df_rel = p.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
    return df_rel.agg(
        F.count(F.lit(1)).cast("long").alias("n_fingerprints"),
        F.coalesce(F.sum("df"), F.lit(0)).cast("long").alias("n_postings"),
        F.coalesce(
            F.sum(F.when(F.col("df") > max_doc_freq, 1).otherwise(0)),
            F.lit(0),
        ).cast("long").alias("n_hot_fingerprints"),
        F.coalesce(
            F.sum(
                F.when(F.col("df") > max_doc_freq, F.col("df")).otherwise(
                    F.lit(0).cast("long")
                )
            ),
            F.lit(0),
        ).cast("long").alias("hot_posting_volume"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("df") > max_doc_freq,
                    F.expr("df * (df - 1) div 2"),
                ).otherwise(F.lit(0).cast("long"))
            ),
            F.lit(0),
        ).cast("long").alias("candidates_avoided"),
    )


def fingerprint_containment_pairs(
    corpus_posts: DataFrame,
    probe_posts: DataFrame,
    corpus_id: str = "doc_id",
    probe_id: str = "probe_id",
    fp_col: str = "fp",
    threshold: float = 1.0,
) -> DataFrame:
    """Cross-modality containment over two posting relations — "is
    this image a frame OF an indexed video?" generalized: the corpus
    side is any (id, fingerprint) set relation (sampled video frames,
    audio chunks), the probe side another (a single image fingerprint
    is a 1-element set; a clip is a few), and a probe is CONTAINED
    when shared/|probe| clears the threshold (default 1.0 — every
    probe fingerprint present). The asymmetric sibling of
    ``fingerprint_set_jaccard_pairs``: same posting equi-join, same
    Σ df(fp)·df_probe(fp) bound keyed on the fingerprint, but the
    denominator is the PROBE size, so a one-frame image inside a
    four-frame video scores 1.0 instead of a diluted 1/4 Jaccard.
    Returns (corpus_id, probe_id, shared, size_a, size_b,
    containment), unordered; size_a is the corpus doc's set size
    (evidence for how big the containing video is)."""
    cp = (
        corpus_posts.select(
            F.col(corpus_id).alias("cid"), F.col(fp_col).alias("fp")
        )
        .distinct()
        .localCheckpoint()
    )
    pp = (
        probe_posts.select(
            F.col(probe_id).alias("pid"), F.col(fp_col).alias("fp")
        )
        .distinct()
        .localCheckpoint()
    )
    sa = cp.groupBy("cid").agg(F.count(F.lit(1)).alias("size_a"))
    sb = pp.groupBy("pid").agg(F.count(F.lit(1)).alias("size_b"))
    shared = (
        cp.join(pp, "fp")
        .groupBy("cid", "pid")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    cont = F.col("shared").cast("double") / F.col("size_b")
    return (
        shared.join(sa, "cid")
        .join(sb, "pid")
        .select(
            F.col("cid").alias(corpus_id),
            F.col("pid").alias(probe_id),
            F.col("shared").cast("long").alias("shared"),
            F.col("size_a").cast("long").alias("size_a"),
            F.col("size_b").cast("long").alias("size_b"),
            cont.alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def frame_probe_pairs(
    spark,
    index_path: str,
    probe_frames: DataFrame,
    threshold: float = 0.5,
    metric: str = "jaccard",
) -> DataFrame:
    """Screen a NEW media batch against the persisted frame-
    fingerprint index (sources/catalog.py:write_frame_index): the
    probe batch's (probe_id, frame_md5) rows become a distinct
    posting set, the index ``posts`` table is pruned to ONLY the
    batch's fingerprint buckets (static isin over the collected
    bucket list — config-scale, ≤ n_buckets values — so the scan
    shows PartitionFilters instead of touching the corpus), and the
    survivors run the same exact-Jaccard tail as
    ``fingerprint_set_jaccard_pairs``: shared counts per (corpus,
    probe) pair, sizes joined from the layout's per-doc ``sizes``
    table (corpus side — never recomputed from postings) and from
    the batch itself. Probe ≡ the in-query cross-pair sweep
    row-for-row (pinned). ``metric="jaccard"`` (default) scores
    shared/(|a|+|b|−shared) — the near-dup symmetric question;
    ``metric="containment"`` scores shared/|probe| (the
    ``fingerprint_containment_pairs`` semantics) — "is this
    image/clip contained in an indexed video?", where a one-frame
    probe fully present scores 1.0 regardless of the video's length.
    Returns (doc_id, probe_id, shared, size_a, size_b,
    jaccard|containment ≥ threshold), unordered."""
    from ..sources.catalog import read_frame_index

    if metric not in ("jaccard", "containment"):
        raise ValueError(f"unknown metric {metric!r}")

    posts, sizes, meta = read_frame_index(spark, index_path)
    n_buckets = meta["n_buckets"]
    p = (
        probe_frames.select(
            F.col("doc_id").alias("probe_id"),
            F.col("frame_md5").alias("fp"),
        )
        .distinct()
        .localCheckpoint()
    )
    p = p.withColumn(
        "fbucket",
        (
            F.conv(F.substring("fp", 1, 8), 16, 10).cast("long")
            % n_buckets
        ).cast("int"),
    )
    psizes = p.groupBy("probe_id").agg(F.count(F.lit(1)).alias("size_b"))
    buckets = [r.fbucket for r in p.select("fbucket").distinct().collect()]
    cand = posts.filter(F.col("fbucket").isin(buckets)).join(
        p.select("probe_id", "fp", "fbucket"), ["fbucket", "fp"]
    )
    shared = cand.groupBy("doc_id", "probe_id").agg(
        F.count(F.lit(1)).alias("shared")
    )
    if metric == "containment":
        score = F.col("shared").cast("double") / F.col("size_b")
        score_name = "containment"
    else:
        score = F.col("shared").cast("double") / (
            F.col("size_a") + F.col("size_b") - F.col("shared")
        )
        score_name = "jaccard"
    out = (
        shared.join(
            sizes.select("doc_id", F.col("sz").alias("size_a")), "doc_id"
        )
        .join(psizes, "probe_id")
        .select(
            "doc_id",
            "probe_id",
            F.col("shared").cast("long").alias("shared"),
            F.col("size_a").cast("long").alias("size_a"),
            F.col("size_b").cast("long").alias("size_b"),
            score.alias(score_name),
        )
        .filter(F.col(score_name) >= threshold)
    )
    return out
