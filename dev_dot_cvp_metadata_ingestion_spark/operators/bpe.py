"""Byte-pair-encoding vocabulary induction — tokenizer TRAINING as a
sequence of declarative Spark rounds (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units", public ACL).

The 100 TB shape: ONE corpus-scale aggregation reduces the corpus to
the (word, freq) vocabulary relation — everything after runs on that
vocabulary table, which is millions of rows at web scale, not
petabytes. Each merge round is pure DataFrame algebra:

* pair counts: ``arrays_zip`` of two shifted slices of the symbol
  array (regular codegen expression, no lambda), exploded and
  freq-weighted into one partial-aggregated shuffle;
* the winning pair: ``orderBy(count desc, left, right).limit(1)`` —
  a TakeOrderedAndProject, broadcast back as a 1-row relation; the
  driver never collects it (the merge is applied by comparing against
  the broadcast columns, so the whole k-round training is one lazy
  plan, checkpointed per round to truncate lineage);
* the merge itself: a left-fold over each word's symbols that joins
  an adjacent (left, right) occurrence into one symbol — BPE's
  leftmost-first, non-overlapping semantics exactly (after a merge
  the joined symbol is the fold accumulator's tail, so ``aaa`` under
  pair (a,a) gives [aa, a], not [aa, aa]).

Ties on the pair count break lexicographically by (left, right) —
pinned against an independent plain-Python BPE in
tests/test_bpe.py. No end-of-word marker (whole words are the
units; add one upstream by appending it to the text if cross-word
merges must be blocked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import ascii_lower, tokens


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over case-folded whitespace tokens — the one
    corpus-scale aggregation BPE training needs. The fold is the
    engine-stable ASCII-only translate (r10 VERDICT casing sweep):
    the initial BPE alphabet and merge table must not depend on the
    engine's Unicode casing version."""
    return (
        docs.select(
            F.explode(tokens(ascii_lower(F.col(text_col)))).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    n = F.size("s")
    return (
        syms.filter(n >= 2)
        .select(
            "freq",
            F.explode(
                F.arrays_zip(
                    F.slice("s", 1, n - 1).alias("left"),
                    F.slice("s", 2, n - 1).alias("right"),
                )
            ).alias("z"),
        )
        .groupBy(
            F.col("z.left").alias("left"), F.col("z.right").alias("right")
        )
        .agg(F.sum("freq").alias("pair_count"))
    )


def _apply_merge(syms: DataFrame, top: DataFrame) -> DataFrame:
    """Merge every adjacent (left, right) occurrence, leftmost-first,
    against the broadcast 1-row winning pair."""
    merged = F.concat(F.col("left"), F.col("right"))
    return syms.crossJoin(F.broadcast(top)).select(
        "w",
        "freq",
        F.aggregate(
            "s",
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.col("left"))
                & (x == F.col("right")),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        ).alias("s"),
    )


def bpe_merges(
    docs: DataFrame, k: int = 5, text_col: str = "text"
) -> DataFrame:
    """Learn the first ``k`` BPE merges from the corpus. Returns one
    row per merge: (rank, left, right, merged, pair_count), rank 1 =
    first merge learned."""
    if not 1 <= k <= 50:
        raise ValueError("k merge rounds must be in [1, 50] (plan growth)")
    words = word_frequencies(docs, text_col)
    syms = words.select(
        "w",
        "freq",
        F.array_remove(F.split("w", r"(?!^)"), "").alias("s"),
    ).localCheckpoint()

    out: DataFrame | None = None
    for rank in range(1, k + 1):
        # NOT checkpointed (r15 A/B): materializing the 1-row winner
        # per round costs a job that measures MORE than the duplicate
        # pair-count aggregates it would save (4.4 s vs 3.6 s at
        # sf0.1, k=8) — the aggregates re-run over checkpointed syms
        # and are cheap
        top = (
            _pair_counts(syms)
            .orderBy(
                F.col("pair_count").desc(), F.col("left"), F.col("right")
            )
            .limit(1)
        )
        row = top.select(
            F.lit(rank).alias("rank"),
            "left",
            "right",
            F.concat("left", "right").alias("merged"),
            "pair_count",
        )
        out = row if out is None else out.unionByName(row)
        # checkpoint BOTH the merge row and the rewritten symbols: the
        # round-k pair counts must not replan rounds 1..k-1
        syms = _apply_merge(syms, top).localCheckpoint()
    return out


_BATCH_SEP = "\x00"  # never inside a symbol: tokens are split on \s+


def _merge_fold_expr(merges: list[tuple[str, str]]):
    """The one-pass left-fold that applies a SET of symbol-disjoint
    merges to the ``s`` column, leftmost-first, via a constant
    (acc tail, next symbol) -> merged lookup map."""
    mapping = F.create_map(
        *[
            F.lit(s)
            for left, right in merges
            for s in (left + _BATCH_SEP + right, left + right)
        ]
    )
    return F.aggregate(
        "s",
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & F.element_at(
                mapping,
                F.concat(F.element_at(acc, -1), F.lit(_BATCH_SEP), x),
            ).isNotNull(),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.element_at(
                        mapping,
                        F.concat(
                            F.element_at(acc, -1), F.lit(_BATCH_SEP), x
                        ),
                    )
                ),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _apply_merge_batch(
    syms: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Apply a SET of symbol-disjoint merges in one fold pass. The
    greedy selection guarantees no merge's left/right equals another's
    left/right/merged output, so a single left-fold that looks up
    (acc tail, next symbol) in a constant map applies all of them with
    the same leftmost-first semantics as applying each alone."""
    return syms.select("w", "freq", _merge_fold_expr(merges).alias("s"))


def select_disjoint(
    candidates: list[tuple[str, str, int]], batch: int
) -> list[tuple[str, str, int]]:
    """Greedy symbol-disjoint prefix of a (count desc, left, right)
    candidate list — the standard batched-BPE selection. A pair is
    kept only if neither symbol was touched by an earlier kept pair
    (including earlier MERGED outputs, which blocks within-batch
    cascades the single-fold application couldn't order). Pure
    function, driver-side, O(batch) state."""
    used: set[str] = set()
    out: list[tuple[str, str, int]] = []
    for left, right, count in candidates:
        if len(out) >= batch:
            break
        if left in used or right in used:
            continue
        out.append((left, right, count))
        used.update((left, right, left + right))
    return out


def _picked_pair_lookup(picked: list[tuple[str, str, int]]):
    """Constant map {left\\x00right -> merged} for a round's picks."""
    return F.create_map(
        *[
            F.lit(s)
            for left, right, _ in picked
            for s in (left + _BATCH_SEP + right, left + right)
        ]
    )


def _word_touches_picked(picked: list[tuple[str, str, int]]):
    """Predicate: the word's symbol array contains an adjacent
    occurrence of ANY picked pair — i.e. this round's merges can
    change it. Pure map-side expression (zip of shifted slices + a
    constant-map lookup), so the affected/unaffected split costs one
    codegen scan, no shuffle."""
    m = _picked_pair_lookup(picked)
    n = F.size("s")
    pairs = F.zip_with(
        F.slice("s", 1, n - 1),
        F.slice("s", 2, n - 1),
        lambda a, b: F.concat(a, F.lit(_BATCH_SEP), b),
    )
    return (n >= 2) & F.exists(
        pairs, lambda p: F.element_at(m, p).isNotNull()
    )


def _signed_pairs(syms: DataFrame, sign: int) -> DataFrame:
    return _pair_counts(syms).select(
        "left", "right", (F.lit(sign) * F.col("pair_count")).alias("d")
    )


def bpe_merges_batched(
    docs: DataFrame,
    k: int = 64,
    batch: int = 16,
    text_col: str = "text",
    max_batch: int | None = None,
    window_mult: int = 4,
    incremental: bool | str = False,
) -> DataFrame:
    """Batched BPE training: learn up to ``batch`` symbol-disjoint
    merges per counting round, so ``k`` merges cost O(k/batch) Spark
    jobs instead of O(k) — the standard scale escape for the
    one-job-per-merge driver loop (``bpe_merges``'s k ≤ 50 guard).

    DIVERGENCE SEMANTICS vs sequential BPE (documented, deliberate):
    within one round all ``batch`` winners are chosen from the SAME
    pair-count snapshot. Sequential BPE recounts after every merge, so
    it may interleave a pair CREATED by an earlier merge (e.g. (x, ab)
    right after (a,b)) ahead of this round's lower-ranked picks; the
    batched schedule cannot. Each round's selection is still exactly
    (count desc, left, right) order with conflicting pairs skipped.
    The schedule equals sequential whenever no created pair outranks a
    same-round pick — the usual case on natural-language counts, and
    the Spark implementation is pinned row-for-row against an
    independent plain-Python implementation of this same batched
    schedule (tests/test_bpe.py).

    Driver-side state is the per-round candidate window (≤ 4×batch
    (left, right, count) rows — config-scale, the same move as reading
    a rule file; the corpus-scale relations stay distributed). Returns
    (rank, left, right, merged, pair_count, round): rank is global
    selection order, pair_count the count snapshot its round selected
    on.

    ``max_batch`` turns on ADAPTIVE GROWTH (VERDICT r7 item 3 — the
    realistic-vocabulary escape): round r's batch is
    ``min(batch·2^(r-1), max_batch)``, so the early rounds — where
    pair counts are top-heavy and same-snapshot picks genuinely
    conflict — stay small and close to the sequential schedule, while
    the long tail of a big vocabulary (where the count distribution is
    flat and thousands of pairs are independent) is learned in a few
    wide rounds: k merges cost O(log2(max_batch/batch) + k/max_batch)
    counting round-trips, e.g. k=1024 from batch=16/max_batch=256 in
    ~9 rounds instead of 64. ``max_batch=None`` keeps the fixed-batch
    schedule.

    ``window_mult`` sets the per-round candidate window
    (``want × window_mult`` rows collected — still config-scale). The
    window is the real round-count lever once batches are wide: the
    TOP of the pair-count list shares a handful of hot symbols, so the
    disjoint selector exhausts a shallow window after ~|inventory|/2
    picks and the round closes early; a deeper window lets it keep
    picking lower-count disjoint pairs. Measured on a 4k-word
    uniform-random vocabulary (the adversarial case — every top pair
    is two bare letters): k=1024 takes 53 rounds at mult=4, 25 at
    mult=16, 17 at mult=64. Pinned row-for-row at k=1024 against the
    plain-Python reference implementing this same schedule
    (tests/test_bpe.py).

    ``incremental=True`` (VERDICT r8 item 4 — the production-
    vocabulary escape) maintains the (left, right, pair_count)
    relation ACROSS rounds instead of re-exploding every word every
    round: after applying a merge batch, only the words that CONTAIN a
    picked pair (a map-side predicate scan) are re-counted — their old
    adjacencies enter the maintained relation negated, their rewritten
    adjacencies positive, and a delta-sized full-outer join updates
    the state (zero-count pairs dropped, so the relation stays exactly
    equal to a from-scratch recount — the candidate windows, and
    therefore the learned schedule, are IDENTICAL to
    incremental=False; pinned in tests/test_bpe.py). In the long tail
    of a big vocabulary each round touches a shrinking fraction of
    words, so per-round shuffle volume is O(affected pairs) instead of
    O(all adjacencies) — at a 100M-word web vocabulary that is the
    difference between a corpus-vocabulary-scale shuffle per round and
    a model-scale one. Rounds are bounded by the disjoint-selection
    inventory (~|symbol inventory|/2 picks/round), not by k/max_batch:
    k=8192 measured in 101 counting rounds, ~66 s of round work
    (SCALE.md). Honest crossover: the win requires the AFFECTED
    FRACTION to be small — in head rounds (hot letter pairs touching
    most words) incremental does recount-sized work plus maintenance
    and measures slower; the tail (where a production vocabulary
    spends most rounds — affected fell 468 → 17 words/round in the
    k=8192 probe) is where delta maintenance pays. ``"auto"`` is the
    log-structured form: immutable word-partitioned base +
    rewritten-words overlay with LSM-style compaction on heavy rounds,
    so tail rounds materialize O(words-ever-touched) and only SCAN the
    base. The schedule is identical in every mode (pinned). HONEST
    DEFAULT GUIDANCE: the full three-mode × three-corpus matrix in
    SCALE.md shows plain recount (incremental=False) winning at every
    locally-testable scale — the maintenance modes' 2-3 extra jobs
    per round dominate until a round's recount is genuinely expensive
    (~100M-word vocabularies); pick them for that regime, not for
    single-node speed."""
    if not (isinstance(incremental, bool) or incremental == "auto"):
        raise ValueError("incremental must be a bool or 'auto'")
    if not 1 <= k <= 100_000:
        raise ValueError("k must be in [1, 100000]")
    if not 1 <= batch <= 1024:
        raise ValueError("batch must be in [1, 1024]")
    if max_batch is not None and not batch <= max_batch <= 4096:
        raise ValueError("max_batch must be in [batch, 4096]")
    if not 1 <= window_mult <= 64:
        raise ValueError("window_mult must be in [1, 64]")
    words = word_frequencies(docs, text_col)
    syms = words.select(
        "w",
        "freq",
        F.array_remove(F.split("w", r"(?!^)"), "").alias("s"),
    ).localCheckpoint()
    # incremental state: the maintained pair-count relation, kept
    # exactly equal to _pair_counts(syms) after every round
    pc = _pair_counts(syms).localCheckpoint() if incremental else None
    # freq-weighted word count for the auto-hybrid switch (constant
    # for the whole training run — one tiny job at init)
    total_words = (
        syms.agg(F.sum("freq")).collect()[0][0] or 0
        if incremental == "auto"
        else 0
    )
    # "auto" is LOG-STRUCTURED state: an immutable word-partitioned
    # base relation plus an overlay holding the CURRENT form of every
    # word ever rewritten. Tail rounds append to the overlay (per-round
    # materialization = O(words-ever-touched), the base is only
    # predicate-SCANNED, never rewritten); head rounds — picks touching
    # a material vocab fraction — COMPACT: fold the whole current state
    # into a fresh base and clear the overlay, exactly an LSM tree's
    # merge. The single-relation incremental=True form materializes the
    # whole vocabulary every round regardless of how few words changed,
    # which measurement showed to be the binding cost (SCALE.md).
    n_parts = max(syms.rdd.getNumPartitions(), 1) if incremental else 1
    if incremental == "auto":
        base = (
            syms.repartition(n_parts, "w")
            .sortWithinPartitions("w")
            .localCheckpoint()
        )
        overlay = base.limit(0).localCheckpoint()

    learned: list[tuple[int, str, str, str, int, int]] = []
    round_no = 0
    while len(learned) < k:
        round_no += 1
        cur_batch = (
            min(batch << (round_no - 1), max_batch)
            if max_batch is not None
            else batch
        )
        want = min(cur_batch, k - len(learned))
        counts = pc if incremental else _pair_counts(syms)
        candidates = [
            (r.left, r.right, r.pair_count)
            for r in counts.orderBy(
                F.col("pair_count").desc(), F.col("left"), F.col("right")
            )
            .limit(want * window_mult)
            .collect()
        ]
        if not candidates:
            break  # vocabulary ran dry
        picked = select_disjoint(candidates, want)
        for left, right, count in picked:
            learned.append(
                (
                    len(learned) + 1,
                    left,
                    right,
                    left + right,
                    count,
                    round_no,
                )
            )
        pairs = [(left, right) for left, right, _ in picked]
        if not incremental:
            syms = _apply_merge_batch(syms, pairs).localCheckpoint()
            continue
        if incremental == "auto":
            touches = _word_touches_picked(picked)
            # affected-word count is bounded above by the picked
            # pairs' occurrence mass (each occurrence lives in one
            # word) — a driver-side upper-bound test, no extra job
            picked_mass = sum(c for _, _, c in picked)
            over_words = overlay.select("w")
            if picked_mass * 8 > total_words:
                # COMPACTION round (head): fold the current state —
                # base minus superseded rows, plus the overlay — into
                # a fresh word-partitioned base; overlay resets, pc is
                # rebuilt from scratch (the one full recount this
                # round already implies)
                cur = base.join(over_words, "w", "left_anti").unionByName(
                    overlay
                )
                base = (
                    _apply_merge_batch(cur, pairs)
                    .repartition(n_parts, "w")
                    .sortWithinPartitions("w")
                    .localCheckpoint()
                )
                overlay = base.limit(0).localCheckpoint()
                pc = _pair_counts(base).localCheckpoint()
                continue
            # overlay round (tail): the base is only SCANNED by the
            # touches predicate — the affected set (checkpointed, its
            # size follows the picks) is the only thing materialized
            # besides the overlay itself and the pc delta
            affected = (
                base.filter(touches)
                .join(over_words, "w", "left_anti")
                .unionByName(overlay.filter(touches))
                .localCheckpoint()
            )
            rewritten = _apply_merge_batch(affected, pairs)
            overlay = (
                overlay.filter(~_word_touches_picked(picked))
                .unionByName(rewritten)
                .repartition(n_parts, "w")
                .sortWithinPartitions("w")
                .localCheckpoint()
            )
            delta = (
                _signed_pairs(affected, -1)
                .unionByName(_signed_pairs(rewritten, 1))
                .groupBy("left", "right")
                .agg(F.sum("d").alias("d"))
            )
            pc = (
                pc.join(delta, ["left", "right"], "full_outer")
                .select(
                    "left",
                    "right",
                    (
                        F.coalesce(F.col("pair_count"), F.lit(0))
                        + F.coalesce(F.col("d"), F.lit(0))
                    ).alias("pair_count"),
                )
                .filter(F.col("pair_count") > 0)
                .localCheckpoint()
            )
            continue
        # incremental recount: ONE conditional projection applies the
        # merge fold only to rows matching the map-side "touches a
        # picked pair" predicate and keeps the flag, so the round pays
        # a single vocab-wide materialization (same as the batched
        # path) — the first cut split affected/unaffected and unioned
        # them back, which cost two extra vocab materializations per
        # round and measured SLOWER than full recount at a 30k-word
        # vocabulary (64.6 s vs 35.7 s; restructured form in SCALE.md)
        prev = syms
        touches = _word_touches_picked(picked)
        syms = prev.select(
            "w",
            "freq",
            F.when(touches, _merge_fold_expr(pairs)).otherwise(
                F.col("s")
            ).alias("s"),
            touches.alias("_hit"),
        ).localCheckpoint()
        affected_old = prev.filter(_word_touches_picked(picked))
        rewritten = syms.filter("_hit")
        syms = syms.drop("_hit")
        delta = (
            _signed_pairs(affected_old, -1)
            .unionByName(_signed_pairs(rewritten, 1))
            .groupBy("left", "right")
            .agg(F.sum("d").alias("d"))
        )
        pc = (
            pc.join(delta, ["left", "right"], "full_outer")
            .select(
                "left",
                "right",
                (
                    F.coalesce(F.col("pair_count"), F.lit(0))
                    + F.coalesce(F.col("d"), F.lit(0))
                ).alias("pair_count"),
            )
            .filter(F.col("pair_count") > 0)
            .localCheckpoint()
        )
    return docs.sparkSession.createDataFrame(
        learned,
        "rank long, left string, right string, merged string, "
        "pair_count long, round long",
    )


def merge_fold(syms_col, left: str, right: str):
    """One learned merge compiled into a fold expression over a
    symbol-array column — the trained artifact becomes plan parameters
    exactly like the INI rule schemas do (driver-side compile, zero
    per-row interpretation of the model). Merges are config-scale
    (k rows), not corpus-scale, so collecting them is the same move as
    reading a rule file — distinct from the kmeans/BPE TRAINING loops,
    which never collect corpus-derived relations of unbounded size.

    Apply ONE merge per projection (see ``bpe_subword_vocabulary``),
    never as a k-deep nested expression: Catalyst's lambda-variable
    rewriting over nested higher-order functions is super-linear in
    nesting depth — a single 8-deep chain measured 13 s of pure
    optimizer time on a 31-row vocabulary."""
    def merge_step(left: str, right: str):
        l, r, m = F.lit(left), F.lit(right), F.lit(left + right)

        def step(acc, x):
            return F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == l)
                & (x == r),
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(m)),
            ).otherwise(F.concat(acc, F.array(x)))

        return step

    return F.aggregate(
        syms_col, F.array().cast("array<string>"), merge_step(left, right)
    )


def bpe_subword_vocabulary(
    docs: DataFrame, k: int = 8, top: int = 20, text_col: str = "text"
) -> DataFrame:
    """Train k merges, then segment the corpus with them and return the
    top subwords by corpus frequency: (subword, freq, rank). The
    train→apply round trip of a BPE tokenizer pipeline."""
    merges = [
        (r.left, r.right)
        for r in bpe_merges(docs, k=k, text_col=text_col)
        .orderBy("rank")
        .collect()
    ]
    words = word_frequencies(docs, text_col)
    segmented = words.select(
        "freq",
        F.array_remove(F.split("w", r"(?!^)"), "").alias("s"),
    ).localCheckpoint()
    # one fold per projection, checkpointed: flat plans each round
    # instead of one k-deep nested lambda tree (see merge_fold)
    for left, right in merges:
        segmented = segmented.select(
            "freq", merge_fold(F.col("s"), left, right).alias("s")
        ).localCheckpoint()
    counts = (
        segmented.select("freq", F.explode("s").alias("subword"))
        .groupBy("subword")
        .agg(F.sum("freq").alias("freq"))
    )
    ranked = counts.orderBy(F.col("freq").desc(), F.col("subword")).limit(top)
    packed = ranked.select(
        F.struct(
            (-F.col("freq")).alias("_neg"),
            F.col("subword").alias("_tie"),
            F.struct("subword", "freq").alias("_row"),
        ).alias("key")
    ).agg(F.sort_array(F.collect_list("key")).alias("xs"))
    return packed.select(F.posexplode("xs").alias("_pos", "_x")).select(
        "_x._row.subword",
        "_x._row.freq",
        (F.col("_pos") + 1).cast("long").alias("rank"),
    )
