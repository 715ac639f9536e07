"""Join operators beyond the built-in surface (SURVEY §2.3 engine
completeness): as-of join and salted skew join.

As-of join (time-series point-in-time lookup) is composed from
built-ins with the union-and-fill pattern: tag both sides, union on
aligned schemas, sort per key by (ts, side) and carry the last
right-side value forward with ``last(..., ignorenulls)`` — then keep
the left rows. ONE shuffle on the key columns, no range explosion, no
per-row loops; at 100 TB this beats a theta-join (which Spark would
plan as broadcast-nested-loop) by orders of magnitude because the
window never materializes candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, MapType, StructType


def _hash_safe(dt: DataType) -> bool:
    """True when ``F.hash`` accepts the type — MapType (at any nesting
    depth) is the one unhashable family."""
    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _hash_safe(dt.elementType)
    if isinstance(dt, StructType):
        return all(_hash_safe(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the ``value_cols`` of the latest right
    row with the same keys and right.ts <= left.ts (inclusive — DuckDB
    ``ASOF JOIN ... ON l.ts >= r.ts`` semantics). Left rows with no
    prior right row get NULLs.
    """
    out_names = [f"{c}{suffix}" for c in value_cols]
    r = right.select(
        *key_cols,
        F.col(ts_col),
        *[F.col(c).alias(n) for c, n in zip(value_cols, out_names)],
    ).withColumn("_is_left", F.lit(0))
    l = left.withColumn("_is_left", F.lit(1))
    unioned = l.unionByName(r, allowMissingColumns=True)

    # right rows sort before left rows at equal timestamps → inclusive
    w = (
        W.partitionBy(*key_cols)
        .orderBy(F.col(ts_col), F.col("_is_left"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    for n in out_names:
        unioned = unioned.withColumn(n, F.last(n, ignorenulls=True).over(w))
    return unioned.filter(F.col("_is_left") == 1).drop("_is_left")


def salted_join(
    big: DataFrame,
    skewed_small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: salt the big side's key into
    ``n_salts`` shards and replicate the small side per salt, so one
    hot key spreads over ``n_salts`` reducers. AQE's skew-join handles
    the common case automatically; this is the explicit form for when
    the skew is known and extreme (SURVEY §4).
    """
    # The salt must NOT be a function of the join key alone — crc32(key)
    # % n_salts would give every row of a hot key the same salt, landing
    # them all on one reducer again. It must also be DETERMINISTIC per
    # row: monotonically_increasing_id changes across task retries, so a
    # recomputed shuffle-map stage could re-salt rows differently and
    # drop/duplicate join rows (SPARK-23207). Hashing the hashable
    # columns spreads a hot key's rows (which differ in their non-key
    # columns) across salts and replays identically on retry. MapType
    # columns are excluded (F.hash rejects maps — analysis error).
    # Limitation: rows that are fully duplicate across the hashed
    # columns share a salt, so a hot key made of identical rows still
    # lands on one reducer; there is no deterministic per-row
    # discriminator that survives retry for such rows.
    hashable = [
        F.col(c)
        for c, f in zip(big.columns, big.schema.fields)
        if _hash_safe(f.dataType)
    ]
    if not hashable:
        raise ValueError(
            f"salted_join: no hashable columns in big side {big.columns}"
        )
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.hash(*hashable), F.lit(n_salts)).cast("int"),
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias("_salt")
    replicated = skewed_small.select("*", salts)
    joined = salted_big.join(replicated, [key, "_salt"], how)
    return joined.drop("_salt")
