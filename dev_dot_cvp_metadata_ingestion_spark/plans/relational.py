"""Generic relational operator surface (SURVEY.md §2.3–§2.7).

The reference is a single-table pipeline (no joins, one sort, no set
ops); the engine exposes the full standard Spark surface. These queries
prove it on the TPC-H-ish testdata: hash aggregate, broadcast + shuffle
joins, semi/anti joins, ranking windows, rollup, set operations, top-k.

Scale notes (100 TB): dimension tables (region/nation/customer at TPC-H
proportions) are broadcast; fact-fact joins shuffle on their keys with
AQE handling skew; aggregates are partial (map-side) by construction in
Spark's hash-aggregate. Filters are plain parquet-pushable predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ..sources.catalog import load_table
from .registry import register

# Exact-decimal casts for double columns generated with 2-decimal money
# values — aggregation in decimal is order-independent, so Spark and the
# DuckDB oracle produce bit-identical doubles at the end.
#
# Determinism constraint: before the final cast to double, reduce the
# decimal to a scale whose unscaled integer fits in 2^53 (≤ 15 total
# digits used) — engines round int128→double differently otherwise.
# DECIMAL(38,6) is exact for all the scale-≤6 money math here.
_QTY = DecimalType(18, 4)
_PRICE = DecimalType(18, 4)
_RATE = DecimalType(8, 4)


def _dec(col, t=_PRICE):
    return F.col(col).cast(t)


@register(
    "pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DECIMAL(38,6)) AS DOUBLE)
        AS sum_disc_price,
      CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l_discount AS DECIMAL(8,4)))
               * (1 + CAST(l_tax AS DECIMAL(8,4)))) AS DECIMAL(38,6)) AS DOUBLE)
        AS sum_charge,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: filter → hash aggregate.

    Reference parity: A2/A7-style tallying (cvp_bucket_event_lambda_handler.py:115-153)
    generalized to a grouped aggregate.
    """
    from ..functions.relations import rebalance_narrow_scan

    l = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (1 - _dec("l_discount", _RATE))
    charge = disc_price * (1 + _dec("l_tax", _RATE))
    # rebalance (r15): the decimal partial aggregate otherwise runs in
    # the single-task scan (guide §2.5; measured 1.58 → 0.87 s at
    # sf0.1). DECIMAL sums are exact, so merge order cannot change
    # the result; the filter still pushes to the scan (the rebalance
    # sits above it after predicate pushdown).
    return (
        rebalance_narrow_scan(
            l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity", _QTY)).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast(DecimalType(38, 6)).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast(DecimalType(38, 6)).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "revenue_by_nation",
    oracle="""
    SELECT
      n_name,
      CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DECIMAL(38,6)) AS DOUBLE)
        AS revenue,
      count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style multi-join: fact-fact shuffle join + broadcast dims.

    customer/nation/region are broadcast (small dims); lineitem⋈orders
    shuffles on the order key.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = _dec("l_extendedprice") * (1 - _dec("l_discount", _RATE))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.sum(revenue).cast(DecimalType(38, 6)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("n_name")
    )


@register(
    "top_orders_per_priority",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rk
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    )
    WHERE rk <= 5
    ORDER BY o_orderpriority, rk
    """,
)
def top_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window (SURVEY §2.6)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_orderpriority", "rk")
    )


@register(
    "customers_without_orders",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE c_custkey NOT IN (
      SELECT o_custkey FROM orders
      WHERE o_custkey IS NOT NULL
        AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (NOT EXISTS) + aggregate (SURVEY §2.3): customers with
    no order before 1996."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@register(
    "suppliers_with_large_shipments",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_quantity >= 48)
    ORDER BY s_name
    """,
)
def suppliers_with_large_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (EXISTS) surface (SURVEY §2.3)."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48)
    return (
        s.join(l, s.s_suppkey == l.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "order_priority_rollup",
    oracle="""
    SELECT
      coalesce(o_orderstatus, 'ALL') AS orderstatus,
      coalesce(o_orderpriority, 'ALL') AS orderpriority,
      count(*) AS n_orders,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY orderstatus, orderpriority
    """,
)
def order_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP dimensional totals — the Spark-native form of the reference's
    per-dimension counters + grand totals (A4+A7,
    cvp_bucket_event_lambda_handler.py:139-151)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("orderstatus"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "total_price",
        )
        .orderBy("orderstatus", "orderpriority")
    )


@register(
    "part_brand_setops",
    oracle="""
    WITH big AS (SELECT DISTINCT p_brand FROM part WHERE p_size >= 40),
         cheap AS (SELECT DISTINCT p_brand FROM part WHERE p_retailprice < 1200)
    SELECT p_brand, 'both' AS bucket FROM (SELECT p_brand FROM big INTERSECT SELECT p_brand FROM cheap)
    UNION ALL
    SELECT p_brand, 'big_only' AS bucket FROM (SELECT p_brand FROM big EXCEPT SELECT p_brand FROM cheap)
    ORDER BY bucket, p_brand
    """,
)
def part_brand_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation surface: intersect / except / unionByName (SURVEY §2.7)."""
    p = load_table(spark, sf_dir, "part")
    big = p.filter(F.col("p_size") >= 40).select("p_brand").distinct()
    cheap = p.filter(F.col("p_retailprice") < 1200).select("p_brand").distinct()
    both = big.intersect(cheap).withColumn("bucket", F.lit("both"))
    big_only = big.exceptAll(cheap).withColumn("bucket", F.lit("big_only"))
    return both.unionByName(big_only).orderBy("bucket", "p_brand")


@register(
    "lineitem_status_cube",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n_items,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def lineitem_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations of (returnflag, linestatus)
    in one pass (SURVEY §2.4 engine surface)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_dec("l_quantity", _QTY)).cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


@register(
    "orders_grouping_sets",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
           coalesce(o_orderpriority, 'ALL') AS orderpriority,
           count(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY orderstatus, orderpriority
    """,
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL API (Catalyst produces the
    same plan as the DataFrame form — this query also exercises the
    spark.sql entry surface)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
               coalesce(o_orderpriority, 'ALL') AS orderpriority,
               count(*) AS n_orders
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY orderstatus, orderpriority
        """
    )


@register(
    "supplier_balance_running",
    oracle="""
    SELECT s_nationkey, s_suppkey, s_acctbal,
           CAST(sum(CAST(s_acctbal AS DECIMAL(18,4)))
                OVER (PARTITION BY s_nationkey ORDER BY s_suppkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_bal,
           lag(s_suppkey) OVER (PARTITION BY s_nationkey ORDER BY s_suppkey)
             AS prev_suppkey
    FROM supplier
    ORDER BY s_nationkey, s_suppkey
    """,
)
def supplier_balance_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window frame (running sum) + lag (SURVEY §2.5 engine surface)."""
    s = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy("s_suppkey")
    return (
        s.select(
            "s_nationkey",
            "s_suppkey",
            "s_acctbal",
            F.sum(_dec("s_acctbal"))
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("double")
            .alias("running_bal"),
            F.lag("s_suppkey").over(w).alias("prev_suppkey"),
        )
        .orderBy("s_nationkey", "s_suppkey")
    )
