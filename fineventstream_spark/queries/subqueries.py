"""Subqueries / CTEs / grouping sets / null-safe comparison (the rest of
the planned Athena ANSI-SQL surface, README.md:31).

These run through ``spark.sql`` over registered lake views — subquery
decorrelation, CTE inlining, and grouping-set expansion are Catalyst
rewrites (SURVEY §4.2); the engine's job is to expose the surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fineventstream_spark.catalog import Tables, register_views
from fineventstream_spark.registry import register


@register(
    "q_subquery_scalar",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice / (SELECT AVG(o_totalprice) FROM orders), 6) AS price_ratio
    FROM orders
    """,
    tags=("P7",),
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in the projection (planned as a broadcast of one row)."""
    register_views(spark, sf_dir, names=("orders",))
    return spark.sql(
        """
        SELECT o_orderkey,
               ROUND(o_totalprice / (SELECT AVG(o_totalprice) FROM orders), 6) AS price_ratio
        FROM orders
        """
    )


@register(
    "q_subquery_in",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
    """,
    tags=("P7", "J3"),
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (decorrelates to a left-semi join)."""
    register_views(spark, sf_dir, names=("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
        """
    )


@register(
    "q_subquery_correlated",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > (SELECT 1.5 * AVG(o2.o_totalprice)
                            FROM orders o2
                            WHERE o2.o_custkey = o.o_custkey)
    """,
    tags=("P7",),
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (decorrelates to an aggregate + join)."""
    register_views(spark, sf_dir, names=("orders",))
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o
        WHERE o.o_totalprice > (SELECT 1.5 * AVG(o2.o_totalprice)
                                FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)
        """
    )


@register(
    "q_cte",
    oracle="""
    WITH cust_orders AS (
        SELECT o_custkey, count(*) AS n_orders, SUM(o_totalprice) AS spend
        FROM orders GROUP BY o_custkey
    ), segments AS (
        SELECT c_custkey, c_mktsegment FROM customer
    )
    SELECT s.c_mktsegment,
           count(*) AS n_customers,
           ROUND(AVG(co.spend), 4) AS avg_spend,
           ROUND(AVG(co.n_orders), 4) AS avg_orders
    FROM segments s
    JOIN cust_orders co ON s.c_custkey = co.o_custkey
    GROUP BY s.c_mktsegment
    """,
    tags=("P7",),
)
def q_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-CTE pipeline (WITH clauses inline into one optimized plan)."""
    register_views(spark, sf_dir, names=("customer", "orders"))
    return spark.sql(
        """
        WITH cust_orders AS (
            SELECT o_custkey, count(*) AS n_orders, SUM(o_totalprice) AS spend
            FROM orders GROUP BY o_custkey
        ), segments AS (
            SELECT c_custkey, c_mktsegment FROM customer
        )
        SELECT s.c_mktsegment,
               count(*) AS n_customers,
               ROUND(AVG(co.spend), 4) AS avg_spend,
               ROUND(AVG(co.n_orders), 4) AS avg_orders
        FROM segments s
        JOIN cust_orders co ON s.c_custkey = co.o_custkey
        GROUP BY s.c_mktsegment
        """
    )


@register(
    "q_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n, ROUND(SUM(l_quantity), 4) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
    tags=("A5",),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube)."""
    register_views(spark, sf_dir, names=("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n, ROUND(SUM(l_quantity), 4) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@register(
    "q_null_safe_eq",
    oracle="""
    WITH nulled AS (
        SELECT event_id,
               CASE WHEN event_id % 9 = 0 THEN NULL ELSE event_type END AS et
        FROM events
    )
    SELECT a.event_id AS id_a, b.event_id AS id_b
    FROM nulled a JOIN nulled b
      ON a.et IS NOT DISTINCT FROM b.et AND a.event_id + 1 = b.event_id
    """,
    tags=("P7",),
)
def q_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): nulls match nulls."""
    t = Tables(spark, sf_dir)
    nulled = t.events.select(
        "event_id",
        F.when(F.col("event_id") % 9 == 0, F.lit(None)).otherwise(F.col("event_type")).alias("et"),
    )
    a = nulled.alias("a")
    b = nulled.alias("b")
    return a.join(
        b,
        F.col("a.et").eqNullSafe(F.col("b.et")) & (F.col("a.event_id") + 1 == F.col("b.event_id")),
    ).select(F.col("a.event_id").alias("id_a"), F.col("b.event_id").alias("id_b"))
