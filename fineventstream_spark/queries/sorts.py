"""O-family: sorts / limits / distinct / set operations (SURVEY §2.6).

O1 re-expresses the reference's one real sort — news by (datetime, id) with
null→0 defaulting before stateful processing (producer_company_news.py:107-120).

Determinism: the driver's value hash is order-insensitive, so pure sorts
would not actually be validated; each sort query therefore materializes its
order as a rank column computed over the *total* order (unique tiebreak).
Scale note: the rank is computed with operators/rank.py's range-bucketed
global_rank — NOT a bare ``Window.orderBy`` (which would concentrate the
whole sort in one task); the sort shuffle spreads over n_buckets reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fineventstream_spark.catalog import Tables
from fineventstream_spark.operators.rank import global_rank
from fineventstream_spark.registry import register


@register(
    "q_sort_multikey",
    oracle="""
    SELECT event_id, user_id, sort_ts,
           CAST(row_number() OVER (ORDER BY sort_ts ASC, event_id ASC) AS BIGINT) AS pos
    FROM (
        SELECT event_id, user_id,
               COALESCE(CASE WHEN event_id % 11 = 0 THEN NULL ELSE ts END,
                        TIMESTAMP '1970-01-01 00:00:00') AS sort_ts
        FROM events
        WHERE event_id < 2000
    )
    """,
    tags=("O1",),
)
def q_sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with null→epoch-0 defaulting (the news sort, producer_company_news.py:107-120)."""
    t = Tables(spark, sf_dir)
    nulled_ts = F.when(F.col("event_id") % 11 == 0, F.lit(None).cast("timestamp")).otherwise(
        F.col("ts")
    )
    base = (
        t.events.filter(F.col("event_id") < 2000)
        .select(
            "event_id",
            "user_id",
            F.coalesce(nulled_ts, F.lit("1970-01-01 00:00:00").cast("timestamp")).alias("sort_ts"),
        )
    )
    return global_rank(
        base,
        bucket_key=F.unix_micros(F.col("sort_ts")),
        order_cols=[F.col("sort_ts").asc(), F.col("event_id").asc()],
    )


@register(
    "q_sort_desc_nulls",
    oracle="""
    SELECT event_id, maybe_value,
           CAST(row_number() OVER (ORDER BY maybe_value DESC NULLS LAST, event_id ASC) AS BIGINT) AS pos
    FROM (
        SELECT event_id,
               CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS maybe_value
        FROM events
        WHERE event_id < 2000
    )
    """,
    tags=("O2",),
)
def q_sort_desc_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Descending sort with explicit NULLS LAST placement."""
    t = Tables(spark, sf_dir)
    base = t.events.filter(F.col("event_id") < 2000).select(
        "event_id",
        F.when(F.col("event_id") % 13 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("maybe_value"),
    )
    return global_rank(
        base,
        bucket_key=-F.col("maybe_value"),
        order_cols=[F.col("maybe_value").desc_nulls_last(), F.col("event_id").asc()],
        null_bucket="last",
    )


@register(
    "q_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
    tags=("O3",),
)
def q_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: Spark plans TakeOrderedAndProject — per-partition heaps, no global sort."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "q_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    tags=("O4",),
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = groupBy on all columns (partial agg keeps the shuffle tiny)."""
    t = Tables(spark, sf_dir)
    return t.lineitem.select("l_returnflag", "l_linestatus").distinct()


@register(
    "q_union_all",
    oracle="""
    SELECT o_orderkey AS id, 'order' AS kind, o_totalprice AS amount FROM orders
    UNION ALL
    SELECT l_orderkey AS id, 'line' AS kind, l_extendedprice AS amount FROM lineitem
    """,
    tags=("O5",),
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL via unionByName (no shuffle — pure concatenation of partitions)."""
    t = Tables(spark, sf_dir)
    a = t.orders.select(
        F.col("o_orderkey").alias("id"), F.lit("order").alias("kind"), F.col("o_totalprice").alias("amount")
    )
    b = t.lineitem.select(
        F.col("l_orderkey").alias("id"), F.lit("line").alias("kind"), F.col("l_extendedprice").alias("amount")
    )
    return a.unionByName(b)


@register(
    "q_union_distinct",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    UNION
    SELECT c_custkey AS custkey FROM customer
    """,
    tags=("O5",),
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): union all + dedup."""
    t = Tables(spark, sf_dir)
    a = t.orders.select(F.col("o_custkey").alias("custkey"))
    b = t.customer.select(F.col("c_custkey").alias("custkey"))
    return a.unionByName(b).distinct()


@register(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("O6",),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — nations having both customers and suppliers."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.select(F.col("c_nationkey").alias("nationkey"))
        .intersect(t.supplier.select(F.col("s_nationkey").alias("nationkey")))
    )


@register(
    "q_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("O6",),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — nations with customers but no suppliers."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.select(F.col("c_nationkey").alias("nationkey"))
        .subtract(t.supplier.select(F.col("s_nationkey").alias("nationkey")))
    )


@register(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
    tags=("A9",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide metric columns → long (metric, val) rows — the
    inverse of pivot; pure row expansion, no shuffle."""
    t = Tables(spark, sf_dir)
    return t.lineitem.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "metric",
        "val",
    )
