"""DQ-family: declarative data-quality validation.

The reference plans a Great-Expectations-style validation layer
(/root/reference/README.md:37 "Next Feats"); its shipped guards are
ad-hoc shape checks (processor_stock_quotes.py:36-38). Here the rule set
is data, the checks compile to JVM expressions, and the violations report
is a first-class query (operators/quality.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fineventstream_spark.catalog import Tables
from fineventstream_spark.operators.quality import (
    expectation_summary,
    in_range,
    in_set,
    matches,
    not_null,
    unique,
)
from fineventstream_spark.registry import register


@register(
    "q_dq_violations",
    oracle="""
    SELECT 'l_quantity_not_null' AS rule,
           CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viol
    FROM lineitem
    UNION ALL
    SELECT 'l_discount_in_range',
           CAST(SUM(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.05) THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag_in_set',
           CAST(SUM(CASE WHEN NOT (l_returnflag IN ('A', 'N')) THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_linestatus_matches',
           CAST(SUM(CASE WHEN NOT regexp_matches(l_linestatus, '^[FO]$') THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_orderkey_unique',
           CAST(COUNT(l_orderkey) - COUNT(DISTINCT l_orderkey) AS BIGINT)
    FROM lineitem
    """,
    tags=("DQ1",),
)
def q_dq_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Violations report over lineitem: one (rule, n_viol) row per declared
    expectation, one scan, partial-aggregated. Rules are chosen so the
    fixture actually violates some (nonzero counts) and passes others.

    r7: reads the bucketed orderkey layout — the ``unique(l_orderkey)``
    rule plans as an Expand + distinct aggregate whose first grouping is
    on the orderkey; on a hash-shuffled scan that is a DOMAIN-SIZED
    exchange (every distinct key crosses the wire — the dominant cost at
    sf10), on the bucketed scan the distribution is already satisfied and
    the whole report runs shuffle-free up to the final scalar collapse."""
    from fineventstream_spark.operators.bucketed import bucketed_table

    rules = [
        not_null("l_quantity"),
        in_range("l_discount", 0.0, 0.05),
        in_set("l_returnflag", ("A", "N")),
        matches("l_linestatus", "^[FO]$"),
        unique("l_orderkey"),
    ]
    return expectation_summary(bucketed_table(spark, sf_dir, "lineitem"), rules)


@register(
    "q_dq_profile",
    oracle="""
    SELECT 'o_orderstatus' AS col,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderstatus) AS VARCHAR) AS vmin,
           CAST(MAX(o_orderstatus) AS VARCHAR) AS vmax
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           CAST(MIN(o_orderpriority) AS VARCHAR),
           CAST(MAX(o_orderpriority) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(ROUND(MIN(o_totalprice), 4) AS VARCHAR),
           CAST(ROUND(MAX(o_totalprice), 4) AS VARCHAR)
    FROM orders
    """,
    tags=("DQ2", "A2", "A3"),
)
def q_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the first step of any lake onboarding): row
    count, null count, distinct count, min, max per column — computed in
    ONE scan and one aggregate pass (all columns' metrics side by side,
    then unpivoted to (col, metric...) rows); min/max surface as strings
    so numeric and categorical columns share one report schema. The
    oracle spells it as three scans for clarity — values must agree
    exactly. At 100 TB use approx_count_distinct for the cardinality
    column (documented, A4); exact distincts here keep the oracle
    strict."""
    from pyspark.sql import functions as F

    t = Tables(spark, sf_dir)
    cols = ["o_orderstatus", "o_orderpriority", "o_totalprice"]

    def metrics(c: str) -> list:
        vmin = F.min(c)
        vmax = F.max(c)
        if c == "o_totalprice":
            vmin, vmax = F.round(vmin, 4), F.round(vmax, 4)
        return [
            F.count("*").alias(f"{c}__n_rows"),
            (F.count("*") - F.count(c)).alias(f"{c}__n_nulls"),
            F.countDistinct(c).alias(f"{c}__n_distinct"),
            vmin.cast("string").alias(f"{c}__vmin"),
            vmax.cast("string").alias(f"{c}__vmax"),
        ]

    wide = t.orders.agg(*[m for c in cols for m in metrics(c)])
    stack_args = ", ".join(
        f"'{c}', {c}__n_rows, {c}__n_nulls, {c}__n_distinct, {c}__vmin, {c}__vmax"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col, n_rows, n_nulls, n_distinct, vmin, vmax)"
        )
    )
