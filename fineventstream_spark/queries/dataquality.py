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
    fixture actually violates some (nonzero counts) and passes others."""
    t = Tables(spark, sf_dir)
    rules = [
        not_null("l_quantity"),
        in_range("l_discount", 0.0, 0.05),
        in_set("l_returnflag", ("A", "N")),
        matches("l_linestatus", "^[FO]$"),
        unique("l_orderkey"),
    ]
    return expectation_summary(t.lineitem, rules)
