"""P-family: projection / filters / predicates (SURVEY §2.2).

These re-express the reference's row-shaping code as declarative
DataFrame transforms:
- P1 project+rename  (reference: producer_stock_quotes.py:98-110)
- P2 epoch→timestamp (reference: producer_stock_quotes.py:90-96)
- P4 validity filter (reference: producer_stock_quotes.py:65-70)
- P5 comparison filter (reference: producer_company_news.py:133-135)
- P6 malformed-record skip (reference: processor_stock_quotes.py:36-44)
- P7 compound predicates (planned Athena layer, README.md:31)
- P8 null-coalescing defaults (reference: producer_company_news.py:113-116)

Scale: all of these are narrow transformations — no shuffle, fully
pipelined inside one WholeStageCodegen stage, and the predicates push down
to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fineventstream_spark.catalog import Tables
from fineventstream_spark.registry import register


@register(
    "q_project_rename",
    oracle="""
    SELECT event_id AS id,
           event_type AS type,
           value AS reading,
           user_id AS actor
    FROM events
    """,
    tags=("P1",),
)
def q_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terse→long column rename, dropping everything else (the c→current_price map)."""
    t = Tables(spark, sf_dir)
    return t.events.select(
        F.col("event_id").alias("id"),
        F.col("event_type").alias("type"),
        F.col("value").alias("reading"),
        F.col("user_id").alias("actor"),
    )


@register(
    "q_derive_epoch_ts",
    oracle="""
    SELECT event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
           make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000) AS ts_from_epoch
    FROM events
    """,
    tags=("P2", "F3"),
)
def q_derive_epoch_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch seconds ↔ timestamp, both directions, null-safe."""
    t = Tables(spark, sf_dir)
    return t.events.select(
        "event_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        F.timestamp_seconds(F.unix_timestamp("ts")).alias("ts_from_epoch"),
    )


@register(
    "q_filter_notnull",
    oracle="""
    SELECT event_id, value, event_type
    FROM events
    WHERE value IS NOT NULL AND event_type IS NOT NULL
    """,
    tags=("P4",),
)
def q_filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validity filter: keep only records with required fields present."""
    t = Tables(spark, sf_dir)
    return t.events.filter(F.col("value").isNotNull() & F.col("event_type").isNotNull()).select(
        "event_id", "value", "event_type"
    )


@register(
    "q_filter_compare",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE event_id > 500 AND value > 50.0
    """,
    tags=("P5",),
)
def q_filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone-threshold filter (the news id > high-water-mark rule, batch form)."""
    t = Tables(spark, sf_dir)
    return t.events.filter((F.col("event_id") > 500) & (F.col("value") > 50.0)).select(
        "event_id", "user_id", "value"
    )


@register(
    "q_filter_malformed",
    oracle="""
    WITH payloads AS (
        SELECT event_id,
               CASE WHEN event_id % 10 = 0 THEN substr(props, 1, 2) ELSE props END AS payload
        FROM events
    ), extracted AS (
        -- CASE guards the strict json_extract_string: DuckDB does not
        -- short-circuit AND conjuncts, so a bare WHERE json_valid(...)
        -- AND json_extract_string(...) can still evaluate the extract on
        -- malformed rows and throw (observed at sf0.1, passed at sf0.01
        -- only by vectorization luck)
        SELECT event_id,
               CASE WHEN json_valid(payload)
                    THEN CAST(json_extract_string(payload, '$.k') AS INTEGER)
               END AS k
        FROM payloads
    )
    SELECT event_id, k FROM extracted WHERE k IS NOT NULL
    """,
    tags=("P6",),
)
def q_filter_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-malformed semantics: every 10th payload is truncated JSON and must be dropped."""
    t = Tables(spark, sf_dir)
    payloads = t.events.select(
        "event_id",
        F.when(F.col("event_id") % 10 == 0, F.substring("props", 1, 2))
        .otherwise(F.col("props"))
        .alias("payload"),
    )
    extracted = payloads.select(
        "event_id", F.get_json_object("payload", "$.k").cast("int").alias("k")
    )
    return extracted.filter(F.col("k").isNotNull())


@register(
    "q_filter_boolean",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_discount
    FROM lineitem
    WHERE (l_returnflag = 'A' OR l_linestatus = 'O') AND NOT (l_discount > 0.05)
    """,
    tags=("P7",),
)
def q_filter_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound AND/OR/NOT predicate."""
    t = Tables(spark, sf_dir)
    return t.lineitem.filter(
        ((F.col("l_returnflag") == "A") | (F.col("l_linestatus") == "O")) & ~(F.col("l_discount") > 0.05)
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_discount")


@register(
    "q_filter_in_between_like",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('F', 'O')
      AND o_totalprice BETWEEN 1000.0 AND 50000.0
      AND o_orderpriority LIKE '1%'
    """,
    tags=("P7",),
)
def q_filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / BETWEEN / LIKE predicates."""
    t = Tables(spark, sf_dir)
    return t.orders.filter(
        F.col("o_orderstatus").isin("F", "O")
        & F.col("o_totalprice").between(1000.0, 50000.0)
        & F.col("o_orderpriority").like("1%")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@register(
    "q_coalesce_default",
    oracle="""
    SELECT event_id,
           COALESCE(CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END, 0.0) AS value_or_zero,
           COALESCE(NULLIF(event_type, 'error'), 'unknown') AS type_or_unknown
    FROM events
    """,
    tags=("P8", "F6"),
)
def q_coalesce_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-coalescing defaults (the sort-key null→0 rule, producer_company_news.py:113-116)."""
    t = Tables(spark, sf_dir)
    nulled = F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double")).otherwise(F.col("value"))
    return t.events.select(
        "event_id",
        F.coalesce(nulled, F.lit(0.0)).alias("value_or_zero"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("unknown")).alias(
            "type_or_unknown"
        ),
    )
