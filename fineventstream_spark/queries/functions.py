"""F-family: scalar functions — string / date / math / array / map / JSON / hash
(SURVEY §2.7).

All JVM-side built-ins (whole-stage codegen); no Python in the hot path.
Where DuckDB lacks an identical function (maps, Spark-specific hashes) the
oracle reproduces the *values* with equivalent arithmetic instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fineventstream_spark.catalog import Tables
from fineventstream_spark.registry import register


@register(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           json_extract_string(props, '$.k') AS k_raw
    FROM events
    """,
    tags=("F1",),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events.props payload column."""
    t = Tables(spark, sf_dir)
    return t.events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.get_json_object("props", "$.k").alias("k_raw"),
    )


@register(
    "q_base64_roundtrip",
    oracle="""
    SELECT event_id,
           to_base64(encode(event_type)) AS b64,
           event_type AS decoded
    FROM events
    """,
    tags=("F2",),
)
def q_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """base64 encode + decode (the Kinesis envelope codec, processor_stock_quotes.py:41)."""
    t = Tables(spark, sf_dir)
    b64 = F.base64(F.col("event_type").cast("binary"))
    return t.events.select(
        "event_id",
        b64.alias("b64"),
        F.unbase64(b64).cast("string").alias("decoded"),
    )


@register(
    "q_date_extract",
    oracle="""
    SELECT CAST(year(ts) AS INTEGER) AS y,
           CAST(month(ts) AS INTEGER) AS m,
           CAST(day(ts) AS INTEGER) AS d,
           CAST(hour(ts) AS INTEGER) AS h,
           CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,  -- DuckDB 0=Sun; Spark 1=Sun
           count(*) AS n
    FROM events
    GROUP BY 1, 2, 3, 4, 5
    """,
    tags=("F3",),
)
def q_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-field extraction (the partition-path strftime, processor_stock_quotes.py:69)."""
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            F.dayofmonth("ts").alias("d"),
            F.hour("ts").alias("h"),
            # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek: 0=Sunday..6 → +1
            (F.dayofweek("ts")).alias("dow"),
        )
        .agg(F.count("*").alias("n"))
    )


@register(
    "q_date_arith",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 2 DAY AS plus2d,
           o_orderdate - INTERVAL 90 DAY AS minus90d,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER) AS days_to_1998
    FROM orders
    """,
    tags=("F3",),
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic (the 2-day lookback window, producer_company_news.py:213-217)."""
    t = Tables(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 2 DAYS")).alias("plus2d"),
        (F.col("o_orderdate") - F.expr("INTERVAL 90 DAYS")).alias("minus90d"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate")).alias("days_to_1998"),
    )


@register(
    "q_date_trunc_format",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,  -- DuckDB month-trunc yields DATE
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
           count(*) AS n
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("F3",),
)
def q_date_trunc_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation + formatting (the strftime partition paths, processor_stock_quotes.py:69-73)."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.groupBy(
            F.date_trunc("month", "o_orderdate").alias("month_start"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        )
        .agg(F.count("*").alias("n"))
    )


@register(
    "q_string_basic",
    oracle="""
    SELECT doc_id,
           upper(lang) AS lang_uc,
           substr(text, 1, 12) AS prefix,
           CAST(length(text) AS INTEGER) AS text_len,
           concat(source, '_', lang) AS src_lang,
           trim(concat(' ', lang, ' ')) AS trimmed
    FROM documents
    """,
    tags=("F4",),
)
def q_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core string ops: case, substring, length, concat, trim."""
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.upper("lang").alias("lang_uc"),
        F.substring("text", 1, 12).alias("prefix"),
        F.length("text").alias("text_len"),
        F.concat_ws("_", "source", "lang").alias("src_lang"),
        F.trim(F.concat(F.lit(" "), F.col("lang"), F.lit(" "))).alias("trimmed"),
    )


@register(
    "q_string_regexp",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           regexp_replace(substr(text, 1, 40), '[aeiou]', '_', 'g') AS devoweled,
           CAST(length(regexp_replace(text, '[^ ]', '', 'g')) + 1 AS INTEGER) AS approx_words
    FROM documents
    """,
    tags=("F4",),
)
def q_string_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp extract/replace (patterns chosen to be Java-regex/RE2 agnostic)."""
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace(F.substring("text", 1, 40), "[aeiou]", "_").alias("devoweled"),
        (F.length(F.regexp_replace("text", "[^ ]", "")) + 1).alias("approx_words"),
    )


@register(
    "q_math_basic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           GREATEST(l_tax, l_discount) AS max_rate,
           LEAST(l_tax, l_discount) AS min_rate,
           ROUND(POW(1 + l_tax, 2), 6) AS tax_sq,
           ROUND(LN(l_extendedprice), 6) AS log_price
    FROM lineitem
    """,
    tags=("F5",),
)
def q_math_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic / rounding / transcendentals (the percent_change math, producer_stock_quotes.py:104-105)."""
    t = Tables(spark, sf_dir)
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("log_price"),
    )


@register(
    "q_case_when",
    oracle="""
    SELECT CASE WHEN value > 75 THEN 'high'
                WHEN value > 25 THEN 'mid'
                ELSE 'low' END AS bucket,
           count(*) AS n,
           ROUND(AVG(value), 4) AS avg_value
    FROM events
    GROUP BY 1
    """,
    tags=("F6",),
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregation."""
    t = Tables(spark, sf_dir)
    bucket = (
        F.when(F.col("value") > 75, "high").when(F.col("value") > 25, "mid").otherwise("low")
    )
    return (
        t.events.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
    )


@register(
    "q_try_cast",
    oracle="""
    SELECT event_id,
           TRY_CAST(CASE WHEN event_id % 5 = 0 THEN 'not-a-number'
                         ELSE CAST(event_id AS VARCHAR) END AS BIGINT) AS maybe_id,
           TRY_CAST(CASE WHEN event_id % 3 = 0 THEN 'garbage'
                         ELSE '2024-01-15 12:00:00' END AS TIMESTAMP) AS maybe_ts
    FROM events
    """,
    tags=("F7",),
)
def q_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Failure→null casts (the int(ts) except→None rule, producer_stock_quotes.py:92-96)."""
    t = Tables(spark, sf_dir)
    s_num = F.when(F.col("event_id") % 5 == 0, F.lit("not-a-number")).otherwise(
        F.col("event_id").cast("string")
    )
    s_ts = F.when(F.col("event_id") % 3 == 0, F.lit("garbage")).otherwise(
        F.lit("2024-01-15 12:00:00")
    )
    return t.events.select(
        "event_id",
        s_num.try_cast("bigint").alias("maybe_id"),
        s_ts.try_cast("timestamp").alias("maybe_ts"),
    )


@register(
    "q_array_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents
    WHERE doc_id < 200
    """,
    tags=("F8",),
)
def q_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split → explode (array → rows), the news-array explosion (producer_company_news.py:76-79)."""
    t = Tables(spark, sf_dir)
    return (
        t.documents.filter(F.col("doc_id") < 200)
        .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    )


@register(
    "q_array_hof",
    oracle="""
    SELECT event_id,
           ROUND(value + (value * 2 + 1) + (value * 3 + 1) + 1, 4) AS hof_total,
           3 AS arr_size
    FROM events
    """,
    tags=("F8",),
)
def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: transform + aggregate (fold). Oracle computes the closed form."""
    t = Tables(spark, sf_dir)
    arr = F.array(F.col("value"), F.col("value") * 2, F.col("value") * 3)
    plus1 = F.transform(arr, lambda x: x + 1)
    total = F.aggregate(plus1, F.lit(0.0), lambda acc, x: acc + x)
    return t.events.select(
        "event_id",
        F.round(total, 4).alias("hof_total"),
        F.size(arr).alias("arr_size"),
    )


@register(
    "q_map_ops",
    oracle="""
    SELECT event_id,
           value AS base_val,
           value * 2 AS double_val,
           2 AS n_keys
    FROM events
    """,
    tags=("F9",),
)
def q_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + element_at + cardinality. Oracle reproduces the extracted values."""
    t = Tables(spark, sf_dir)
    m = F.create_map(F.lit("base"), F.col("value"), F.lit("double"), F.col("value") * 2)
    return t.events.select(
        "event_id",
        F.element_at(m, "base").alias("base_val"),
        F.element_at(m, "double").alias("double_val"),
        F.size(m).alias("n_keys"),
    )


@register(
    "q_hash_stable",
    oracle="""
    SELECT doc_id,
           sha256(text) AS sha,
           md5(text) AS md5h
    FROM documents
    """,
    tags=("F10",),
)
def q_hash_stable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable content hashes for dedup keys at scale (sha-256, md5)."""
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("sha"),
        F.md5(F.col("text")).alias("md5h"),
    )


@register(
    "q_fn_string_agg",
    oracle="""
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority)
             AS priorities,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("F4", "A8"),
)
def q_fn_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (SQL:2023 LISTAGG): per status, the
    sorted distinct priority list as one delimited string — deterministic
    because the WITHIN GROUP order pins element order (a bare listagg /
    string_agg is partition-order-nondeterministic on both engines and
    could never pass a hash compare). Spark's LISTAGG ... WITHIN GROUP
    and DuckDB's string_agg(... ORDER BY) express the identical
    semantics."""
    t = Tables(spark, sf_dir)
    return t.orders.groupBy("o_orderstatus").agg(
        F.expr(
            "listagg(DISTINCT o_orderpriority, '|') "
            "WITHIN GROUP (ORDER BY o_orderpriority)"
        ).alias("priorities"),
        F.count(F.lit(1)).alias("n"),
    )
