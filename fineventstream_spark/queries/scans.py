"""S-family: sources / scans / sinks (SURVEY §2.1).

The reference's lake is hive-partitioned JSONL on S3
(reference: src/lambda_processor/processor_stock_quotes.py:64-83); the
engine's native format is parquet with the same partition discipline.
Derived JSONL/partitioned copies are materialized once per scale factor
under ``.cache/`` (inside the repo) so scan queries are reproducible and
cheap on re-run.

Scale notes (100 TB): every query here is a pure scan→filter→agg pipeline;
correctness of the *plan* matters more than the code — filters must reach
the parquet reader (PushedFilters), projection must prune columns
(ReadSchema), and partition filters must prune directories before any task
launches. All three are verified in tests/test_plans.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fineventstream_spark.catalog import Tables, load_table, source_fingerprint
from fineventstream_spark.registry import register

_CACHE_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".cache")

# Spark's default JSON timestamp format truncates to millis; the lake keeps
# microseconds, so pin a micro-preserving format on both write and read.
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

EVENTS_JSON_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _cache_dir(sf_dir: str, name: str, fingerprint: str = "") -> str:
    """Derived-copy cache path, keyed on the SOURCE fingerprint
    (schema × data — catalog.source_fingerprint).

    The fingerprint keys the directory name so a change in the lake's
    source schema, catalog normalization semantics, OR the source data
    itself regenerates the derivative instead of silently reusing a stale
    one (round-2 lesson: a ``_SUCCESS``-gated JSONL copy outlived a
    timestamp-type change; round-5 advisor: a schema-only key would serve
    stale rows after a same-schema fixture regeneration). Pure path
    arithmetic — stale-sibling pruning happens in
    :func:`_prune_stale_siblings`, only after a replacement is fully
    written."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    leaf = f"{name}-{fingerprint}" if fingerprint else name
    return os.path.join(_CACHE_ROOT, sf_name, leaf)


def _prune_stale_siblings(path: str, name: str) -> None:
    """Reclaim superseded derivatives of ``name`` (other fingerprints and
    pre-fingerprint unsuffixed leftovers) — called only AFTER the new
    derivative at ``path`` is fully written, so a concurrent session with
    a different fingerprint is never raced between planning and executing
    a lazy read of its own (still valid) derivative by a session that has
    not yet produced its replacement (round-3 ADVICE)."""
    import shutil

    parent, leaf = os.path.split(path)
    if not os.path.isdir(parent):
        return
    for entry in os.listdir(parent):
        if entry != leaf and (entry == name or entry.startswith(f"{name}-")):
            shutil.rmtree(os.path.join(parent, entry), ignore_errors=True)


def _events_jsonl_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize events as JSONL once (S7-style sink), return the path."""
    ev = load_table(spark, sf_dir, "events")
    path = _cache_dir(sf_dir, "events_jsonl", source_fingerprint(ev, sf_dir, "events"))
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            ev.write.mode("overwrite")
            .option("timestampFormat", _TS_FMT)
            .json(path)
        )
        _prune_stale_siblings(path, "events_jsonl")
    return path


def _events_partitioned_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize events under year=/month=/day= hive partitions (S6/S7).

    Mirrors the reference's arrival-hour partition layout
    (processor_stock_quotes.py:68-73) but keyed on *event* time, which is
    what an analytics lake wants for pruning.
    """
    ev = load_table(spark, sf_dir, "events")
    path = _cache_dir(sf_dir, "events_partitioned", source_fingerprint(ev, sf_dir, "events"))
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            ev.withColumn("year", F.year("ts"))
            .withColumn("month", F.month("ts"))
            .withColumn("day", F.dayofmonth("ts"))
            .write.mode("overwrite")
            .partitionBy("year", "month", "day")
            .parquet(path)
        )
        _prune_stale_siblings(path, "events_partitioned")
    return path


def events_shredded(spark: SparkSession, sf_dir: str):
    """Events with the hot JSON field shredded into a typed column —
    the lake's shred-on-ingest step, materialized once per source
    fingerprint.

    ``props.$.k`` is the quote-size field every VWAP-family query needs
    (reference src/producer/producer_stock_quotes.py payloads carry
    price+size); parsing it from the JSON string at query time is the
    single largest per-query cost left in the event family (measured at
    sf1: ~2 s of ``get_json_object`` per pass — from_json/variant
    measure the same, so it is a storage-format floor, not a plan
    problem). At 100 TB the fix is exactly this derivative: hot fields
    become parquet columns at ingest, the raw ``props`` string stays for
    cold fields, and every downstream query reads the column. Returns
    the shredded DataFrame (schema = events + ``props_k double``)."""
    ev = load_table(spark, sf_dir, "events")
    path = _cache_dir(sf_dir, "events_shredded", source_fingerprint(ev, sf_dir, "events"))
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            ev.withColumn(
                "props_k", F.get_json_object("props", "$.k").cast("double")
            )
            .write.mode("overwrite")
            .parquet(path)
        )
        _prune_stale_siblings(path, "events_shredded")
    return spark.read.parquet(path)


@register(
    "q_scan_parquet",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_discount > 0.05
    """,
    tags=("S5",),
    doc="Columnar scan with predicate pushdown + column pruning.",
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1995-06-01").cast("timestamp")) & (F.col("l_discount") > 0.05)
    ).select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")


@register(
    "q_scan_json",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props FROM events
    """,
    tags=("S4",),
    doc="JSONL lake scan with explicit schema (no inference pass) — lossless roundtrip.",
)
def q_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _events_jsonl_path(spark, sf_dir)
    return (
        spark.read.schema(EVENTS_JSON_SCHEMA)
        .option("timestampFormat", _TS_FMT)
        .json(path)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )


@register(
    "q_source_decode_json",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events
    """,
    tags=("S3", "F1", "F2"),
    doc=(
        "Kinesis-envelope decode re-expressed: base64(json) payloads → "
        "unbase64 → from_json → typed columns "
        "(reference: processor_stock_quotes.py:32-62)."
    ),
)
def q_source_decode_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    payload_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    # encode exactly like the producer (json.dumps → bytes → base64,
    # reference producer_stock_quotes.py:132 / Kinesis envelope), then run
    # the engine's decode path.
    enveloped = t.events.select(
        F.col("user_id").cast("string").alias("partition_key"),
        F.base64(
            F.to_json(F.struct("event_id", "user_id", "event_type", "value")).cast("binary")
        ).alias("data"),
    )
    decoded = enveloped.select(
        F.from_json(F.unbase64(F.col("data")).cast("string"), payload_schema).alias("rec")
    )
    return decoded.select("rec.event_id", "rec.user_id", "rec.event_type", "rec.value").filter(
        F.col("event_id").isNotNull()
    )


@register(
    "q_scan_partition_prune",
    oracle="""
    SELECT CAST(year(ts) AS INTEGER) AS year,
           CAST(month(ts) AS INTEGER) AS month,
           CAST(day(ts) AS INTEGER) AS day,
           count(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    WHERE day(ts) <= 10
    GROUP BY 1, 2, 3
    """,
    tags=("S6",),
    doc="Hive-partitioned scan; the day<=10 filter prunes directories before any task runs.",
)
def q_scan_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _events_partitioned_path(spark, sf_dir)
    df = spark.read.parquet(path)
    return (
        df.filter(F.col("day") <= 10)
        .groupBy(
            F.col("year").cast("int").alias("year"),
            F.col("month").cast("int").alias("month"),
            F.col("day").cast("int").alias("day"),
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


@register(
    "q_sink_partitioned_write",
    # the sink+rescan is internal; the observable result (per-partition
    # counts) has an exact relational twin
    oracle="""
    SELECT l_returnflag, count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("S7", "T7"),
    doc=(
        "Partitioned JSONL sink + re-scan (reference sink: "
        "processor_stock_quotes.py:64-83). Returns per-partition file counts."
    ),
)
def q_sink_partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    path = _cache_dir(sf_dir, "lineitem_jsonl_by_flag", source_fingerprint(t.lineitem, sf_dir, "lineitem"))
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            t.lineitem.select("l_orderkey", "l_quantity", "l_returnflag")
            .write.mode("overwrite")
            .partitionBy("l_returnflag")
            .json(path)
        )
        _prune_stale_siblings(path, "lineitem_jsonl_by_flag")
    back = spark.read.schema("l_orderkey long, l_quantity double, l_returnflag string").json(path)
    return back.groupBy("l_returnflag").agg(F.count("*").alias("n_rows"))


@register(
    "q_scan_csv",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
    FROM orders
    """,
    tags=("S4",),
    doc="CSV lake scan with explicit schema — lossless roundtrip vs the parquet source.",
)
def q_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    path = _cache_dir(sf_dir, "orders_csv", source_fingerprint(orders, sf_dir, "orders"))
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            orders
            .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
            .write.mode("overwrite")
            .option("header", "true")
            .csv(path)  # o_orderdate is ms-precision: default format is lossless
        )
        _prune_stale_siblings(path, "orders_csv")
    return (
        spark.read.schema(
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp"
        )
        .option("header", "true")
        .csv(path)
    )


@register(
    "q_news_lookback",
    oracle="""
    WITH bounds AS (SELECT MAX(ts) AS hi FROM events)
    SELECT user_id,
           count(*) AS n_articles,
           MIN(ts) AS first_seen,
           MAX(ts) AS last_seen
    FROM events, bounds
    WHERE ts >= hi - INTERVAL 2 DAY AND ts <= hi
    GROUP BY user_id
    """,
    tags=("S2", "F3"),
    doc=(
        "The news producer's date-ranged lookback re-expressed: compute the "
        "[end - 2 days, end] fetch window (reference "
        "producer_company_news.py:213-217), keep only records inside it, "
        "aggregate per key. Streaming twin: sources/polling.py::poll_news_stream."
    ),
)
def q_news_lookback(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    # scalar "today" bound as a 1-row broadcast (no collect on the driver)
    bounds = t.events.agg(F.max("ts").alias("hi"))
    ev = t.events.crossJoin(F.broadcast(bounds))
    return (
        ev.filter(
            (F.col("ts") >= F.col("hi") - F.expr("INTERVAL 2 DAYS"))
            & (F.col("ts") <= F.col("hi"))
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_articles"),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
        )
    )


@register(
    "q_sql_api",
    oracle="""
    SELECT n.n_name AS nation, count(*) AS n_customers, ROUND(SUM(c.c_acctbal), 4) AS total_balance
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("P7", "J1"),
    doc="spark.sql() over registered lake views — the Athena-style SQL entry point.",
)
def q_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fineventstream_spark.catalog import register_views

    register_views(spark, sf_dir, names=("customer", "nation"))
    return spark.sql(
        """
        SELECT n.n_name AS nation, count(*) AS n_customers,
               ROUND(SUM(c.c_acctbal), 4) AS total_balance
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


def _documents_drift_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize two schema generations of documents (S4/S5 drift form).

    Real lakes drift: early producers wrote (doc_id, text, lang); later
    ones added source. The reference's lake has exactly this property —
    schemaless JSONL whose field set is producer-version-dependent
    (processor_company_news.py:37-38 "trusts producer format"). Gen 1 =
    even doc_ids without the source column, gen 2 = odd doc_ids with it.
    """
    docs = load_table(spark, sf_dir, "documents")
    path = _cache_dir(sf_dir, "documents_drift", source_fingerprint(docs, sf_dir, "documents"))
    if not os.path.exists(os.path.join(path, "gen=2", "_SUCCESS")):
        docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text", "lang").write.mode(
            "overwrite"
        ).parquet(os.path.join(path, "gen=1"))
        docs.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id", "text", "lang", "source"
        ).write.mode("overwrite").parquet(os.path.join(path, "gen=2"))
        _prune_stale_siblings(path, "documents_drift")
    return path


@register(
    "q_scan_schema_drift",
    oracle="""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(source) AS BIGINT) AS n_with_source
    FROM (
      SELECT lang, NULL AS source FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT lang, source FROM documents WHERE doc_id % 2 = 1
    ) gens
    GROUP BY lang
    """,
    tags=("S4", "S5"),
)
def q_scan_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift-tolerant lake scan: one read over parquet files whose
    schemas differ (a later producer generation added the ``source``
    column), via ``mergeSchema`` — missing columns surface as nulls, no
    backfill rewrite of the old files. Column pruning still applies: the
    merged scan reads only (lang, source), not text. At 100 TB schema
    evolution by union-of-footers is the only affordable option — a
    rewrite of historical partitions is a full-lake write."""
    path = _documents_drift_path(spark, sf_dir)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    return (
        merged.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("source").alias("n_with_source"),
        )
    )


@register(
    "q_scan_orc",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate <  TIMESTAMP '1998-02-01'
    """,
    tags=("S5",),
    doc=(
        "ORC lake scan (S5 sibling): the engine is format-agnostic — the "
        "same declarative plan gets predicate pushdown + column pruning "
        "from Spark's native ORC reader as from parquet. The ORC copy is "
        "a .cache/ derivative keyed on the source schema fingerprint."
    ),
)
def q_scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_shipdate"]
    path = _cache_dir(sf_dir, "lineitem_orc", source_fingerprint(li, sf_dir, "lineitem"))
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        li.select(*cols).write.mode("overwrite").orc(path)
        _prune_stale_siblings(path, "lineitem_orc")
    return spark.read.orc(path).filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-02-01").cast("timestamp"))
    )


def _events_nested_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize a NESTED parquet derivative of events: struct user
    {id, segment, noise}, struct metrics {value}, array tags — the shape
    a modern lake actually stores (nested payloads at rest, not flat
    columns). ``noise`` exists solely so nested-field pruning has
    something to prune."""
    ev = load_table(spark, sf_dir, "events")
    path = _cache_dir(sf_dir, "events_nested", source_fingerprint(ev, sf_dir, "events"))
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        nested = ev.select(
            "event_id",
            F.struct(
                F.col("user_id").alias("id"),
                F.col("event_type").alias("segment"),
                F.lit("unused-payload").alias("noise"),
            ).alias("user"),
            F.struct(F.col("value").alias("value")).alias("metrics"),
            F.array(
                F.col("event_type"),
                F.when(F.col("event_id") % 2 == 0, "even").otherwise("odd"),
            ).alias("tags"),
        )
        nested.write.mode("overwrite").parquet(path)
        _prune_stale_siblings(path, "events_nested")
    return path


@register(
    "q_scan_nested",
    oracle="""
    SELECT event_id, user_id, event_type AS segment,
           unnest([event_type,
                   CASE WHEN event_id % 2 = 0 THEN 'even' ELSE 'odd' END])
             AS tag
    FROM events
    """,
    tags=("S5", "F8", "F9"),
)
def q_scan_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-column lake scan: struct dot-path projection + array
    explode over a nested parquet derivative (struct user{id, segment,
    noise}, array tags). The plan contract is NESTED-FIELD PRUNING: the
    scan's ReadSchema must carry user<id,segment> WITHOUT the unread
    ``noise`` field and skip the metrics struct entirely — at 100 TB a
    fat payload struct read for a 2-field projection is the same bug as
    reading all top-level columns. The oracle reconstructs the nested
    semantics from the flat events view (the derivative's path is
    fingerprint-keyed, so static SQL cannot reference it)."""
    path = _events_nested_path(spark, sf_dir)
    nested = spark.read.parquet(path)
    return nested.select(
        "event_id",
        F.col("user.id").alias("user_id"),
        F.col("user.segment").alias("segment"),
        F.explode("tags").alias("tag"),
    )


@register(
    "q_source_datasource_quotes",
    oracle="""
    WITH sym(symbol, base) AS (VALUES
      ('AAPL', 136), ('MSFT', 64), ('GOOGL', 126),
      ('AMZN', 60), ('NVDA', 147), ('META', 145)
    ), seqs AS (SELECT unnest(range(0, 50)) AS seq)
    SELECT symbol, CAST(seq AS BIGINT) AS seq,
           base + (seq * 7 % 13) * 0.25 AS price,
           0.25 AS change,
           base + (seq * 7 % 13) * 0.25 + 1 AS high,
           base + (seq * 7 % 13) * 0.25 - 1 AS low,
           base + (seq * 7 % 13) * 0.25 - 0.5 AS open,
           base + (seq * 7 % 13) * 0.25 - 0.25 AS prev_close,
           CAST(1704067200 + seq * 60 AS BIGINT) AS quote_ts_unix
    FROM sym CROSS JOIN seqs
    """,
    tags=("S1", "S3"),
)
def q_source_datasource_quotes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quote feed as a FIRST-CLASS Spark data source (Spark 4 Python
    DataSource API, sources/datasource.py): ``spark.read.format(
    "fineventstream_quotes")`` with one InputPartition per symbol, so
    fetches run on executors instead of the reference's driver-side
    symbol loop (producer_stock_quotes.py:122-124); the same class
    serves ``readStream`` with replayable tick-counter offsets. The
    oracle is the fetcher's spec (pure arithmetic on (symbol, seq)) —
    the source must produce exactly the frame the spec describes.
    change/d p columns are exact binary fractions (k*0.25), so no
    rounding is needed anywhere."""
    from fineventstream_spark.sources.datasource import QuoteDataSource

    try:
        spark.dataSource.register(QuoteDataSource)
    except Exception as exc:
        # duplicate registration in a reused session is expected; anything
        # else must stay visible — the later format("...") lookup would
        # otherwise fail with an unrelated "source not found"
        import warnings

        warnings.warn(f"QuoteDataSource registration: {exc}", stacklevel=2)
    return (
        spark.read.format("fineventstream_quotes")
        .option("ticks_per_symbol", 50)
        .load()
    )


def _q5_prejoin_layout(spark: SparkSession, sf_dir: str) -> str:
    """Build the Q5 pre-join projection — spec owned by
    operators/bucketed.py::q5_prejoin_spec (one definition, r10)."""
    from fineventstream_spark.operators.bucketed import ensure_bucketed, q5_prejoin_spec

    spec = q5_prejoin_spec()
    return ensure_bucketed(spark, sf_dir, spec.pop("table"), **spec)


def prewarm_derivatives(spark: SparkSession, sf_dir: str) -> None:
    """Materialize every ``.cache/`` derivative for ``sf_dir`` up front.

    Benchmarks and fixtures call this once so no timed query pays the
    one-off derivative build (round-3 driver bench charged the
    partitioned-events rebuild to ``q_scan_partition_prune``: 0.74 s
    recorded vs 0.40 s solo). The inline-materializing query fns write
    eagerly at construction time, so invoking them (without executing
    the returned plan) is sufficient.

    ``SPARK_GRAFT_PREWARM_SKIP`` (comma-separated names from the keys
    below) skips individual derivatives: at giant fixture scales (sf60+)
    the full derivative set no longer fits the sandbox disk, so a
    curve-point run prewarm only what its query list reads — the skipped
    queries are then excluded from that run and the exclusion recorded
    in BASELINE.md."""
    import os as _os

    skip = {
        s.strip()
        for s in _os.environ.get("SPARK_GRAFT_PREWARM_SKIP", "").split(",")
        if s.strip()
    }
    from fineventstream_spark.operators.bucketed import BUCKET_KEYS, ensure_bucketed
    from fineventstream_spark.registry import REGISTRY

    steps: dict[str, object] = {
        "events_jsonl": lambda: _events_jsonl_path(spark, sf_dir),
        "events_partitioned": lambda: _events_partitioned_path(spark, sf_dir),
        "documents_drift": lambda: _documents_drift_path(spark, sf_dir),
        "events_nested": lambda: _events_nested_path(spark, sf_dir),
        "events_shredded": lambda: events_shredded(spark, sf_dir),
        "bucketed": lambda: [ensure_bucketed(spark, sf_dir, t) for t in BUCKET_KEYS],
        # the r8 part-enrichment layouts (q_join_broadcast): partkey-bucketed
        # part + the narrow partkey covering projection of lineitem
        "partkey_layouts": lambda: [
            ensure_bucketed(spark, sf_dir, "part", key="p_partkey"),
            ensure_bucketed(
                spark, sf_dir, "lineitem",
                key="l_partkey", columns=("l_partkey", "l_quantity"),
            ),
        ],
        # the r9 Q5 pre-join projection: supplier nationkey + exact-money
        # rev_units materialized in lineitem's orderkey bucket order
        "q5_prejoin_layout": lambda: _q5_prejoin_layout(spark, sf_dir),
        "sink": lambda: REGISTRY["q_sink_partitioned_write"].fn(spark, sf_dir),
        "orders_csv": lambda: REGISTRY["q_scan_csv"].fn(spark, sf_dir),
        "lineitem_orc": lambda: REGISTRY["q_scan_orc"].fn(spark, sf_dir),
    }
    for name, step in steps.items():
        if name not in skip:
            step()
