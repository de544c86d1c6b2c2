"""J-family: joins (SURVEY §2.3).

The reference never joins its two topics (separate streams, Lambdas, and S3
prefixes — terraform/kinesis.tf:4,24); joining quotes↔news on
(symbol, time) is the intended Athena workload both schemas are shaped
for. All equi-joins are Catalyst's to plan (broadcast-hash vs shuffle-hash
vs sort-merge by stats + AQE); the engine's job is to (a) state the join
declaratively, (b) broadcast what is knowably small, (c) provide the one
composition Spark lacks: the as-of join (operators/asof.py).

Scale: J4 broadcasts the dim side under a size guard (never a forced hint
on a side that grows with the data); J5's range join broadcasts
the tiny band table (a nested-loop join with a non-broadcastable side
would be the classic 100 TB trap); J7 uses the union+window formulation —
one shuffle, no row explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fineventstream_spark.catalog import Tables
from fineventstream_spark.operators.asof import asof_join
from fineventstream_spark.operators.bucketed import bucketed_table
from fineventstream_spark.queries._money import REV_UNITS_SQL, rev_units, sum_money
from fineventstream_spark.registry import register


@register(
    "q_join_inner",
    oracle=f"""
    SELECT o.o_orderkey, o.o_orderdate,
           count(*) AS n_lines,
           ROUND(SUM({REV_UNITS_SQL}) / 10000.0, 4) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    """,
    tags=("J1",),
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style 3-way inner join + aggregation, on the bucketed
    orderkey lake layout (operators/bucketed.py).

    Plan shape (asserted in tests/test_plans.py): ZERO shuffle exchanges —
    orders⋈lineitem is a bucket-co-located SMJ over pre-sorted buckets,
    and the groupBy's key set contains the bucket key, so the aggregation
    reuses the same distribution. The customer clause contributes no
    output columns (c_custkey is unique), so it is a semi-join gate; its
    2-column, one-segment projection is dim-scale relative to the fact
    (1:40 lineitem rows at every SF) and broadcasts — at extreme SF the
    same gate becomes a runtime bloom filter + shuffled semi-join, and
    the bucketed fact join it protects is unchanged. sf10 measured:
    9.6 s (r5 shuffled plan, in-suite) → 1.1 s solo — faster than the
    DuckDB twin (3.3 s)."""
    t = Tables(spark, sf_dir)
    li = bucketed_table(spark, sf_dir, "lineitem")
    od = bucketed_table(spark, sf_dir, "orders")
    cust_keys = F.broadcast(
        t.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    )
    orders_gated = od.join(
        cust_keys, od.o_custkey == cust_keys.c_custkey, "left_semi"
    )
    return (
        orders_gated.join(li, F.col("o_orderkey") == F.col("l_orderkey"), "inner")
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.count("*").alias("n_lines"),
            # exact integer 1e-4 units (r9): a per-ORDER group is unbounded
            # under key skew — the zipf fixture's hot order holds 11M lines
            # and the float sum diverges from DuckDB past the 4-dp grid
            # (…295.3737 vs …295.3931); uniform fixtures cap groups at
            # Poisson(4) so this class was unreachable before
            sum_money(rev_units("l_extendedprice", "l_discount"), 4).alias("revenue"),
        )
    )


@register(
    "q_join_enrich_priority",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents,
           ROUND(SUM(l.l_quantity), 4) AS total_qty,
           CAST(SUM(CAST(ROUND(l.l_tax * 10000) AS BIGINT)) AS BIGINT)
             AS tax_units,
           MIN(l.l_shipdate) AS first_ship,
           MAX(l.l_shipdate) AS last_ship
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
    tags=("J1", "X16"),
)
def q_join_enrich_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-enrichment join: every lineitem row carries its order's
    priority through the join, and the aggregation consumes a wide INPUT
    slice of the fact row (price, quantity, tax, ship date) grouped by a
    NON-bucket key — added in r10 to settle which side of the
    skew-routing policy (operators/bucketed.py) this shape belongs to.

    Measured answer (interleaved min-of-3 on the 18%-hot zipf sf10
    fixture): forced-bucketed 6.5 s vs routed shuffle+AQE 10.6 s — the
    LAYOUT wins 1.6×, so this query does NOT opt into routing. The
    refinement over the E2 evidence: what makes a consumer
    routing-favored is per-row post-join CPU (E2 xxhashes every column
    per row), not how many input columns the aggregation reads. Cheap
    per-row work (sums/min/max here) partial-aggregates inside the hot
    bucket's task, so the zero-exchange SMJ still dominates; the plan is
    the bucket-co-located SMJ with a single 5-row post-agg exchange, and
    AQE's skew threshold (256 MB) correctly never fires on the pruned
    shuffle row of the routed alternative either."""
    li = bucketed_table(spark, sf_dir, "lineitem")
    od = bucketed_table(spark, sf_dir, "orders")
    return (
        li.join(
            od.select("o_orderkey", "o_orderpriority").hint("merge"),
            F.col("o_orderkey") == F.col("l_orderkey"),
            "inner",
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "price_cents"
            ),
            F.round(F.sum("l_quantity"), 4).alias("total_qty"),
            F.sum(F.round(F.col("l_tax") * 10000).cast("long")).alias("tax_units"),
            F.min("l_shipdate").alias("first_ship"),
            F.max("l_shipdate").alias("last_ship"),
        )
    )


@register(
    "q_join_left",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice,
           l.n_lines, l.sum_qty
    FROM orders o
    LEFT JOIN (
        SELECT l_orderkey, count(*) AS n_lines, ROUND(SUM(l_quantity), 4) AS sum_qty
        FROM lineitem GROUP BY l_orderkey
    ) l ON o.o_orderkey = l.l_orderkey
    """,
    tags=("J2",),
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join against a pre-aggregated fact (nulls preserved for childless orders)."""
    t = Tables(spark, sf_dir)
    per_order = t.lineitem.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"), F.round(F.sum("l_quantity"), 4).alias("sum_qty")
    )
    return (
        t.orders.join(per_order, t.orders.o_orderkey == per_order.l_orderkey, "left")
        .select("o_orderkey", "o_totalprice", "n_lines", "sum_qty")
    )


@register(
    "q_join_full",
    oracle="""
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           c.n_cust, s.n_supp
    FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust FROM customer GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_supp FROM supplier GROUP BY 1) s
    ON c.nationkey = s.nationkey
    """,
    tags=("J2",),
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates (both null-sides exercised)."""
    t = Tables(spark, sf_dir)
    c = t.customer.groupBy(F.col("c_nationkey").alias("nationkey")).agg(F.count("*").alias("n_cust"))
    s = t.supplier.groupBy(F.col("s_nationkey").alias("nationkey")).agg(F.count("*").alias("n_supp"))
    return c.join(s, c.nationkey == s.nationkey, "full").select(
        F.coalesce(c.nationkey, s.nationkey).alias("nationkey"), "n_cust", "n_supp"
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
    tags=("J3",),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join = EXISTS (no right columns, no duplication)."""
    t = Tables(spark, sf_dir)
    big_orders = t.orders.filter(F.col("o_totalprice") > 100000)
    return t.customer.join(
        big_orders, t.customer.c_custkey == big_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("J3",),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join = NOT EXISTS — also the batch form of dedup-against-seen-set
    (reference producer_company_news.py:133-135)."""
    t = Tables(spark, sf_dir)
    return t.customer.join(
        t.orders, t.customer.c_custkey == t.orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q_join_broadcast",
    oracle="""
    SELECT p.p_brand,
           count(*) AS n_lines,
           ROUND(SUM(l.l_quantity), 4) AS sum_qty
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    tags=("J4",),
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-enrichment join, physical strategy picked by LAYOUT, not hint.

    The r7 verdict's one named scale-killer was this query's forced
    ``F.broadcast(part)``: ``part`` grows with the data (~1:30 to
    lineitem), so at 100 TB the hint exceeds Spark's 8 GB broadcast hard
    limit and OOMs the driver. The fix is two-level:

    1. The engine's GENERAL dim-join rule is now a size guard
       (``operators/sizing.py:maybe_broadcast``): hint only what is
       knowably small at plan time, else let AQE pick from runtime stats.
    2. For THIS workload — a fact repeatedly enriched on a key it isn't
       laid out by — the lake answers with a covering projection
       (``ensure_bucketed(columns=...)``): (l_partkey, l_quantity)
       bucket-sorted by partkey, joined to partkey-bucketed ``part`` as a
       zero-exchange, zero-sort SMJ. No fact shuffle at any scale AND no
       broadcast relation build (driver-serial, O(|dim|), on the critical
       path of every query that hints one).

    Measured at sf30 solo (180 M lineitem × 6 M part, warmed, min-of-3;
    DuckDB twin 1.44 s):
    - co-located projection SMJ: **1.28 s**  ← this plan
    - guarded broadcast, direct p_brand agg: 6.0–8.1 s (build 3.1 s
      driver-serial + ~2.5 s probe + ~2 s string-key agg tax)
    - partial agg by l_partkey below the join (the textbook rewrite):
      11.9 s — WORSE: at ~30 rows/key per task, map-side combine barely
      reduces and the 6 M-key shuffle + per-task hash tables cost more
      than the probe they save
    - shuffle-hash join: 5.8 s — parallel build, but shuffles the fact
      (the 100 TB trap)
    """
    li = bucketed_table(
        spark, sf_dir, "lineitem", key="l_partkey", columns=("l_partkey", "l_quantity")
    )
    pt = bucketed_table(spark, sf_dir, "part", key="p_partkey").select(
        "p_partkey", "p_brand"
    )
    return (
        li.join(pt.hint("merge"), F.col("l_partkey") == F.col("p_partkey"), "inner")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_lines"), F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
    )


_BANDS = [
    ("budget", 0.0, 50_000.0),
    ("mid", 50_000.0, 150_000.0),
    ("premium", 150_000.0, 300_000.0),
    ("luxury", 300_000.0, 1e12),
]


@register(
    "q_join_range",
    oracle="""
    SELECT b.band_name, count(*) AS n_orders,
           ROUND(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) / 100.0, 4) AS band_total
    FROM orders o
    JOIN (VALUES ('budget', 0.0, 50000.0),
                 ('mid', 50000.0, 150000.0),
                 ('premium', 150000.0, 300000.0),
                 ('luxury', 300000.0, 1e12)) AS b(band_name, lo, hi)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band_name
    """,
    tags=("J5",),
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join against a broadcast band table.

    Physical plan: BroadcastNestedLoopJoin with the 4-row side broadcast —
    the only sane shape for theta joins at scale. Band totals are summed
    in integer cents on both engines: the luxury band aggregates ~40% of
    all orders, and a float sum that large carries summation-order noise
    past the 4-dp rounding grid (caught by the sf1 sweep — see
    q_agg_global).
    """
    t = Tables(spark, sf_dir)
    bands = spark.createDataFrame(_BANDS, "band_name string, lo double, hi double")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        t.orders.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
            "inner",
        )
        .groupBy("band_name")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum(cents) / 100.0, 4).alias("band_total"))
    )


@register(
    "q_join_cross",
    oracle="""
    SELECT r.r_name, s.o_orderstatus
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
    tags=("J6",),
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two tiny sets."""
    t = Tables(spark, sf_dir)
    statuses = t.orders.select("o_orderstatus").distinct()
    return t.region.select("r_name").crossJoin(statuses)


@register(
    "q_join_asof",
    oracle="""
    WITH c AS (
      SELECT user_id, ts, arg_max(value, event_id) AS click_value
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ), p AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.value, c.click_value AS click_value_asof
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("J7",),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click value at-or-before it per user
    (the quotes↔news pattern). Union+window formulation — one shuffle, no explosion.

    Oracle form (r9): DuckDB native ASOF over a tie-deduplicated right
    side — ``arg_max(value, event_id)`` per (user, ts) is exactly the
    operator's ``ORDER BY ts DESC, event_id DESC`` tie rule. The previous
    correlated-scalar-subquery oracle was quadratic per hot key: on the
    zipf fixture's 18%-hot user it OOM-killed the whole differential run
    (same oracle-form blowup class as Q21's double-EXISTS)."""
    t = Tables(spark, sf_dir)
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = t.events.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts"), F.col("value").alias("click_value"), F.col("event_id")
    )
    joined = asof_join(
        purchases,
        clicks.select("user_id", "ts", "click_value", "event_id"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_values=["click_value"],
        right_tiebreak="event_id",
        suffix="_asof",
    )
    return joined.select("event_id", "user_id", "value", "click_value_asof")


@register(
    "q_join_asof_tolerance",
    oracle="""
    WITH c AS (
      SELECT user_id, ts, arg_max(value, event_id) AS click_value
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ), p AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.value,
           CASE WHEN c.ts >= p.ts - INTERVAL 1 DAY THEN c.click_value END
             AS click_value_asof
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("J7",),
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-lookback as-of join (pandas ``merge_asof(tolerance=...)``
    semantics): the latest click at-or-before each purchase per user,
    but only if it happened within the last day — older matches become
    null. Same union+window plan as q_join_asof (one shuffle, no row
    explosion); the bound is a post-window mask on the matched row's
    carried timestamp, NOT an extra join — the marginal cost of the
    tolerance at 100 TB is zero."""
    t = Tables(spark, sf_dir)
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = t.events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value"), "event_id"
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_values=["click_value"],
        right_tiebreak="event_id",
        suffix="_asof",
        tolerance="1 DAY",
    )
    return joined.select(
        "event_id", "user_id", "value", F.col("click_value_asof").alias("click_value_asof")
    )


@register(
    "q_join_asof_forward",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    )
    SELECT p.user_id, p.event_id, p.ts,
           ROUND(c.value, 4) AS next_click_value
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND c.ts >= p.ts
    """,
    tags=("J7", "Y32"),
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (J7 completion; pandas ``merge_asof(
    direction='forward')``): for each purchase, the user's EARLIEST
    click at-or-after it — the lookahead twin of the backward as-of
    (label generation, slippage measurement: "what happened next").
    No new operator: the backward as-of runs on a NEGATED time axis
    (latest at-or-before of -t is earliest at-or-after of t), so the
    plan is the same union + one shuffle + keyed window and the tie
    handling transfers directly. (A lookback tolerance would need to be
    expressed as negated MICROSECONDS, not an SQL interval — the
    operator's interval mask subtracts from the ts axis, which is a
    bigint here.) Oracle: DuckDB's native forward ASOF (c.ts >= p.ts);
    event_id tiebreak pins Spark-side determinism should a fixture ever
    carry duplicate (user_id, ts)."""
    from fineventstream_spark.operators.asof import asof_join

    t = Tables(spark, sf_dir)
    neg = lambda c: (-F.unix_micros(F.col(c))).alias("__nts")  # noqa: E731
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", neg("ts")
    )
    clicks = t.events.filter(F.col("event_type") == "click").select(
        "user_id", "value", "event_id", neg("ts")
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="__nts",
        right_ts="__nts",
        right_values=["value"],
        right_tiebreak="event_id",
    )
    return joined.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value_asof"), 4).alias("next_click_value"),
    )
