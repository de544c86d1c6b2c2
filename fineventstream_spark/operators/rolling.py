"""Chunked rolling-window evaluation for low-cardinality keys.

A ROWS-frame window partitioned by key serializes each key into one
task: with 5 symbols, a 1000-core cluster runs 5 tasks. That is fine
when key cardinality exceeds cores (the usual 100 TB case) and fatal
when a lake has few, huge keys (index-level series, a handful of
benchmark tickers).

The fix is the classic overlap-chunk decomposition: split each key's
timeline into fixed-width row chunks, REPLICATE the trailing
``frame - 1`` rows of chunk *c* into chunk *c+1* as carry-in context,
then evaluate the frame inside each (key, chunk) partition. Rows keep
their full trailing frame — carried rows contribute to frames but emit
no output — so results are bit-identical to the single-partition window
while parallelism becomes keys × chunks.

Numbering is itself distributed (the round-3 design ran it as a plain
per-key ``row_number`` window — the very serialization being escaped;
each key's full history flowed through ONE task before chunking). The
replacement derives a coarse monotone bucket from the ORDER-COLUMN
VALUES (equi-width between the column's in-plan min/max — a
deterministic expression of the row, so retried tasks and separate plan
branches always agree; a ``spark_partition_id``-based scheme does NOT
survive AQE, which may coalesce the same exchange differently per
consumer), then:

1. per-(key, bucket) row counts — a keys × buckets bookkeeping table;
2. exclusive prefix sums over that tiny table give each bucket's exact
   starting offset within its key (the only per-key-serialized window,
   and it holds counts, not rows);
3. a local ``row_number`` within (key, bucket) plus the joined-back
   offset (broadcast-sized) reconstructs the exact global per-key row
   number at keys × buckets parallelism with ONE payload shuffle —
   the same shuffle count as the serial design.

Bucket skew degrades only parallelism, never correctness: offsets are
exact counts, so ``__rn`` is identical to the serial pass (ties on the
order columns may renumber among themselves — the same nondeterminism a
plain window has) and chunk membership is unchanged.

CONFIG HAZARD (r7 incident, now structurally closed): the first r7 cut
ran the payload join as a co-partitioned SMJ on ``(key, __bkt)``; under
``spark.sql.requireAllClusterKeysForCoPartition=false`` (a NON-default
a consumer session might set), the bookkeeping side's hash(key)
partitioning satisfied the join by SUBSET, dragging the payload down to
key-cardinality parallelism — the exact serialization this operator
exists to escape (measured: 38.7 s vs 7.7 s at sf10 on the zscore
query). The offsets side is keys × buckets — bookkeeping-sized under
this operator's stated contract (key cardinality ≪ rows; a
high-cardinality caller wants the plain window, which already
parallelizes) — so it now BROADCASTS into the payload: no
co-partitioned join exists to collapse, and the fact is sorted once
(for the numbering window) instead of twice (SMJ sort + window sort).
The plan test ``test_numbering_join_partitions_on_key_and_bucket``
still pins the numbering window's exchange to the full ``(key, __bkt)``
cluster keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_value_expr(df: DataFrame, order_col: str) -> Column | None:
    """``order_col`` as a double for range bucketing, or None for types
    with no usable numeric order (falls back to a single bucket — the
    serial per-key window, i.e. round-3 behavior)."""
    dt = dict(df.dtypes).get(order_col, "")
    if dt.startswith("timestamp"):
        # TIMESTAMP_NTZ has no direct double cast; route through TIMESTAMP
        # (a no-op for TIMESTAMP, a monotone session-TZ shift for NTZ —
        # bucketing needs monotonicity only)
        return F.col(order_col).cast("timestamp").cast("double")
    if dt == "date":
        return F.unix_date(F.col(order_col)).cast("double")
    if dt in ("tinyint", "smallint", "int", "bigint", "float", "double") or dt.startswith(
        "decimal"
    ):
        return F.col(order_col).cast("double")
    return None


def _with_order_bucket(df: DataFrame, order_col: str, n_buckets: int) -> DataFrame:
    """Attach a deterministic, monotone ``__bkt`` derived from
    ``order_col``'s value range: equi-WIDTH buckets between the column's
    min and max, both computed IN-PLAN (a 1-row broadcast joined to the
    fact — no eager driver job, no collected sketch; the round-4 first cut
    ran a blocking ``approxQuantile`` per query). Monotone in the value, so
    bucket order == order-column order; rows with equal values share a
    bucket; nulls go to bucket 0 (matching ASC NULLS FIRST). Equi-width vs
    equi-depth trades skew resistance for a cheaper pass: value clustering
    degrades only parallelism (a fat bucket), never correctness — offsets
    are exact counts either way."""
    v = _order_value_expr(df, order_col)
    if v is None:
        return df.withColumn("__bkt", F.lit(0).cast("int"))
    # Non-finite values are pinned to the edge buckets matching Spark's ASC
    # sort order (-inf first; NaN sorts AFTER +inf, both pinned last) and
    # kept out of min/max: a single ±inf in the range would make width
    # inf/NaN, floor() null, and least() would then silently collapse every
    # finite row into one bucket — ordering stays correct but the
    # distributed numbering degrades to a near-serial window.
    inf = float("inf")
    is_finite = (~F.isnan(v)) & (v > F.lit(-inf)) & (v < F.lit(inf))
    finite = F.when(is_finite, v)
    stats = df.agg(F.min(finite).alias("__lo"), F.max(finite).alias("__hi"))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_buckets))
    bkt = (
        F.when(v.isNull() | (v == F.lit(-inf)), F.lit(0))
        .when(F.isnan(v) | (v == F.lit(inf)), F.lit(n_buckets - 1))
        # all-non-finite input leaves __hi/__lo null: null <= null is null,
        # so test __hi explicitly before the arithmetic branch
        .when(F.col("__hi").isNull() | (F.col("__hi") <= F.col("__lo")), F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_buckets - 1),
                F.floor((v - F.col("__lo")) / width).cast("int"),
            )
        )
        .cast("int")
    )
    return (
        df.join(F.broadcast(stats))
        .withColumn("__bkt", bkt)
        .drop("__lo", "__hi")
    )


def with_distributed_row_number(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    out_col: str = "__rn",
    n_buckets: int | None = None,
) -> DataFrame:
    """Attach a 0-based per-key row number ordered by ``order_cols``,
    computed at full parallelism even when one key holds most rows.

    Equivalent to ``row_number().over(partitionBy(keys).orderBy(order)) - 1``
    but never funnels a whole key through a single task: rows are bucketed
    by value ranges of the first order column, numbered locally within each
    (key, bucket) slice, and shifted by the exclusive prefix sum of the
    per-slice counts (a keys × buckets bookkeeping table — broadcast-sized).

    Fully lazy — one plan, no driver round-trips: the bucket boundaries are
    the order column's in-plan min/max (1-row broadcast), plus one narrow
    count pass at execution (key/order columns only, map-side partial
    aggregated)."""
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    bucketed = _with_order_bucket(df, order_cols[0], n_buckets)
    # keys × buckets rows — bookkeeping scale, not data scale; reads only
    # the key/order columns (column pruning) and partial-aggregates map-side
    counts = bucketed.groupBy(*key_cols, "__bkt").agg(F.count(F.lit(1)).alias("__cnt"))
    off_w = (
        Window.partitionBy(*key_cols)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *key_cols,
        "__bkt",
        F.coalesce(F.sum("__cnt").over(off_w), F.lit(0)).alias("__off"),
    )
    local_w = Window.partitionBy(*key_cols, "__bkt").orderBy(*order_cols)
    # offsets is keys × buckets (bookkeeping scale under the operator's
    # low-key-cardinality contract): broadcast it so the payload needs no
    # join exchange/sort — the numbering window's clusterBy(key, __bkt) is
    # then the ONLY fact distribution, and there is no co-partitioned join
    # for subset co-partitioning to collapse (module docstring, r7 hazard)
    return (
        bucketed.join(F.broadcast(offsets), [*key_cols, "__bkt"])
        .withColumn(out_col, F.row_number().over(local_w) - 1 + F.col("__off"))
        .drop("__bkt", "__off")
    )


def chunked_rolling(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    frame_rows: int,
    aggs: dict[str, Column],
    chunk_rows: int = 10_000,
    serial_below_bytes: int | None = None,
) -> DataFrame:
    """Evaluate trailing ``ROWS BETWEEN frame_rows-1 PRECEDING AND CURRENT
    ROW`` aggregates at keys × chunks parallelism.

    ``aggs`` maps output column name → an aggregate Column built over
    ``F.col(...)`` inputs (e.g. ``{"m": F.avg("value")}``); each is
    evaluated ``.over()`` the chunked trailing frame. Results are exactly
    those of the plain per-key window.

    Physical strategy is SIZE-SELECTED like the prefix/lag operators:
    below the serial threshold (``serial_below_bytes`` if given, else the
    ``spark.fineventstream.serialWindowMaxInputBytes`` conf, default
    64 MiB) the plain per-key window evaluates directly — at small inputs
    the numbering + carry-in machinery costs more than it saves (zscore
    at sf0.1: 2.3 s chunked vs sub-second serial); 0 forces chunked."""
    if chunk_rows < frame_rows - 1:
        raise ValueError(
            f"chunk_rows ({chunk_rows}) must be >= frame_rows-1 "
            f"({frame_rows - 1}): a chunk must hold a full carry-in frame"
        )
    threshold = _serial_threshold(df.sparkSession, serial_below_bytes)
    if threshold > 0:
        nbytes = _scan_bytes(df)
        if nbytes is not None and nbytes < threshold:
            w = (
                Window.partitionBy(*key_cols)
                .orderBy(*order_cols)
                .rowsBetween(-(frame_rows - 1), 0)
            )
            return df.select(
                *df.columns, *[expr.over(w).alias(n) for n, expr in aggs.items()]
            )
    numbered = with_distributed_row_number(df, key_cols, order_cols, "__rn")
    numbered = numbered.withColumn("__chunk", (F.col("__rn") / chunk_rows).cast("long"))

    # carry-in: the last frame_rows-1 rows of each chunk ALSO join the next
    # chunk (emit=false) so its early rows see their full trailing frame.
    # Built as a conditional explode — a union of (body, tail-filtered) would
    # duplicate the numbering subtree into both branches and run the narrow
    # pass twice; the explode keeps it a single pass with a Generate node.
    own = F.struct(F.col("__chunk").alias("c"), F.lit(True).alias("e"))
    next_ = F.struct((F.col("__chunk") + 1).alias("c"), F.lit(False).alias("e"))
    in_tail = (F.col("__rn") % chunk_rows) >= chunk_rows - (frame_rows - 1)
    unioned = (
        numbered.select(
            *df.columns,
            F.explode(
                F.when(in_tail, F.array(own, next_)).otherwise(F.array(own))
            ).alias("__dest"),
        )
        .withColumn("__chunk", F.col("__dest.c"))
        .withColumn("__emit", F.col("__dest.e"))
    )

    w = (
        Window.partitionBy(*key_cols, "__chunk")
        .orderBy(*order_cols)
        .rowsBetween(-(frame_rows - 1), 0)
    )
    out = unioned.select(
        *df.columns,
        "__emit",
        *[expr.over(w).alias(name) for name, expr in aggs.items()],
    )
    return out.filter(F.col("__emit")).drop("__emit")


# Below this input size the two-level machinery (bookkeeping aggregate +
# broadcast + merge) costs more than it saves: the whole input sorts in a
# handful of tasks anyway. Measured crossover on the events ladder:
# distributed wins at sf10 (174 MB: drawdown 3.4→2.5 s, gap 5.0→3.3 s) and
# loses at sf0.1 (2 MB: +0.7-0.9 s/query). Unknown input size (non-file
# sources, remote URIs) defaults to DISTRIBUTED — the scale-safe choice.
# Override per session via the conf key (0 disables the serial fallback).
SERIAL_WINDOW_MAX_INPUT_BYTES = 64 << 20
SERIAL_WINDOW_CONF_KEY = "spark.fineventstream.serialWindowMaxInputBytes"


def _serial_threshold(spark, override: int | None) -> int:
    if override is not None:
        return override
    return int(
        spark.conf.get(SERIAL_WINDOW_CONF_KEY, str(SERIAL_WINDOW_MAX_INPUT_BYTES))
    )


def _scan_bytes(df: DataFrame) -> int | None:
    """Total size of the scan's backing files, or None when unknowable.
    Shared with the broadcast guard — see operators/sizing.py (which also
    percent-decodes inputFiles() URIs so exotic paths keep the fast path).
    """
    from fineventstream_spark.operators.sizing import scan_input_bytes

    return scan_input_bytes(df)


def with_distributed_prefix(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    prefix_aggs: dict[str, tuple[str, str]],
    n_buckets: int | None = None,
    serial_below_bytes: int | None = None,
) -> DataFrame:
    """Running (UNBOUNDED PRECEDING) aggregates at keys × buckets
    parallelism — the distributed prefix scan completing the chunked
    family: ``chunked_rolling`` covers bounded trailing frames, this
    covers the unbounded ones (running max/min/sum: drawdown peaks,
    cumulative volume, high-water marks).

    ``prefix_aggs`` maps output name → ("max" | "min" | "sum", value_col).
    Decomposition: rows bucket by order-column value ranges (monotone, so
    every earlier row is in an earlier-or-equal bucket); per-(key, bucket)
    partials form a bookkeeping table whose EXCLUSIVE per-key prefix is
    the carry-in offset; the offset broadcasts back and merges with the
    in-bucket running aggregate (greatest / least / +). With a total
    order (unique tiebreak in ``order_cols``) results are bit-identical
    to the serial window; null handling matches (window aggs skip nulls,
    greatest/least skip nulls, sum stays null only when both sides are).

    Physical strategy is SIZE-SELECTED like a join strategy: inputs under
    the serial threshold (when the scan size is knowable) emit the plain
    serial window — same semantics, no bookkeeping pass. The threshold is
    ``serial_below_bytes`` if given, else the session conf
    ``spark.fineventstream.serialWindowMaxInputBytes`` (default 64 MiB);
    0 forces the distributed form."""
    ops = {"max": F.max, "min": F.min, "sum": F.sum}
    for name, (kind, _) in prefix_aggs.items():
        if kind not in ops:
            raise ValueError(f"unsupported prefix agg {kind!r} for {name!r}")
    spark = df.sparkSession
    threshold = _serial_threshold(spark, serial_below_bytes)
    if threshold > 0:
        nbytes = _scan_bytes(df)
        if nbytes is not None and nbytes < threshold:
            w = (
                Window.partitionBy(*key_cols)
                .orderBy(*order_cols)
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            out = df
            for name, (kind, col) in prefix_aggs.items():
                out = out.withColumn(name, ops[kind](col).over(w))
            return out
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    bucketed = _with_order_bucket(df, order_cols[0], n_buckets)
    partials = bucketed.groupBy(*key_cols, "__bkt").agg(
        *[
            ops[kind](col).alias(f"__p_{name}")
            for name, (kind, col) in prefix_aggs.items()
        ]
    )
    off_w = (
        Window.partitionBy(*key_cols)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = partials.select(
        *key_cols,
        "__bkt",
        *[
            ops[kind](f"__p_{name}").over(off_w).alias(f"__o_{name}")
            for name, (kind, _) in prefix_aggs.items()
        ],
    )
    local_w = (
        Window.partitionBy(*key_cols, "__bkt")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = bucketed.join(F.broadcast(offsets), [*key_cols, "__bkt"])
    for name, (kind, col) in prefix_aggs.items():
        local = ops[kind](col).over(local_w)
        off = F.col(f"__o_{name}")
        if kind == "max":
            merged = F.greatest(local, off)
        elif kind == "min":
            merged = F.least(local, off)
        else:  # sum: null only when BOTH sides carry no non-null input
            merged = F.when(
                local.isNull() & off.isNull(), F.lit(None)
            ).otherwise(F.coalesce(local, F.lit(0)) + F.coalesce(off, F.lit(0)))
        out = out.withColumn(name, merged)
    return out.drop("__bkt", *[f"__o_{n}" for n in prefix_aggs])


def with_distributed_lag(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    lag_cols: dict[str, str],
    n_buckets: int | None = None,
    serial_below_bytes: int | None = None,
) -> DataFrame:
    """``lag(col, 1)`` at keys × buckets parallelism. ``lag_cols`` maps
    output name → source column. Physical strategy is size-selected the
    same way as :func:`with_distributed_prefix` (serial window below the
    threshold; explicit 0 — or the conf key — forces distributed).

    In-bucket lag covers every row except each bucket's first; that row's
    predecessor is the LAST row of the key's previous non-empty bucket,
    recovered from bookkeeping: per-(key, bucket) ``max_by(col,
    struct(order_cols))`` (the bucket-final value), then ``last`` over the
    exclusive per-key bucket prefix — empty buckets never emit a
    bookkeeping row, so the previous finals row IS the previous non-empty
    bucket, and a genuinely-NULL bucket-final value propagates as null
    exactly like serial lag would. The first-row case keys off an explicit
    in-bucket row_number, NOT coalesce, so null lagged values elsewhere
    pass through unchanged."""
    spark = df.sparkSession
    threshold = _serial_threshold(spark, serial_below_bytes)
    if threshold > 0:
        nbytes = _scan_bytes(df)
        if nbytes is not None and nbytes < threshold:
            w = Window.partitionBy(*key_cols).orderBy(*order_cols)
            out = df
            for name, src in lag_cols.items():
                out = out.withColumn(name, F.lag(src).over(w))
            return out
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    bucketed = _with_order_bucket(df, order_cols[0], n_buckets)
    order_struct = F.struct(*[F.col(c) for c in order_cols])
    finals = bucketed.groupBy(*key_cols, "__bkt").agg(
        *[
            F.max_by(src, order_struct).alias(f"__f_{name}")
            for name, src in lag_cols.items()
        ]
    )
    off_w = (
        Window.partitionBy(*key_cols)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = finals.select(
        *key_cols,
        "__bkt",
        *[
            F.last(f"__f_{name}", ignorenulls=False)
            .over(off_w)
            .alias(f"__o_{name}")
            for name in lag_cols
        ],
    )
    local_w = Window.partitionBy(*key_cols, "__bkt").orderBy(*order_cols)
    out = (
        bucketed.join(F.broadcast(offsets), [*key_cols, "__bkt"])
        .withColumn("__rnl", F.row_number().over(local_w))
    )
    for name, src in lag_cols.items():
        out = out.withColumn(
            name,
            F.when(F.col("__rnl") == 1, F.col(f"__o_{name}")).otherwise(
                F.lag(src).over(local_w)
            ),
        )
    return out.drop("__bkt", "__rnl", *[f"__o_{n}" for n in lag_cols])
