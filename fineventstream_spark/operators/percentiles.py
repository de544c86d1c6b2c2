"""Exact percentiles via range-bucketed rank + interpolation.

Naive exact percentiles (``Window.partitionBy(group).orderBy(value)``)
concentrate each group's entire sort in ONE task — with 3 groups over a
100 TB fact table that is 3 straggler tasks and an OOM. Spark's built-in
``percentile`` aggregate buffers every (value, count) of a group in one
aggregation buffer — same concentration, different operator.

This formulation spreads the work over ``n_groups × n_buckets`` tasks:

1. one partial-agg pass computes per-group (min, max, count);
2. each row is assigned a uniform value-range bucket (``width_bucket`` —
   pure JVM codegen, no sampling pass);
3. per-(group, bucket) counts → cumulative offsets (tiny: one row per
   bucket) tell each bucket how many rows precede it;
4. ``row_number`` within (group, bucket) + the broadcast offset yields the
   *global* rank of every row — the sort shuffle now lands on
   ``n_groups × n_buckets`` reducers instead of ``n_groups``;
5. only the two rows bracketing each requested rank contribute
   ``(1-frac)·v_lo + frac·v_hi`` (linear interpolation), summed by a
   map-side-combined groupBy.

Result is identical to built-in ``percentile`` / DuckDB ``quantile_cont``.
Skewed *value* distributions make buckets uneven but never wrong; a
pathological single-value group collapses to one bucket whose "sort" is
trivial. At 100 TB with truly continuous hot groups, raise ``n_buckets``
or use ``percentile_approx`` (mergeable sketch, see
q_agg_approx_percentile) — this is the fast *exact* option.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: list[float],
    aliases: list[str] | None = None,
    decimals: int = 4,
    n_buckets: int = 32,
) -> DataFrame:
    """Per-group exact percentiles (linear interpolation, nulls ignored —
    DuckDB ``quantile_cont`` semantics), one output row per group with one
    column per requested percentile."""
    aliases = aliases or [f"p{int(p * 100)}" for p in ps]
    src = df.select(group_col, value_col).filter(F.col(value_col).isNotNull())

    stats = src.groupBy(group_col).agg(
        F.min(value_col).alias("__mn"),
        F.max(value_col).alias("__mx"),
        F.count("*").alias("__n"),
    )
    b = src.join(F.broadcast(stats), group_col).withColumn(
        "__b",
        F.when(F.col("__mx") == F.col("__mn"), F.lit(1)).otherwise(
            F.least(
                F.lit(n_buckets),
                F.width_bucket(
                    F.col(value_col), F.col("__mn"), F.col("__mx"), F.lit(n_buckets)
                ),
            )
        ),
    )

    # rows preceding each (group, bucket): one row per bucket — tiny
    bucket_counts = b.groupBy(group_col, "__b").agg(F.count("*").alias("__bc"))
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_counts.select(
        group_col, "__b", F.coalesce(F.sum("__bc").over(w_off), F.lit(0)).alias("__off")
    )

    # local rank within the bucket + offset = global rank; the window's
    # shuffle spreads each group's sort over n_buckets reducers
    w_local = Window.partitionBy(group_col, "__b").orderBy(F.col(value_col))
    ranked = b.join(F.broadcast(offsets), [group_col, "__b"]).withColumn(
        "__rn", F.row_number().over(w_local) + F.col("__off")
    )

    aggs = []
    for p, alias in zip(ps, aliases):
        pos = (F.col("__n") - 1) * F.lit(float(p))
        lo = F.floor(pos)
        frac = pos - lo
        contrib = (
            F.when((F.col("__rn") - 1 == lo) & (frac == 0), F.col(value_col))
            .when(F.col("__rn") - 1 == lo, (1 - frac) * F.col(value_col))
            .when(F.col("__rn") - 1 == lo + 1, frac * F.col(value_col))
            .otherwise(F.lit(0.0))
        )
        aggs.append(F.round(F.sum(contrib), decimals).alias(alias))
    return ranked.groupBy(group_col).agg(*aggs)
