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

Cost: the numbering pass is itself a per-key window — the very
serialization being escaped — but it moves only the key/order columns
and computes one row_number, while the frame pass carries the full
payload and does the O(frame) per-row arithmetic at keys × chunks
parallelism. The replicated fraction is frame/chunk_rows (<1% at the
defaults). The carry-in rows are produced by a conditional explode, not
a self-union, so the numbering subtree executes once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def chunked_rolling(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    frame_rows: int,
    aggs: dict[str, Column],
    chunk_rows: int = 10_000,
) -> DataFrame:
    """Evaluate trailing ``ROWS BETWEEN frame_rows-1 PRECEDING AND CURRENT
    ROW`` aggregates at keys × chunks parallelism.

    ``aggs`` maps output column name → an aggregate Column built over
    ``F.col(...)`` inputs (e.g. ``{"m": F.avg("value")}``); each is
    evaluated ``.over()`` the chunked trailing frame. Results are exactly
    those of the plain per-key window."""
    if chunk_rows < frame_rows - 1:
        raise ValueError(
            f"chunk_rows ({chunk_rows}) must be >= frame_rows-1 "
            f"({frame_rows - 1}): a chunk must hold a full carry-in frame"
        )
    seq = (
        Window.partitionBy(*key_cols).orderBy(*order_cols)
    )
    numbered = df.withColumn("__rn", F.row_number().over(seq) - 1)
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
