"""Partitioned lake sink (SURVEY §2.1 S7/S8) — batch and streaming.

The reference appends uniquely-named JSONL objects under
``processed/{topic}/year=/month=/day=/hour=`` with at-least-once retry
(S3 failure re-raises → whole-batch redelivery,
processor_stock_quotes.py:64-91). Spark's file-sink commit log upgrades
this to exactly-once: a restarted query never double-commits a batch.

Format note: JSONL kept for interchange parity with the reference; parquet
is the engine-native default (columnar scan, pushdown, stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from fineventstream_spark.streaming.pipelines import with_arrival_partitions

PARTITION_COLS = ("year", "month", "day", "hour")


def write_partitioned_batch(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Batch append under arrival-time hive partitions."""
    (
        with_arrival_partitions(df)
        .write.mode("append")
        .partitionBy(*PARTITION_COLS)
        .format(fmt)
        .save(path)
    )


def write_partitioned_stream(
    df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    trigger_seconds: int = 10,
) -> StreamingQuery:
    """Streaming append with checkpointed exactly-once commit.

    ``trigger_seconds`` mirrors the reference's 10 s Lambda batching window
    (terraform/lambda.tf:53).
    """
    return (
        with_arrival_partitions(df)
        .writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy(*PARTITION_COLS)
        .outputMode("append")
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
