"""Broker-connector adapter (SURVEY §2.1 S3/S9): one entry point that
yields the keyed-envelope stream whatever the physical broker is.

The reference consumes Kinesis micro-batches of (partition key, opaque
bytes) records (processor_stock_quotes.py:32-44; put side
producer_stock_quotes.py:126-138). The engine's decode path
(streaming/pipelines.py) is written against that logical envelope —
``ENVELOPE_SCHEMA`` = (partition_key string, data base64-string) — so
swapping brokers is a config change, not a pipeline change:

- ``file``/``json``: JSONL directory of envelope rows — what the container
  and tests use (no broker available here).
- ``kafka``: Structured Streaming's Kafka source; the binary key/value
  columns are mapped onto the envelope (value → base64) so the downstream
  ``unbase64 → from_json`` decode runs unchanged. Requires the
  spark-sql-kafka package on the cluster.
- ``kinesis``: the reference's native broker. Public Spark Kinesis
  connectors (e.g. the spark-sql-kinesis line of connectors) expose each
  record as ``data`` (binary payload) + ``partitionKey`` (string) —
  exactly the envelope the reference's Lambda consumer receives
  (processor_stock_quotes.py:32-44), so the mapping is
  ``partitionKey → partition_key``, ``base64(data) → data``. The format
  name is configurable (``connector_format`` option) because the
  connector jar's registered short name varies by distribution.
- ``rate``: synthetic envelope stream (throughput smoke tests).

At 100 TB/day the adapter choice sets only source parallelism (Kafka
partitions ↔ Spark tasks); everything downstream — decode, dedup, windowed
aggs, partitioned sink — is broker-agnostic by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fineventstream_spark.schemas import ENVELOPE_SCHEMA


def read_envelope_stream(
    spark: SparkSession,
    source_format: str,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Return a streaming DataFrame with ENVELOPE_SCHEMA columns
    (partition_key, data) from the named source format."""
    options = dict(options or {})
    if source_format in ("file", "json"):
        path = options.pop("path")
        return (
            spark.readStream.schema(ENVELOPE_SCHEMA)
            .options(**options)
            .json(path)
            .select("partition_key", "data")
        )
    if source_format == "kafka":
        raw = spark.readStream.format("kafka").options(**options).load()
        # Kafka carries raw payload bytes; the envelope contract carries
        # base64 text (the Kinesis→Lambda event shape the decode path
        # expects) — encode on ingest so decode_envelope is unchanged.
        return raw.select(
            F.col("key").cast("string").alias("partition_key"),
            F.base64(F.col("value")).alias("data"),
        )
    if source_format == "kinesis":
        # The reference's broker (terraform/kinesis.tf, stream name
        # fineventstream-quotes-stream). A Kinesis connector DataFrame
        # carries (data: binary, partitionKey: string, sequenceNumber,
        # approximateArrivalTimestamp, ...); map onto the envelope so
        # decode_envelope runs unchanged. The shard count ↔ task
        # parallelism story matches Kafka's partitions.
        # copy before pop: mutating the caller's dict would make a REUSED
        # options dict silently fall back to the default connector on the
        # second call (restart/retry loops pass the same dict)
        opts = dict(options)
        fmt = opts.pop("connector_format", "aws-kinesis")
        raw = spark.readStream.format(fmt).options(**opts).load()
        return map_kinesis_envelope(raw)
    if source_format == "rate":
        raw = spark.readStream.format("rate").options(**options).load()
        return raw.select(
            (F.col("value") % 8).cast("string").alias("partition_key"),
            F.base64(F.to_json(F.struct("timestamp", "value")).cast("binary")).alias("data"),
        )
    raise ValueError(
        f"unknown envelope source format {source_format!r}; "
        "expected file|json|kafka|kinesis|rate"
    )


def map_kinesis_envelope(raw: DataFrame) -> DataFrame:
    """Map a Kinesis-connector record frame onto ENVELOPE_SCHEMA.

    Split out from the stream builder so the column mapping is unit-
    testable without a broker: any DataFrame (batch or streaming) with
    Kinesis's ``partitionKey`` (string) + ``data`` (binary payload)
    columns maps to (partition_key, data-as-base64) — the exact shape the
    reference's consumer sees after the Kinesis→Lambda event unwrapping
    (processor_stock_quotes.py:32-44: record["kinesis"]["data"] is
    base64 text there too).
    """
    return raw.select(
        F.col("partitionKey").cast("string").alias("partition_key"),
        F.base64(F.col("data")).alias("data"),
    )
