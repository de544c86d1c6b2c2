"""SparkSession factory.

One place to pin every config that correctness or scale depends on:

- ``spark.sql.session.timeZone=UTC`` — the reference mixes ISO strings and
  epoch seconds (reference: src/producer/producer_stock_quotes.py:88-96);
  we normalize all event time to UTC TimestampType at the edge so date
  functions are deterministic against the DuckDB oracle.
- ``spark.sql.legacy.parquet.nanosAsLong=true`` — the driver fixtures store
  ``events.ts`` as INT64 TIMESTAMP(NANOS); Spark has no nanos type, so we
  read the raw long and truncate to micros in the catalog (identical to
  DuckDB's nanos→micros read behavior).
- AQE on — at 100 TB, runtime stats beat static planning: skew-join
  splitting, dynamic partition coalescing, runtime broadcast demotion.
- Arrow on — every pandas UDF crosses the JVM/Python boundary in Arrow
  batches, not pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 4


def get_spark(
    app_name: str = "fineventstream-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Local mode is a single JVM; on a real cluster the same configs apply,
    with ``shuffle_partitions`` sized to ~2-3× total cores and
    ``maxPartitionBytes`` sized so a task's input fits comfortably in an
    executor core's share of memory.
    """
    cpus = cpus or _default_parallelism()
    shuffle_partitions = shuffle_partitions or cpus
    driver_memory = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.mergeSchema", "false")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Partition discovery of the engine's own layouts (the minhash
        # store's 64 bp= dirs, the 31-day partitioned events) crosses the
        # default 32-path threshold and launches a DISTRIBUTED listing job
        # per reader build — a 64-task job to stat ~100 local directories
        # the driver lists in microseconds (r14 measurement: the band-table
        # reader alone cost +2 jobs/1.2-2.4 s per probe). 256 keeps every
        # engine layout driver-listed; deployments against high-latency
        # object stores with many more leaf dirs should lower it back (env
        # SPARK_GRAFT_PAR_DISCOVERY_THRESHOLD).
        .config(
            "spark.sql.sources.parallelPartitionDiscovery.threshold",
            os.environ.get("SPARK_GRAFT_PAR_DISCOVERY_THRESHOLD", "256"),
        )
        # NOTE (r7): spark.sql.requireAllClusterKeysForCoPartition stays at
        # its DEFAULT (true). Round 6 set it false so a bucketed-on-orderkey
        # SMJ whose equi-keys widened to (orderkey, nationkey) could reuse
        # the bucket distribution — but globally, the relaxation let joins
        # whose small side is partitioned on a key SUBSET drag the big side
        # down to that subset's distribution: chunked_rolling's bookkeeping
        # join (key, __bkt) was satisfied by hash(key) alone, collapsing the
        # heavy window to key-cardinality parallelism (sf10 measured: 38.7 s
        # vs 7.7 s — a 5× regression on q_event_rolling_zscore). The one
        # query that needed the widened-key reuse (Q5) now joins on the
        # bucket key ONLY and applies the second equality as a post-join
        # filter — identical semantics, single-key SMJ, default configs.
        # Bucketed scans report per-bucket sort order when each bucket is
        # one file (our derivatives write exactly one — repartition(n, key)
        # ahead of bucketBy), letting SMJ skip its Sort (sf10: −17%).
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
