"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All declared queries live in the package registry
(``fineventstream_spark.registry``) — one source of truth shared by this
contract file, the pytest differential suite, and bench.py.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

SF_SMOKE = "/root/testdata/sf0.001"


def _registry():
    from fineventstream_spark.registry import all_queries

    return all_queries()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the as-of join (latest click value at-or-before each
    purchase, per user) — the quotes↔news query the reference's lake is
    shaped for, via the union+window single-shuffle formulation."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    return _registry()["q_join_asof"].fn(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # defensive: the driver may hand us a session without our configs
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            # AQE coalescing: a default 200-partition session otherwise runs
            # 200-400 near-empty tasks per shuffle at oracle scale
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
            # bucketed-derivative plans (see session.py): subset
            # co-partitioning + trusted per-bucket sort order — results are
            # identical without these, but the zero-exchange plan shape the
            # bucketed queries exist for is not
            spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
            spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
            # driver-side listing for the engine's own layouts (≤ ~100
            # local dirs: minhash-store bp= partitions, day-partitioned
            # events) instead of a 64-task distributed listing job per
            # reader build (r14; see session.py)
            spark.conf.set(
                "spark.sql.sources.parallelPartitionDiscovery.threshold", "256"
            )
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(q.fn) for name, q in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible declared query."""
    return {name: q.oracle for name, q in _registry().items() if q.oracle is not None}
