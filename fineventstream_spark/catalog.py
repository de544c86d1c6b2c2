"""Table catalog over the parquet lake.

The reference's "catalog" is a directory convention on S3
(reference: src/lambda_processor/processor_stock_quotes.py:68-73, README.md:16);
ours is a thin loader over the driver's parquet fixtures that also
normalizes types at the edge (timestamp hygiene — SURVEY §7):

- ``events.ts`` arrives as INT64 TIMESTAMP(NANOS); Spark reads it as a raw
  long (``spark.sql.legacy.parquet.nanosAsLong``) and we truncate to
  microseconds with exact integer division (``ts div 1000``) — identical to
  DuckDB's nanos→micros truncation, so oracle comparisons are bit-stable.

At 100 TB the same loader would point at a partitioned lake root; partition
discovery and pruning are Catalyst's job (PruneFileSourcePartitions), not
ours.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing event-time to TimestampType UTC."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # exact integer division: ns → µs without double-precision loss
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register every lake table as a temp view — the engine's `spark.sql`
    entry point (the Athena-style surface the reference planned,
    README.md:31). After this, ``spark.sql("SELECT ... FROM lineitem")``
    works; Catalyst produces the same plans as the DataFrame API."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


class Tables:
    """Lazy per-(session, sf_dir) table accessor used by query callables.

    ``t.lineitem`` loads on first access; repeated access within one query
    returns the same DataFrame object (same logical plan → Catalyst reuses
    the scan).
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        if name not in TABLES:
            raise AttributeError(f"unknown table {name!r}")
        if name not in self._cache:
            self._cache[name] = load_table(self.spark, self.sf_dir, name)
        return self._cache[name]
