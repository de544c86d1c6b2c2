"""Bucketed co-located joins (SURVEY §4 / 100 TB shuffle discipline).

At 100 TB, the dominant cost of a fact-to-fact equi-join is shuffling both
sides. Bucketing pre-partitions the data by the join key at *write* time
(``bucketBy(n, key).sortBy(key)``) so that repeated joins/aggregations on
that key run with ZERO exchange — each task zips bucket i of both tables.

The fixture lake is plain parquet, so this module materializes bucketed
copies once per (session, sf) into the session catalog; the pattern under
test is the plan shape (no Exchange under the SortMergeJoin), which
tests/test_plans.py asserts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from fineventstream_spark.catalog import load_table

N_BUCKETS = 8


def _bucketed_name(table: str, sf_dir: str) -> str:
    sf = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_").replace("-", "_")
    return f"fes_{table}_bkt_{sf}"


def ensure_bucketed(spark: SparkSession, sf_dir: str, table: str, key: str) -> str:
    """Materialize a bucketed+sorted copy of ``table`` in the session
    catalog (idempotent per session). Returns the catalog table name."""
    name = _bucketed_name(table, sf_dir)
    if not spark.catalog.tableExists(name):
        # the in-memory catalog is session-scoped but the managed-table
        # location is not: clear a stale dir left by a previous session
        # (Spark refuses to create a managed table over an existing path)
        import shutil

        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix(
            "file:"
        )
        stale = os.path.join(warehouse, name.lower())
        if os.path.exists(stale):
            shutil.rmtree(stale, ignore_errors=True)
        df = load_table(spark, sf_dir, table)
        (
            df.write.mode("overwrite")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(name)
        )
    return name


def bucketed_join_lineitem_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders on orderkey with both sides bucketed on the key:
    the plan contains no Exchange — the join is pre-co-located."""
    li = spark.table(ensure_bucketed(spark, sf_dir, "lineitem", "l_orderkey"))
    od = spark.table(ensure_bucketed(spark, sf_dir, "orders", "o_orderkey"))
    # merge hint: at fixture scale Catalyst would broadcast (its own
    # Exchange); at 100 TB neither side broadcasts — pin the SMJ shape the
    # bucketing exists for
    return li.join(od.hint("merge"), li.l_orderkey == od.o_orderkey, "inner").select(
        "l_orderkey", "l_quantity", "o_totalprice", "o_orderstatus"
    )
