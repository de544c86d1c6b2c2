"""Bucketed co-located joins (SURVEY §4 / 100 TB shuffle discipline).

At 100 TB, the dominant cost of a fact-to-fact equi-join is shuffling both
sides. Bucketing pre-partitions the data by the join key at *write* time
(``bucketBy(n, key).sortBy(key)``) so that repeated joins/aggregations on
that key run with ZERO exchange — each task zips bucket i of both tables.
This is ingest work, paid once, amortized over every orderkey-joining
query; on a real lake the bucketed layout IS the lake.

Implementation notes:

- The data lives as an EXTERNAL bucketed parquet directory under
  ``.cache/<sf>/`` (fingerprint-keyed like every other derivative —
  schema × data, so regenerated fixtures can never serve stale buckets).
  Bucket metadata only exists in a catalog, and the in-memory catalog is
  session-scoped, so each new session re-registers the existing files
  with ``CREATE TABLE … CLUSTERED BY … SORTED BY … INTO n BUCKETS
  LOCATION …`` — no rewrite.
- ``repartition(n, key)`` before the bucketed write uses the same
  murmur3 hash family as the bucket-id assignment, so every bucket is
  written by exactly one task → ONE file per bucket → the scan can
  report per-bucket sort order (``legacy.bucketedTableScan.outputOrdering``,
  pinned in session.py) and sort-merge joins skip their Sort entirely.
- ``N_BUCKETS`` = 32 matches local[32]; on a 1000-executor cluster the
  same derivative would use ~2-3× total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from fineventstream_spark.catalog import load_table, source_fingerprint

N_BUCKETS = 32

_CACHE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".cache"
)

# the bucket keys the engine's headline queries co-locate on
BUCKET_KEYS = {"lineitem": "l_orderkey", "orders": "o_orderkey"}


def _bucketed_paths(sf_dir: str, table: str, fingerprint: str) -> tuple[str, str]:
    """(external data dir, session-catalog table name) for one derivative."""
    sf = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(_CACHE_ROOT, sf, f"{table}_bucketed-{fingerprint}")
    name = f"fes_{table}_bkt_{sf}_{fingerprint}".replace(".", "_").replace("-", "_")
    return path, name


def _prune_stale(path: str, table: str) -> None:
    """Drop superseded fingerprints of this table's bucketed dir — only
    after the replacement is fully written (same race discipline as
    queries/scans.py derivatives)."""
    import shutil

    parent, leaf = os.path.split(path)
    if not os.path.isdir(parent):
        return
    for entry in os.listdir(parent):
        if entry != leaf and entry.startswith(f"{table}_bucketed-"):
            shutil.rmtree(os.path.join(parent, entry), ignore_errors=True)


def ensure_bucketed(spark: SparkSession, sf_dir: str, table: str, key: str | None = None) -> str:
    """Materialize (once per source fingerprint) and register (once per
    session) a bucketed+sorted copy of ``table``. Returns the catalog
    table name."""
    key = key or BUCKET_KEYS[table]
    df = load_table(spark, sf_dir, table)
    fp = source_fingerprint(df, sf_dir, table)
    path, name = _bucketed_paths(sf_dir, table, fp)
    if spark.catalog.tableExists(name):
        return name
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # one write task per bucket → one file per bucket → sorted scan
        (
            df.repartition(N_BUCKETS, key)
            .write.mode("overwrite")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", path)
            .saveAsTable(name)
        )
        _prune_stale(path, table)
        return name
    # files already on disk from an earlier session: re-register metadata
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    spark.sql(
        f"CREATE TABLE {name} ({ddl}) USING PARQUET "
        f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {N_BUCKETS} BUCKETS "
        f"LOCATION '{path}'"
    )
    return name


def bucketed_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """The bucketed derivative of ``table`` as a DataFrame (schema identical
    to :func:`load_table`; scan reports bucketing + per-bucket sort)."""
    return spark.table(ensure_bucketed(spark, sf_dir, table))


def bucketed_join_lineitem_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders on orderkey with both sides bucketed on the key:
    the plan contains no Exchange — the join is pre-co-located."""
    li = bucketed_table(spark, sf_dir, "lineitem")
    od = bucketed_table(spark, sf_dir, "orders")
    # merge hint: at fixture scale Catalyst would broadcast (its own
    # Exchange); at 100 TB neither side broadcasts — pin the SMJ shape the
    # bucketing exists for
    return li.join(od.hint("merge"), li.l_orderkey == od.o_orderkey, "inner").select(
        "l_orderkey", "l_quantity", "o_totalprice", "o_orderstatus"
    )
