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
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fineventstream_spark.catalog import load_table, source_fingerprint

N_BUCKETS = 32

_CACHE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".cache"
)

# the bucket keys the engine's headline queries co-locate on
BUCKET_KEYS = {"lineitem": "l_orderkey", "orders": "o_orderkey"}

# Spark bucketed writes encode the bucket id in the file name:
# part-<task>-<uuid>_<bucketId>.c000.snappy.parquet
_BUCKET_ID_RE = re.compile(r"_(\d{5})\.c\d{3}")

# catalog.source_fingerprint: sha256 hex truncated to 12 chars — the only
# thing allowed after "<table>_bucketed-<spec>-" for _prune_stale to treat
# an entry as a stale fingerprint of that same spec
_FINGERPRINT_RE = re.compile(r"[0-9a-f]{12}")


def _bucket_spec(
    key: str,
    columns: tuple[str, ...] | None,
    derived: dict[str, str] | None = None,
    prejoin: tuple[str, str, str, tuple[str, ...]] | None = None,
) -> str:
    """Canonical spec string for one layout: bucket count × key × (for
    covering projections) the projected column set × (for materialized
    expressions) the derived name→SQL map × (for pre-join projections)
    the dim-join descriptor. Everything that affects the file layout is
    in the spec, so a spec change can never re-register old files under
    new metadata."""
    spec = f"b{N_BUCKETS}-{key}"
    if columns or derived or prejoin:
        import hashlib

        ident = ",".join(columns or ())
        if derived:
            ident += "|" + ";".join(f"{k}={v}" for k, v in sorted(derived.items()))
        if prejoin:
            dt, fk, dk, dcols = prejoin
            ident += f"|J:{dt}:{fk}={dk}:{','.join(dcols)}"
        spec += "-p" + hashlib.md5(ident.encode()).hexdigest()[:8]
    return spec


def _bucketed_paths(
    sf_dir: str, table: str, spec: str, fingerprint: str
) -> tuple[str, str]:
    """(external data dir, session-catalog table name) for one derivative.

    The bucket SPEC (count + key + projection) is part of both names (r6
    advisor): a future N_BUCKETS or key change must regenerate the
    derivative, never re-register old files under new CLUSTERED BY
    metadata — Spark trusts catalog bucketing blindly, so a spec/file
    mismatch silently returns wrong rows from co-located SMJs and
    bucket-pruned scans.
    """
    sf = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(_CACHE_ROOT, sf, f"{table}_bucketed-{spec}-{fingerprint}")
    name = f"fes_{table}_bkt_{spec}_{sf}_{fingerprint}".replace(".", "_").replace("-", "_")
    return path, name


def _prune_stale(path: str, table: str, spec: str) -> None:
    """Drop superseded FINGERPRINTS of this exact table × layout spec —
    only after the replacement is fully written (same race discipline as
    queries/scans.py derivatives). Scoped to the spec on purpose: a table
    legitimately holds several live layouts at once (lineitem bucketed by
    orderkey for Q5/Q9 AND the partkey covering projection), so pruning
    across specs would delete a layout other queries still serve from.
    A deliberate N_BUCKETS/key retirement therefore leaves the old spec's
    files as orphans; reclaim them by clearing ``.cache/<sf>``.

    SINGLE-WRITER ASSUMPTION (r6 advisor): pruning deletes files another
    live session may still have registered as an external table; its
    in-flight scans would fail mid-read. This matches the repo-wide
    derivative discipline (queries/scans.py): one process owns a given
    ``.cache/<sf>`` tree at a time — true for the driver, bench.py and the
    test suite. Multi-writer deployments should prune at startup instead.

    SPEC-BOUNDARY PARSE (r8 advisor): a plain spec ``b32-<key>`` is a
    string PREFIX of every projected spec ``b32-<key>-p<hash>`` on the
    same key, so ``startswith`` alone would let a plain-layout rebuild
    rmtree live covering-projection dirs. The segment after the spec must
    therefore be EXACTLY a source fingerprint (12 hex chars, no dashes —
    catalog.source_fingerprint) for the entry to count as a stale
    fingerprint of THIS spec.
    """
    import shutil

    parent, leaf = os.path.split(path)
    if not os.path.isdir(parent):
        return
    prefix = f"{table}_bucketed-{spec}-"
    for entry in os.listdir(parent):
        if (
            entry != leaf
            and entry.startswith(prefix)
            and _FINGERPRINT_RE.fullmatch(entry[len(prefix) :])
        ):
            shutil.rmtree(os.path.join(parent, entry), ignore_errors=True)


def _assert_one_file_per_bucket(path: str, table: str) -> None:
    """The trusted-sort scan (``legacy.bucketedTableScan.outputOrdering``,
    session.py) is only sound when every bucket is a single file — multiple
    files per bucket would be concatenated UNSORTED while the scan still
    claims per-bucket order, and SMJ would silently merge unsorted input
    (the pre-3.0 bug the default config fixed). Verify the invariant from
    the actual file layout at register time, both branches (r6 advisor)."""
    seen: dict[str, str] = {}
    for f in os.listdir(path):
        if not f.endswith(".parquet") or f.startswith(("_", ".")):
            continue
        m = _BUCKET_ID_RE.search(f)
        if m is None:
            raise AssertionError(
                f"bucketed derivative {table} at {path}: file {f!r} has no "
                "bucket-id suffix — layout is not a Spark bucketed write"
            )
        if m.group(1) in seen:
            raise AssertionError(
                f"bucketed derivative {table} at {path}: bucket {m.group(1)} "
                f"has multiple files ({seen[m.group(1)]!r}, {f!r}) — the "
                "trusted per-bucket sort order would be wrong; delete the "
                "directory to regenerate"
            )
        seen[m.group(1)] = f
    if not seen:
        raise AssertionError(f"bucketed derivative {table} at {path}: no data files")


# A hot join key concentrates in ONE bucket, and a bucketed SMJ cannot be
# split by AQE (no shuffle to re-plan) — the zipf skew evidence measured
# the zero-exchange layout 1.3× SLOWER than shuffle+AQE-split on a key
# holding 18% of the fact. The layout itself knows: bucket FILE SIZES are
# on disk at write time. max/median above this ratio marks the layout
# skew-degenerate.
SKEW_RATIO_THRESHOLD = 4.0


def bucket_skew_ratio(path: str) -> float:
    """max/median data-file size across buckets of a bucketed derivative —
    1.0 is perfectly even; large values mean a hot key serialized into one
    bucket (its SMJ task becomes the straggler AQE cannot split)."""
    import statistics

    sizes = sorted(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    if not sizes:
        return 1.0
    return sizes[-1] / max(statistics.median(sizes), 1.0)


def _warn_if_skew_degenerate(path: str, table: str, key: str) -> None:
    """Write-time skew self-report: warn (once per materialization) when
    the layout's hot bucket passes SKEW_RATIO_THRESHOLD — the operator
    signal to route that key's joins through the shuffle+AQE path, where
    OptimizeSkewedJoin can split the hot partition (plan-asserted at
    production thresholds in scripts/skew_evidence.py)."""
    ratio = bucket_skew_ratio(path)
    if ratio >= SKEW_RATIO_THRESHOLD:
        import warnings

        warnings.warn(
            f"bucketed layout {table} by {key!r} is skew-degenerate: hot "
            f"bucket is {ratio:.1f}x the median (threshold "
            f"{SKEW_RATIO_THRESHOLD}). A co-located SMJ serializes that "
            "bucket into one unsplittable task; measured 1.3x slower than "
            "shuffle+AQE skew split at 18%-hot-key zipf. Prefer the plain "
            "shuffle join for queries dominated by the hot key.",
            stacklevel=3,
        )


def ensure_bucketed(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key: str | None = None,
    columns: tuple[str, ...] | None = None,
    derived: dict[str, str] | None = None,
    prejoin: tuple[str, str, str, tuple[str, ...]] | None = None,
) -> str:
    """Materialize (once per source fingerprint × layout spec) and register
    (once per session) a bucketed+sorted copy of ``table``. Returns the
    catalog table name.

    With ``columns``, the derivative is a COVERING PROJECTION: only those
    columns, bucket-sorted by ``key`` (which must be among them) — the
    Vertica-style secondary projection / C-Store answer to "this fact is
    repeatedly joined on a key it isn't laid out by". A narrow projection
    keeps the per-layout storage cost proportional to the columns the
    workload actually enriches, and the zero-exchange SMJ it enables
    replaces BOTH the fact shuffle (at any scale) and the broadcast
    relation build (which is driver-serial and O(|dim|) on the critical
    path of every query that hints it).

    With ``derived`` (name → Spark SQL expression over the source
    columns), the projection additionally MATERIALIZES computed columns
    at layout time — the shred-on-ingest idea applied to arithmetic: an
    expression every query re-evaluates per row (e.g. the exact-money
    ``rev_units`` product, r8's measured 1.06 s/round of per-row
    round/cast at sf30) is paid ONCE at ingest and scanned back as a
    plain column. The expression text is part of the layout spec, so a
    formula change regenerates the derivative.

    With ``prejoin`` = (dim_table, fact_key, dim_key, dim_cols), the
    layout is a PRE-JOIN PROJECTION (the C-Store paper's term): the fact
    is inner-joined to the dim at LAYOUT time and the requested dim
    columns are stored denormalized in the fact's bucket order. Every
    query that would re-probe that dim per fact row (e.g. Q5's supplier
    → s_nationkey, a measured ~1.4 s/round hash probe over 180 M rows at
    sf30) reads the answer as a plain column instead. Maintenance story
    at 100 TB: dims are slowly-changing and KB–MB-scale; the projection
    regenerates when either side's data fingerprint changes (both are in
    the cache key), exactly like every other ingest derivative. Note the
    inner-join semantics: fact rows without a dim match are absent from
    the projection — callers must want that (Q5 does: its own join is
    inner on the same key).
    """
    key = key or BUCKET_KEYS[table]
    df = load_table(spark, sf_dir, table)
    if (derived or prejoin) and not columns:
        raise ValueError("derived/prejoin projections require an explicit column set")
    if prejoin:
        dt, fk, dk, dcols = prejoin
        dim = load_table(spark, sf_dir, dt).select(dk, *dcols)
        df = df.join(F.broadcast(dim), F.col(fk) == F.col(dk)).drop(dk)
    if columns:
        if key not in columns:
            raise ValueError(f"projection columns {columns} must include key {key!r}")
        sel = [F.col(c) for c in columns]
        if derived:
            overlap = set(derived) & set(columns)
            if overlap:
                raise ValueError(f"derived names {sorted(overlap)} collide with columns")
            sel += [F.expr(sql).alias(name) for name, sql in sorted(derived.items())]
        df = df.select(*sel)
    fp = source_fingerprint(df, sf_dir, table)
    if prejoin:
        # the dim's data is part of the layout's identity: a regenerated /
        # changed dim must regenerate the pre-join projection
        import hashlib

        from fineventstream_spark.catalog import data_fingerprint

        fp = hashlib.sha256(
            (fp + data_fingerprint(sf_dir, prejoin[0])).encode()
        ).hexdigest()[:12]
    spec = _bucket_spec(key, columns, derived, prejoin)
    path, name = _bucketed_paths(sf_dir, table, spec, fp)
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
        _assert_one_file_per_bucket(path, table)
        _warn_if_skew_degenerate(path, table, key)
        _prune_stale(path, table, spec)
        return name
    # files already on disk from an earlier session: re-register metadata —
    # but only after proving the layout still satisfies the invariant the
    # DDL will claim (the _SUCCESS gate alone says nothing about file/bucket
    # cardinality)
    _assert_one_file_per_bucket(path, table)
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    spark.sql(
        f"CREATE TABLE {name} ({ddl}) USING PARQUET "
        f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {N_BUCKETS} BUCKETS "
        f"LOCATION '{path}'"
    )
    return name


def bucketed_table(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key: str | None = None,
    columns: tuple[str, ...] | None = None,
    derived: dict[str, str] | None = None,
    prejoin: tuple[str, str, str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """The bucketed derivative of ``table`` as a DataFrame (schema identical
    to :func:`load_table`, or to the projected columns plus any ``derived``
    materialized expressions / ``prejoin`` dim columns when given; scan
    reports bucketing + per-bucket sort)."""
    return spark.table(
        ensure_bucketed(
            spark, sf_dir, table, key=key, columns=columns, derived=derived, prejoin=prejoin
        )
    )


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
