"""Persisted IVF index: build once, prune at the FILE level per query.

``similarity.ivf_topk`` probes inverted lists in-memory — right shape,
wrong storage story for 100 TB: every query still *scans* the whole
corpus to recompute bucket assignments. The production pattern splits
build from query:

- **build** (once): k-means centroids over the corpus (driver holds
  k × dim floats — same footprint class as any broadcast dim), assign
  every vector to its nearest list, and write the vectors
  ``partitionBy("ivf_bucket")`` with the centroids in a JSON sidecar.
- **query** (many): load the sidecar, pick the ``nprobe`` nearest lists
  on the driver, and read ONLY those hive partitions — Catalyst's
  partition pruning (`PartitionFilters: ivf_bucket IN (...)`) skips the
  other ``(1 - nprobe/k)`` of the corpus before any task launches. The
  exact cosine rerank then runs over just the probed lists.

Recall/latency trade is the standard IVF one (raise nprobe for recall);
determinism: k-means seeds from the first k vectors by id, no RNG.

**Incremental maintenance (r12)**: production appends embeddings daily;
rebuilding the index per append is the O(corpus) cost this module
exists to avoid. :func:`append_ivf_index` assigns NEW vectors to the
EXISTING centroids and appends into the partitioned list layout —
O(append) work, queries prune exactly as before. Appends drift the
list balance (the data distribution moves away from the build-time
centroids), so the sidecar records per-list counts at build time and
every append updates them; :func:`needs_recluster` compares the
current max/mean list skew against the build-time skew and flags when
the drift passes a threshold — the recorded, testable signal for the
(still O(corpus), deliberately explicit) rebuild.

**Epoch-committed appends (r13)**: each build/append writes its own
``vectors/e=N`` directory and the sidecar's ``epochs`` list is the
manifest — readers load only committed epochs, so appended rows and
the updated ``list_counts`` become visible ATOMICALLY at the sidecar
``os.replace``. The prior ``mode("append")`` made appended rows
reader-visible before the counts committed, and a crash between write
and sidecar left a torn state a replay would double-append (r12
advisor); now a torn epoch directory is simply invisible and a replay
``mode("overwrite")``s it with identical content before committing.
Optional ``tag`` gives streaming callers the same idempotence key the
minhash store has (operators/dedup.py). Single-writer per index.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fineventstream_spark.operators.kmeans import kmeans_fit
from fineventstream_spark.operators.similarity import cosine_topk, ivf_assign

_SIDECAR = "_IVF_CENTROIDS.json"


def _list_counts(assigned: DataFrame) -> dict[str, int]:
    rows = assigned.groupBy("ivf_bucket").count().collect()  # k rows, bounded
    return {str(r["ivf_bucket"]): int(r["count"]) for r in rows}


def _write_sidecar(path: str, meta: dict) -> None:
    tmp = os.path.join(path, _SIDECAR + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, _SIDECAR))


def _load_sidecar(path: str) -> dict:
    with open(os.path.join(path, _SIDECAR)) as f:
        meta = json.load(f)
    if isinstance(meta, list):  # legacy pre-r12 format: bare centroid list
        return {"centroids": meta, "list_counts": {}, "built_counts": {}}
    return meta


def _read_vectors(spark: SparkSession, path: str, meta: dict) -> DataFrame:
    """Committed epochs only; ``e`` dropped so callers see the stable
    (id, vec, ivf_bucket) schema. Legacy pre-r13 indexes (no ``epochs``
    manifest) read the flat layout as before."""
    root = os.path.join(path, "vectors")
    epochs = meta.get("epochs")
    if epochs is None:
        return spark.read.parquet(root)
    paths = [os.path.join(root, f"e={e}") for e in epochs]
    return spark.read.option("basePath", root).parquet(*paths).drop("e")


def _skew(counts: dict[str, int]) -> float:
    vals = list(counts.values())
    if not vals or sum(vals) == 0:
        return 1.0
    return max(vals) / (sum(vals) / len(vals))


def build_ivf_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
    n_lists: int = 16,
    iterations: int = 5,
) -> list[list[float]]:
    """Fit centroids, bucket the corpus, persist partitioned by list.
    The sidecar records the build-time per-list counts — the baseline
    :func:`needs_recluster` measures append drift against."""
    centroids, _ = kmeans_fit(df, vec_col, id_col, k=n_lists, iterations=iterations)
    assigned = ivf_assign(df.select(id_col, vec_col), vec_col, centroids)
    assigned.write.mode("overwrite").partitionBy("ivf_bucket").parquet(
        os.path.join(path, "vectors", "e=0")
    )
    counts = _list_counts(
        df.sparkSession.read.parquet(os.path.join(path, "vectors", "e=0"))
    )
    _write_sidecar(
        path,
        {
            "centroids": centroids,
            "list_counts": counts,
            "built_counts": counts,
            "epochs": [0],
            "tags": {},
        },
    )
    return centroids


def append_ivf_index(
    df: DataFrame, vec_col: str, id_col: str, path: str, tag: str | None = None
) -> dict:
    """Fold new vectors into the persisted index WITHOUT re-clustering:
    assign to the existing centroids (one narrow pass over the append —
    no shuffle, no touch of the stored lists) and write them as a NEW
    committed epoch. Returns the updated sidecar meta (counts + skew),
    so callers can act on :func:`needs_recluster` immediately.

    Atomicity: rows land in ``vectors/e=N`` (invisible — not in the
    manifest), then the sidecar commits epochs+counts+tags in one
    ``os.replace``. A crash before the commit leaves an orphan dir the
    replay overwrites with identical content; a replay of a COMMITTED
    tagged append is a no-op (``tag`` already in the manifest), so
    streaming callers get exactly-once, same as the minhash store."""
    meta = _load_sidecar(path)
    if tag is not None and tag in meta.get("tags", {}):
        return meta  # replayed, fully-committed append
    epochs = meta.get("epochs")
    if epochs is None:
        raise ValueError(
            f"legacy non-epoch IVF layout at {path}: rebuild via build_ivf_index"
        )
    epoch = max(epochs) + 1
    # persisted: the assignment kernel feeds both the counts job and the
    # write — unpersisted it would run twice (r12 review), doubling the
    # dominant cost of the operation this function exists to make cheap
    assigned = ivf_assign(
        df.select(id_col, vec_col), vec_col, meta["centroids"]
    ).persist()
    new_counts = _list_counts(assigned)
    assigned.write.mode("overwrite").partitionBy("ivf_bucket").parquet(
        os.path.join(path, "vectors", f"e={epoch}")
    )
    assigned.unpersist()
    counts = dict(meta.get("list_counts", {}))
    for b, n in new_counts.items():
        counts[b] = counts.get(b, 0) + n
    meta["list_counts"] = counts
    meta["epochs"] = epochs + [epoch]
    if tag is not None:
        meta.setdefault("tags", {})[tag] = epoch
    _write_sidecar(path, meta)
    return meta


def needs_recluster(path: str, drift_ratio: float = 1.5) -> bool:
    """True when appended data has drifted the list balance past the
    threshold: current max/mean list skew > ``drift_ratio`` × the
    build-time skew. Skew RELATIVE to build (not absolute) because a
    corpus can be legitimately imbalanced at build time — the signal is
    appends concentrating where the centroids no longer describe the
    data, which degrades the nprobe/recall trade (hot lists scan more,
    cold lists waste probes)."""
    meta = _load_sidecar(path)
    built, now = meta.get("built_counts", {}), meta.get("list_counts", {})
    if not built or not now:
        return False
    return _skew(now) > drift_ratio * _skew(built)


def query_ivf_index(
    spark: SparkSession,
    path: str,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Top-k over the persisted index, reading only the probed partitions
    of the COMMITTED epochs."""
    meta = _load_sidecar(path)
    centroids = meta["centroids"]

    def cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return dot / (na * nb)

    probe = sorted(range(len(centroids)), key=lambda i: -cos(centroids[i], query))[
        :nprobe
    ]
    vectors = _read_vectors(spark, path, meta)
    pruned = vectors.filter(F.col("ivf_bucket").isin([int(p) for p in probe]))
    return cosine_topk(pruned, vec_col, id_col, query, k)
