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


def build_ivf_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
    n_lists: int = 16,
    iterations: int = 5,
) -> list[list[float]]:
    """Fit centroids, bucket the corpus, persist partitioned by list."""
    centroids, _ = kmeans_fit(df, vec_col, id_col, k=n_lists, iterations=iterations)
    assigned = ivf_assign(df.select(id_col, vec_col), vec_col, centroids)
    assigned.write.mode("overwrite").partitionBy("ivf_bucket").parquet(
        os.path.join(path, "vectors")
    )
    with open(os.path.join(path, _SIDECAR), "w") as f:
        json.dump(centroids, f)
    return centroids


def query_ivf_index(
    spark: SparkSession,
    path: str,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Top-k over the persisted index, reading only the probed partitions."""
    with open(os.path.join(path, _SIDECAR)) as f:
        centroids = json.load(f)

    def cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return dot / (na * nb)

    probe = sorted(range(len(centroids)), key=lambda i: -cos(centroids[i], query))[
        :nprobe
    ]
    vectors = spark.read.parquet(os.path.join(path, "vectors"))
    pruned = vectors.filter(F.col("ivf_bucket").isin([int(p) for p in probe]))
    return cosine_topk(pruned, vec_col, id_col, query, k)
