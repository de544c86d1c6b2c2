"""Distributed k-means over an embedding column (iterative algorithm).

Each iteration: (1) nearest-centroid assignment — Arrow-batched numpy
matrix product per partition; (2) new centroids — posexplode to
(bucket, dim_index, value) and a groupBy mean, i.e. one small shuffle of
k×dim aggregates, never the vectors themselves. Centroids live on the
driver between iterations (k·dim doubles — trivially small), broadcast
into the assignment kernel each round; at 100 TB the per-iteration cost is
one scan + one tiny shuffle, the textbook Spark formulation.

Deterministic: initial centroids are the first k vectors by id (no RNG).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fineventstream_spark.operators.similarity import nearest_centroid_udf


def initial_centroids(
    df: DataFrame, vec_col: str, id_col: str, k: int
) -> list[list[float]]:
    """Deterministic init: the first k vectors by id (no RNG). Exposed so
    audits (e.g. q_llm_kmeans's inertia_gain baseline) measure from the
    SAME starting point the fit used, whatever this scheme becomes."""
    return [
        [float(x) for x in r[0]]
        for r in df.orderBy(id_col).select(vec_col).limit(k).collect()
    ]


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iterations: int = 5,
    init: list[list[float]] | None = None,
) -> tuple[list[list[float]], DataFrame]:
    """Run ``iterations`` of Lloyd's algorithm; returns (centroids,
    assignments DataFrame with columns [id_col, cluster]).

    ``init``: precomputed starting centroids — pass them when the caller
    already collected :func:`initial_centroids` (e.g. for an inertia
    baseline) to avoid a duplicate driver round-trip; None computes them."""
    centroids = init if init is not None else initial_centroids(df, vec_col, id_col, k)
    for _ in range(iterations):
        assigned = df.withColumn("cluster", nearest_centroid_udf(centroids)(F.col(vec_col)))
        means = (
            assigned.select("cluster", F.posexplode(F.col(vec_col).cast("array<double>")))
            .groupBy("cluster", "pos")
            .agg(F.avg("col").alias("m"))
            .collect()
        )
        dim = len(centroids[0])
        new = [list(c) for c in centroids]  # empty clusters keep their centroid
        acc: dict[int, list[float]] = {}
        for r in means:
            acc.setdefault(r.cluster, [0.0] * dim)[r.pos] = r.m
        for c, vec in acc.items():
            new[c] = vec
        centroids = new
    # Recompute assignments against the *final* centroids so the returned
    # (centroids, assignments) pair is mutually consistent — inside the loop
    # `assigned` reflects the centroids from the start of the last round.
    assigned = df.withColumn("cluster", nearest_centroid_udf(centroids)(F.col(vec_col)))
    return centroids, assigned.select(id_col, "cluster")


def kmeans_inertia(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> float:
    """Mean within-cluster squared distance (quality metric for tests)."""
    c = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("double")
    def _d2(vecs: pd.Series) -> pd.Series:
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d.min(axis=1))

    return df.select(F.avg(_d2(F.col(vec_col))).alias("j")).first()[0]
