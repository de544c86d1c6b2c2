"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k against one query vector.
  The dot product is a JVM-side ``aggregate(zip_with(...))`` fold — no
  Python, no UDF; Catalyst keeps it in whole-stage codegen. At 100 TB this
  is a single scan + TakeOrderedAndProject (per-partition heaps), which is
  exactly how exact knn should look on a cluster.
- :func:`ivf_assign` / :func:`ivf_topk` — IVF-style approximate path:
  partition vectors by nearest centroid once (write-time), probe only
  ``nprobe`` inverted lists at query time. Probed fraction ≈ nprobe/K of
  the corpus → 100×+ scan reduction at equal recall for clustered data.
- :func:`cosine_near_dup_pairs` — random-hyperplane LSH bucketing for
  embedding near-duplicate detection (deterministic seeded hyperplanes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity_col(vec_col, query: list[float]):
    """Cosine similarity of an array column vs a literal query vector (JVM-side)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    import math

    qn = math.sqrt(sum(float(x) * float(x) for x in query)) or 1.0
    return _dot(vec_col.cast("array<double>"), q) / (_norm(vec_col.cast("array<double>")) * F.lit(qn))


def cosine_topk(df: DataFrame, vec_col: str, id_col: str, query: list[float], k: int = 10) -> DataFrame:
    """Exact brute-force cosine top-k (ties broken by id for determinism)."""
    sim = cosine_similarity_col(F.col(vec_col), query)
    return (
        df.select(F.col(id_col), F.round(sim, 6).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_assign(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Assign each vector to its nearest centroid (by cosine) — the IVF
    build step. Centroids are broadcast as literals; assignment is a
    codegen fold, no shuffle. At scale you would persist the output
    partitioned by ``ivf_bucket`` so probes prune files."""
    v = F.col(vec_col).cast("array<double>")
    sims = F.array(
        *[
            (cosine_similarity_col(F.col(vec_col), c)).alias(f"c{i}")
            for i, c in enumerate(centroids)
        ]
    )
    best = F.array_position(sims, F.array_max(sims)) - 1
    return df.withColumn("ivf_bucket", best.cast("int")).withColumn("__sims", sims).drop("__sims")


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: list[list[float]],
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k: probe only the nprobe nearest inverted lists."""
    import math

    def cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return dot / (na * nb)

    probe = sorted(range(len(centroids)), key=lambda i: -cos(centroids[i], query))[:nprobe]
    assigned = ivf_assign(df, vec_col, centroids)
    pruned = assigned.filter(F.col("ivf_bucket").isin([int(p) for p in probe]))
    return cosine_topk(pruned, vec_col, id_col, query, k)


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane (no eval-time RNG)."""
    import math

    return [math.sin(seed * 1000003 + j * 7919) for j in range(dim)]


def cosine_near_dup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    n_planes: int = 12,
    threshold: float = 0.9,
    max_bucket: int = 100,
) -> DataFrame:
    """Embedding near-duplicate pairs via random-hyperplane LSH.

    Sign pattern over ``n_planes`` hyperplanes → bucket key; exact cosine
    is computed only within buckets (pair formation bounded by
    ``max_bucket``). P(same bucket) = (1 - θ/π)^n_planes, so near-identical
    vectors collide w.h.p. while the corpus spreads across 2^n_planes keys.
    """
    v = F.col(vec_col).cast("array<double>")
    bits = [
        (_dot(v, F.array(*[F.lit(x) for x in _hyperplane(dim, p)])) > 0).cast("int")
        for p in range(n_planes)
    ]
    bucket = F.concat_ws("", *[b.cast("string") for b in bits])
    keyed = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), bucket.alias("bucket"))

    counts = keyed.groupBy("bucket").agg(F.count("*").alias("bsz"))
    capped = keyed.join(
        F.broadcast(counts.filter((F.col("bsz") > 1) & (F.col("bsz") <= max_bucket))), "bucket"
    )
    a = capped.select("bucket", F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
    b = capped.select("bucket", F.col("id").alias("id_b"), F.col("vec").alias("vec_b"))
    va, vb = F.col("vec_a").cast("array<double>"), F.col("vec_b").cast("array<double>")
    sim = _dot(va, vb) / (_norm(va) * _norm(vb))
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(sim, 6).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )
