#!/usr/bin/env python
"""IVF index epoch compaction evidence (r13 verdict ask #2).

Simulates a year-class append history on the ANN ring: build a base
index over sf0.1-scale synthetic embeddings, fold in many small daily
append epochs (+ a tombstone batch), then measure probe latency and
parquet file count against the many-epoch index vs the same index after
``compact_ivf_index`` — the small-files/listing decay the minhash store
closed in r13, now closed for the vector side. Also verifies probe-
result equality pre/post minus tombstoned ids (the unit-test invariant,
here at evidence scale).

Prints one JSON line:
  {"n_epochs_before": N, "files_before": F1, "files_after": F2,
   "probe_before_sec": A, "probe_after_sec": B, "speedup": A/B, ...}

Usage: python scripts/ivf_compaction_evidence.py [n_epochs]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fineventstream_spark.operators import ann_index  # noqa: E402
from fineventstream_spark.session import get_spark  # noqa: E402

DIM = 64


def _vectors(spark, lo: int, n: int):
    """Deterministic label-centered synthetic embeddings (the fixture
    recipe's shape) — id-seeded, no RNG."""
    return spark.range(lo, lo + n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (
                    F.sin(F.col("id") % 10 + j)
                    + F.sin(F.col("id") * (j + 1)) * F.lit(0.1)
                ).cast("float")
                for j in range(DIM)
            ]
        ).alias("embedding"),
    )


def _count_files(path: str) -> int:
    total = 0
    for _, _, files in os.walk(os.path.join(path, "vectors")):
        total += sum(1 for f in files if f.endswith(".parquet"))
    return total


def _probe(spark, path: str, query) -> set:
    return {
        r.vec_id
        for r in ann_index.query_ivf_index(
            spark, path, "embedding", "vec_id", query, k=10, nprobe=4
        ).collect()
    }


def main() -> None:
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    base_n, epoch_n = 200_000, 2_000
    spark = get_spark(app_name="ivf-compaction-evidence")
    work = tempfile.mkdtemp(prefix="ivf_evidence_")
    path = os.path.join(work, "ivf")
    try:
        ann_index.build_ivf_index(
            _vectors(spark, 0, base_n), "embedding", "vec_id", path,
            n_lists=16, iterations=3,
        )
        t_append0 = time.perf_counter()
        for e in range(n_epochs):
            ann_index.append_ivf_index(
                _vectors(spark, base_n + e * epoch_n, epoch_n),
                "embedding", "vec_id", path, tag=f"day:{e}",
            )
        append_sec = time.perf_counter() - t_append0
        # a takedown batch mid-history: compaction must erase these
        ann_index.tombstone_ivf_index(
            spark.range(100, 200).select(F.col("id").alias("vec_id")),
            path, tag="takedown:0",
        )

        query = [round(math.sin(j + 1), 6) for j in range(DIM)]
        files_before = _count_files(path)
        n_epochs_before = len(ann_index._load_sidecar(path)["epochs"])
        _probe(spark, path, query)  # warm listing caches once, like a service
        t0 = time.perf_counter()
        before = _probe(spark, path, query)
        probe_before = time.perf_counter() - t0

        t0 = time.perf_counter()
        ann_index.compact_ivf_index(spark, path)
        compact_sec = time.perf_counter() - t0

        files_after = _count_files(path)
        _probe(spark, path, query)
        t0 = time.perf_counter()
        after = _probe(spark, path, query)
        probe_after = time.perf_counter() - t0
        # erased ids must be gone; everything else identical
        assert after == {i for i in before if not (100 <= i < 200)}, (
            "probe mismatch after compaction"
        )
        raw = spark.read.parquet(
            os.path.join(path, "vectors", f"e={ann_index._load_sidecar(path)['epochs'][0]}")
        )
        n_erased = raw.filter(F.col("vec_id").between(100, 199)).count()
        assert n_erased == 0, "tombstoned vectors survived compaction"

        print(json.dumps({
            "n_epochs_before": n_epochs_before,
            "n_vectors": base_n + n_epochs * epoch_n,
            "append_total_sec": round(append_sec, 2),
            "files_before": files_before,
            "files_after": files_after,
            "probe_before_sec": round(probe_before, 3),
            "probe_after_sec": round(probe_after, 3),
            "speedup": round(probe_before / max(probe_after, 1e-9), 2),
            "compact_sec": round(compact_sec, 2),
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
