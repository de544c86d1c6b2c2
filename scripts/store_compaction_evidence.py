#!/usr/bin/env python
"""Fingerprint-store epoch compaction evidence (r12 verdict #2).

Simulates a year-class append history: build a base store, fold in many
small daily epochs, then measure the incremental-dedup probe latency
against the many-epoch store vs the same store after
``compact_minhash_store`` — the small-files/listing regression the
engine already measured for the lake derivatives (BASELINE r11), now
closed for the store. Also verifies probe-result equality pre/post
(the same invariant the unit test pins, here at evidence scale).

Prints one JSON line:
  {"n_epochs_before": N, "files_before": F1, "files_after": F2,
   "probe_before_sec": A, "probe_after_sec": B, "speedup": A/B, ...}

Usage: python scripts/store_compaction_evidence.py [n_epochs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fineventstream_spark.operators import dedup  # noqa: E402
from fineventstream_spark.session import get_spark  # noqa: E402

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform"
).split()


def _texts(spark, lo: int, n: int):
    from pyspark.sql import functions as F

    return (
        spark.range(lo, lo + n)
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                *[
                    F.element_at(
                        F.array(*[F.lit(w) for w in WORDS]),
                        (
                            F.pmod(F.col("id") * (j * 7 + 3) + j, F.lit(len(WORDS)))
                            + 1
                        ).cast("int"),
                    )
                    for j in range(18)
                ],
            ),
        )
        .withColumnRenamed("id", "doc_id")
    )


def _count_files(root: str) -> int:
    n = 0
    for _d, _s, files in os.walk(root):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def _probe(spark, store: str, shard, reps: int = 3) -> float:
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        dedup.incremental_dedup_against_store(
            spark, store, shard, "text", "doc_id", threshold=0.5
        ).write.format("noop").mode("overwrite").save()
        dedup.release_intermediates(spark)
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    spark = get_spark(app_name="store-compaction-evidence")
    root = tempfile.mkdtemp(prefix="store_compact_")
    store = os.path.join(root, "store")
    try:
        dedup.build_minhash_store(
            _texts(spark, 0, 50_000), "text", "doc_id", store
        )
        lo = 1_000_000
        for i in range(n_epochs - 1):
            _, sigs = dedup.incremental_dedup_against_store(
                spark, store, _texts(spark, lo, 500), "text", "doc_id",
                threshold=0.5, return_new_sigs=True,
            )
            dedup.append_minhash_store(sigs, store, tag=f"day{i}")
            dedup.release_intermediates(spark)
            lo += 500
            if (i + 1) % 10 == 0:
                print(f"# appended epoch {i + 1}/{n_epochs - 1}", file=sys.stderr)

        shard = _texts(spark, 5_000_000, 2_000).cache()
        shard.count()
        meta = dedup._load_store_spec(store)
        files_before = _count_files(store)
        probe_before = _probe(spark, store, shard)
        before_rows = dedup.incremental_dedup_against_store(
            spark, store, shard, "text", "doc_id", threshold=0.5
        ).count()

        t0 = time.perf_counter()
        assert dedup.compact_minhash_store(spark, store)
        compact_sec = round(time.perf_counter() - t0, 3)

        files_after = _count_files(store)
        probe_after = _probe(spark, store, shard)
        after_rows = dedup.incremental_dedup_against_store(
            spark, store, shard, "text", "doc_id", threshold=0.5
        ).count()
        assert before_rows == after_rows, (before_rows, after_rows)

        print(json.dumps({
            "metric": "store_compaction_probe_sec",
            "n_epochs_before": len(meta["epochs"]),
            "files_before": files_before,
            "files_after": files_after,
            "probe_before_sec": probe_before,
            "probe_after_sec": probe_after,
            "speedup": round(probe_before / max(probe_after, 1e-9), 2),
            "compact_sec": compact_sec,
            "probe_rows_equal": before_rows == after_rows,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
