#!/usr/bin/env python
"""Measured evidence for the r12 incremental-dedup claim: dedup of a new
shard against the persisted fingerprint store costs O(shard + matches),
not O(corpus).

Three timed arms (production forms, no audit passes), interleaved
rep-by-rep (the BASELINE A/B discipline — host drift lands on all arms
equally), min-of-N each:

  build        one-off store build over the history split (the amortized
               cost a daily pipeline pays once)
  incremental  shard-vs-store dedup (the recurring daily cost)
  fromscratch  full-corpus near-dedup (exact-collapse + MinHash-LSH +
               star edges — what a store-less pipeline pays every day)

The O(shard)-not-O(corpus) claim is a SCALING statement, so the shard is
a FIXED absolute size (default 50k docs — the newest ids): run this at
two corpus scales and the incremental arm should stay ~flat while the
from-scratch arm grows with the corpus.

Usage: python scripts/incremental_dedup_evidence.py [SF_DIR] [REPS] [SHARD_DOCS]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fineventstream_spark.operators import dedup  # noqa: E402
from fineventstream_spark.session import get_spark  # noqa: E402


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    shard_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
    spark = get_spark()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    max_id = docs.agg(F.max("doc_id")).first()[0]
    thr = int(max_id + 1 - shard_docs)
    assert thr > 0, "corpus smaller than the requested shard"
    history = docs.filter(F.col("doc_id") < thr)
    shard = docs.filter(F.col("doc_id") >= thr)
    n_hist, n_shard = history.count(), shard.count()

    work = tempfile.mkdtemp(prefix="incr_dedup_evidence_")
    times: dict[str, list[float]] = {"build": [], "incremental": [], "fromscratch": []}
    try:
        for rep in range(reps):
            store = os.path.join(work, f"store_{rep}")

            t0 = time.monotonic()
            dedup.build_minhash_store(history, "text", "doc_id", store)
            times["build"].append(time.monotonic() - t0)
            spark.catalog.clearCache()
            dedup.release_intermediates(spark)

            t0 = time.monotonic()
            _noop(
                dedup.incremental_dedup_against_store(
                    spark, store, shard, "text", "doc_id", threshold=0.5
                )
            )
            times["incremental"].append(time.monotonic() - t0)
            spark.catalog.clearCache()
            dedup.release_intermediates(spark)

            from fineventstream_spark.queries.llm import _exact_collapse, _star_edges

            t0 = time.monotonic()
            rep_corpus, members = _exact_collapse(docs)
            fs = (
                dedup.minhash_lsh_candidates(rep_corpus, "text", "doc_id")
                .filter(F.col("est_jaccard") >= 0.5)
                .select("id_a", "id_b", "est_jaccard")
                .unionByName(_star_edges(members, "est_jaccard", 1.0))
            )
            _noop(fs)
            times["fromscratch"].append(time.monotonic() - t0)
            spark.catalog.clearCache()
            dedup.release_intermediates(spark)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    best = {k: round(min(v), 3) for k, v in times.items()}
    print(
        json.dumps(
            {
                "metric": "incremental_dedup_evidence",
                "sf_dir": sf_dir,
                "n_history": n_hist,
                "n_shard": n_shard,
                "shard_frac": round(n_shard / (n_hist + n_shard), 4),
                "sec": best,
                "reps": {k: [round(x, 3) for x in v] for k, v in times.items()},
                "incremental_vs_fromscratch": round(
                    best["incremental"] / best["fromscratch"], 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
