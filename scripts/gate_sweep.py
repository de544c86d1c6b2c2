#!/usr/bin/env python
"""Recall-gate sweep over the gated dedup queries at a given fixture.

Each scale decade has caught a new collapse (r10: hyperplane recall-0 at
sf10; r11: SimHash 0.48; r12: embedding cap overflow at sf30), so every
round runs the audit forms one decade up and checks every hash-checked
gate boolean. Prints one JSON line per query:
  {"query": ..., "sf": ..., "gates": {...}, "ok": bool, "sec": N}

Usage: python scripts/gate_sweep.py <sf_dir> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fineventstream_spark.registry import all_queries  # noqa: E402
from fineventstream_spark.session import get_spark  # noqa: E402

GATED = {
    "q_llm_dedup_near": ("recall_ok", "near_recall_ok"),
    "q_llm_dedup_ngram_jaccard": ("recall_ok", "near_recall_ok"),
    "q_llm_dedup_simhash": ("recall_ok", "near_recall_ok"),
    "q_llm_dedup_embedding": ("recall_ok",),
    "q_llm_near_dedup_pipeline": ("recall_ok", "near_recall_ok", "no_planted_leak"),
    "q_llm_dedup_incremental": ("matches_recompute",),
    "q_llm_dedup_retraction": ("matches_retracted_recompute",),
}


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or list(GATED)
    os.environ.pop("SPARK_GRAFT_AUDIT", None)  # audited forms
    spark = get_spark(app_name="gate-sweep")
    registry = all_queries()
    sf = os.path.basename(os.path.normpath(sf_dir))
    n_bad = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            rows = registry[name].fn(spark, sf_dir).collect()
            gates = {
                c: all(bool(r[c]) for r in rows) if rows else None
                for c in GATED[name]
            }
            ok = bool(rows) and all(v is True for v in gates.values())
        except Exception as exc:  # noqa: BLE001 — isolate per query
            gates, ok = {"error": f"{type(exc).__name__}: {exc}"[:300]}, False
        if not ok:
            n_bad += 1
        print(json.dumps({
            "query": name, "sf": sf, "gates": gates, "ok": ok,
            "sec": round(time.perf_counter() - t0, 1),
        }), flush=True)
        from fineventstream_spark.operators.dedup import release_intermediates

        release_intermediates(spark)
        spark.catalog.clearCache()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
