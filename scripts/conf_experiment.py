#!/usr/bin/env python
"""Ask-#6 experiment (r7 verdict): can session confs close the plain
scan+agg per-byte gap vs DuckDB (pricing_summary / groupby_basic /
dq_violations, ~4x at sf30)?

Candidates (all documented Spark knobs, see session.py for adopted ones):
- spark.sql.parquet.columnarReaderBatchSize (default 4096): larger batches
  amortize per-batch dispatch in the vectorized parquet reader.
- spark.sql.inMemoryColumnarStorage.batchSize: irrelevant here (no cache).
- spark.sql.columnVector.offheap.enabled: column vectors off-heap (less GC
  pressure on wide scans). Dynamic conf — A/B-able in-session.
- spark.memory.offHeap.enabled/size: STATIC (per-JVM) — needs process-level
  alternation; only adopt on a consistent >15% win across alternations.

Methodology (BASELINE.md "Benchmark methodology"): warmed same-session
interleaved A/B, min of reps, one knob at a time.

Usage: SPARK_GRAFT_SF_DIR=/root/repo/.localdata/sf30 python scripts/conf_experiment.py

RESULT (r8, sf30, recorded in BASELINE.md): no knob moves the needle.
A first 3-rep pass suggested batch8k -12..-17% on two queries, but a
focused 5-rep interleaved base-vs-8k rerun showed <2% on all three
(groupby_basic 2.96 vs 2.95, pricing 2.38 vs 2.44, dq 4.24 vs 4.21);
cv-offheap and batch16k were neutral-to-worse. CLOSED as engine floor:
the plain scan+agg gap vs DuckDB is per-byte scan-kernel constants, not
a configuration or plan defect — horizontal at cluster scale.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fineventstream_spark.registry import all_queries
from fineventstream_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.localdata/sf30")
QUERIES = ["q_agg_groupby_basic", "q_report_pricing_summary", "q_dq_violations"]
REPS = 3


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    registry = all_queries()
    spark = get_spark(app_name="conf-exp")
    # page-cache warm
    for q in QUERIES:
        registry[q].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    knobs = [
        ("baseline", {}),
        ("batch8k", {"spark.sql.parquet.columnarReaderBatchSize": "8192"}),
        ("batch16k", {"spark.sql.parquet.columnarReaderBatchSize": "16384"}),
        ("cv-offheap", {"spark.sql.columnVector.offheap.enabled": "true"}),
    ]
    results: dict[str, dict[str, float]] = {k: {} for k, _ in knobs}
    for rep in range(REPS):
        for label, conf in knobs:
            saved = {}
            for k, v in conf.items():
                saved[k] = spark.conf.get(k, None)
                spark.conf.set(k, v)
            for q in QUERIES:
                dt = timed(registry[q].fn(spark, SF_DIR))
                results[label][q] = min(results[label].get(q, 1e9), dt)
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
    print(f"{'knob':12s} " + " ".join(f"{q[:22]:>24s}" for q in QUERIES))
    for label, _ in knobs:
        print(
            f"{label:12s} "
            + " ".join(f"{results[label][q]:>24.2f}" for q in QUERIES)
        )
    spark.stop()


if __name__ == "__main__":
    main()
