#!/usr/bin/env python
"""Noise-immune per-query cost model: jobs / stages / tasks / shuffle bytes.

Wall-clock on this sandbox varies 3x+ with co-tenant interference
(observed r14: the same AUDIT=off sweep read 21.5 s at 02:18 and 68.2 s
at 23:00), so optimization decisions in this round are grounded in
DETERMINISTIC metrics: number of Spark jobs an action runs, stages,
tasks, shuffle bytes written and input bytes read. These depend only on
the plan and the data, never on the neighbors.

Usage:
    python scripts/query_metrics.py out.json [query ...]

Runs each named query (default: bench.py HEADLINE) ONCE via the noop
sink inside its own job group and aggregates that group's stage metrics
from the app status store. Mirrors bench.py session + cache hygiene.
"""

from __future__ import annotations

import json
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fineventstream_spark.registry import all_queries
from fineventstream_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    registry = all_queries()
    spark = get_spark(app_name="fes-query-metrics")
    sc = spark.sparkContext
    # same warm-up as bench.py so no query is charged one-off work
    from pyspark.sql import functions as F

    spark.range(1_000_000).selectExpr("sum(id)").collect()

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(10_000).repartition(64).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()
    for tbl in ("lineitem", "orders", "customer", "nation", "part",
                "supplier", "region", "events", "documents", "embeddings"):
        p = os.path.join(SF_DIR, f"{tbl}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).write.format("noop").mode("overwrite").save()
    from fineventstream_spark.queries.scans import prewarm_derivatives

    prewarm_derivatives(spark, SF_DIR)

    store = sc._jsc.sc().statusStore()
    tracker = sc.statusTracker()
    results: dict[str, dict] = {}
    for name in names:
        q = registry.get(name)
        if q is None:
            continue
        group = f"qm-{name}"
        sc.setJobGroup(group, name)
        try:
            q.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            err = None
        except Exception as exc:  # noqa: BLE001 — isolate per query
            err = f"{type(exc).__name__}: {exc}"[:200]
        sc.setJobGroup(None, None)
        job_ids = tracker.getJobIdsForGroup(group)
        stages: set[int] = set()
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info:
                stages.update(info.stageIds)
        n_tasks = 0
        shuffle_write = 0
        input_bytes = 0
        skipped = 0
        for sid in sorted(stages):
            try:
                sd = store.lastStageAttempt(sid)
            except Exception:
                skipped += 1  # stage never ran (skipped via reuse)
                continue
            n_tasks += sd.numCompleteTasks()
            shuffle_write += sd.shuffleWriteBytes()
            input_bytes += sd.inputBytes()
        results[name] = {
            "jobs": len(job_ids),
            "stages": len(stages),
            "stages_skipped": skipped,
            "tasks": n_tasks,
            "shuffle_write_bytes": shuffle_write,
            "input_bytes": input_bytes,
            "err": err,
        }
        print(
            f"# {name}: jobs={len(job_ids)} stages={len(stages)} "
            f"tasks={n_tasks} shuffleW={shuffle_write} in={input_bytes}"
            + (f" ERR={err}" if err else ""),
            file=sys.stderr,
        )
        spark.catalog.clearCache()
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"n": len(results), "out": out_path}))


if __name__ == "__main__":
    main()
