#!/usr/bin/env python
"""r15 verdict #4: A/B a user_id-bucketed events layout under the REAL
registered query functions (no transcription drift): the layout arm
monkeypatches catalog.load_table to serve the bucketed derivative for
"events"; the plain arm restores it. Deterministic metrics + wall clock,
interleaved reps."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: F401

import fineventstream_spark.catalog as catalog
from fineventstream_spark.operators.bucketed import bucketed_table
from fineventstream_spark.registry import all_queries
from fineventstream_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.localdata/sf10")
QUERIES = [
    "q_event_rolling_active",
    "q_event_retention",
    "q_event_sessionize",
    "q_event_funnel_windowed",
    "q_udaf_grouped",
    "q_session_window",
]

_orig_load_table = catalog.load_table


def _patched_load_table(spark, sf_dir, name):
    if name == "events":
        return bucketed_table(spark, sf_dir, "events", key="user_id")
    return _orig_load_table(spark, sf_dir, name)


def measure(spark, tag, fn, results):
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    tracker = sc.statusTracker()
    group = f"ab-{tag}"
    sc.setJobGroup(group, tag)
    t0 = time.perf_counter()
    try:
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        err = None
    except Exception as exc:  # noqa: BLE001
        err = f"{type(exc).__name__}: {exc}"[:300]
    wall = time.perf_counter() - t0
    sc.setJobGroup(None, None)
    job_ids = tracker.getJobIdsForGroup(group)
    stages = set()
    for jid in job_ids:
        info = tracker.getJobInfo(jid)
        if info:
            stages.update(info.stageIds)
    shuffle_write = input_bytes = n_tasks = 0
    for sid in sorted(stages):
        try:
            sd = store.lastStageAttempt(sid)
        except Exception:
            continue
        n_tasks += sd.numCompleteTasks()
        shuffle_write += sd.shuffleWriteBytes()
        input_bytes += sd.inputBytes()
    results[tag] = {
        "jobs": len(job_ids),
        "stages": len(stages),
        "tasks": n_tasks,
        "shuffle_write_bytes": shuffle_write,
        "input_bytes": input_bytes,
        "wall_sec": round(wall, 3),
        "err": err,
    }
    print(f"# {tag}: {results[tag]}", file=sys.stderr)
    spark.catalog.clearCache()


def run_arm(spark, registry, name, arm, rep, results):
    if arm == "layout":
        catalog.load_table = _patched_load_table
    try:
        measure(spark, f"{name}|{arm}|{rep}", registry[name].fn, results)
    finally:
        catalog.load_table = _orig_load_table


def main():
    spark = get_spark(app_name="events-layout-ab")
    registry = all_queries()
    results = {}
    # build the layout OUTSIDE any measured region (ingest-side derivative,
    # same discipline as the lineitem/orders layouts: the layout IS the lake)
    t_build0 = time.perf_counter()
    bucketed_table(spark, SF_DIR, "events", key="user_id").count()
    results["__layout_build_sec"] = round(time.perf_counter() - t_build0, 3)
    # warm page cache for the base table so arm order doesn't bias
    spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()
    # sanity: layout arm results must equal plain arm results (sorted rows)
    sanity = {}
    for name in QUERIES:
        plain = registry[name].fn(spark, SF_DIR)
        catalog.load_table = _patched_load_table
        try:
            lay = registry[name].fn(spark, SF_DIR)
        finally:
            catalog.load_table = _orig_load_table
        same = (
            plain.exceptAll(lay).isEmpty() and lay.exceptAll(plain).isEmpty()
        )
        sanity[name] = bool(same)
        print(f"# sanity {name}: identical={same}", file=sys.stderr)
    results["__sanity_identical"] = sanity
    spark.catalog.clearCache()
    for name in QUERIES:
        for rep in (1, 2):
            run_arm(spark, registry, name, "plain", rep, results)
            run_arm(spark, registry, name, "layout", rep, results)
    out = os.environ.get("AB_OUT", "/tmp/events_layout_ab.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(json.dumps({"out": out}))


if __name__ == "__main__":
    main()
