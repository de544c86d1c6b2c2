#!/usr/bin/env python
"""Memory-pressure evidence axis (r10 verdict #1): the fourth resource
axis after data scale, skew, and cores. Everything to date ran in a
128 GiB sandbox whose 32 g default heap never forced a spill; a 100 TB
executor lives in the opposite regime — hash aggregates falling back to
sort/spill, SMJs spilling merge buffers. This harness runs the heavy
query families at sf10 under shrinking heaps and records, per query:

    wall sec, memory/disk spill bytes, shuffle write bytes
    (per-stage deltas from AppStatusStore — the same numbers the UI
    shows; stage ids are monotonic, so stages with id > the pre-query
    max belong to this query)

and a VALUE HASH (sum of per-row xxhash64 over 6-dp-rounded columns,
computed IN Spark — no driver collect) compared across heap configs:
a spill path that silently corrupts results shows up as a hash that
disagrees with the 32 g baseline, not just a slow run.

Fault isolation: one subprocess per heap; if the JVM dies (OOM), the
parent marks the in-flight query failed and RESUMES a fresh subprocess
on the remaining queries, so one OOM can't erase the sweep.

Usage:
    python scripts/mem_pressure.py [--sf-dir .localdata/sf10]
        [--heaps 32g,8g,4g] [--queries q_a,q_b] [--reps 2]
Output: JSON to stdout + .localdata/mem_pressure.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Heavy/representative set + the verdict-named spill suspects
# (collect_list-bearing plans, the dedup/cluster ring, pack_sequences).
MEM_QUERIES = [
    "q_agg_groupby_basic",
    "q_report_pricing_summary",
    "q_agg_stats",
    "q_agg_collect",
    "q_join_inner",
    "q_report_nation_volume",
    "q_report_product_profit",
    "q_win_rank",
    "q_win_frame_rows",
    "q_event_rolling_zscore",
    "q_llm_dedup_exact",
    "q_llm_dedup_near",
    "q_llm_dedup_cluster",
    "q_llm_substring_dedup",
    "q_llm_pack_sequences",
    "q_agg_kll_quantile_rollup",
]

PREWARM_SKIP = (
    "events_jsonl,events_partitioned,documents_drift,events_nested,"
    "events_shredded,sink,orders_csv,lineitem_orc"
)

# Raw sketch outputs are heap-SENSITIVE by design, not wrong: the heap
# size moves partial-aggregation boundaries, partials merge in a
# different order, and KLL/HLL merge is not commutative at the
# estimate's last digits (the first sweep correctly flagged
# q_agg_kll_quantile_rollup on exactly this). Since the r11 oracle
# conversion the AUDITED form this sweep runs emits exact values plus
# tolerance BOOLEANS (gate 10× the observed error), so its hash is
# heap-stable and the exemption is retired; it would return for any
# query whose hashed output carries a raw estimate.
HASH_EXEMPT: set[str] = set()


# ----------------------------------------------------------- worker ----


def _stage_metrics(spark) -> dict[int, tuple[int, int, int]]:
    """stageId -> (memSpill, diskSpill, shuffleWrite) for every stage the
    status store currently holds."""
    jvm = spark.sparkContext._jvm
    gw = spark.sparkContext._gateway
    store = spark.sparkContext._jsc.sc().statusStore()
    lst = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    out = {}
    for i in range(lst.size()):
        s = lst.apply(i)
        out[s.stageId()] = (
            s.memoryBytesSpilled(), s.diskBytesSpilled(), s.shuffleWriteBytes()
        )
    return out


def _value_hash(df):
    """Order-insensitive content hash computed IN Spark: floats rounded to
    6 dp first (heap size changes agg strategies and thus float summation
    order; registry queries pre-round their aggregates, same discipline as
    the cross-engine differential compare)."""
    from pyspark.sql import functions as F

    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        t = f.dataType.simpleString()
        if t in ("double", "float"):
            c = F.round(c, 6)
        cols.append(c.cast("string"))
    # decimal(38,0) accumulator: a long sum of xxhash64 overflows under
    # ANSI mode on the first few rows
    return df.select(
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).first()


def warm_worker(spark, sf_dir: str) -> None:
    """Warm python worker pool + page cache + derivatives (bench.py's
    discipline — cold-fork/import noise must not masquerade as a
    resource-axis slowdown). Shared by mem_pressure and
    concurrency_bench so the evidence axes warm identically.
    functionType passed explicitly: under `from __future__ import
    annotations` a locally-imported pandas alias is unresolvable as a
    string type hint."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import PandasUDFType

    _warm = F.pandas_udf(lambda s: s, "long", PandasUDFType.SCALAR)
    spark.range(10_000).repartition(64).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()
    for tbl in ("lineitem", "orders", "customer", "nation", "part",
                "supplier", "region", "events", "documents", "embeddings"):
        p = os.path.join(sf_dir, f"{tbl}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).write.format("noop").mode("overwrite").save()
    from fineventstream_spark.queries.scans import prewarm_derivatives

    prewarm_derivatives(spark, sf_dir)


def worker(heap: str, sf_dir: str, queries: list[str], reps: int) -> None:
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = heap
    from fineventstream_spark.registry import all_queries
    from fineventstream_spark.session import get_spark

    registry = all_queries()
    spark = get_spark(app_name=f"mem-pressure-{heap}")
    warm_worker(spark, sf_dir)
    # sentinel: a JVM death BEFORE this line is a warm-phase failure, not
    # the first query's fault (the first sweep would have blamed and
    # skipped an innocent query)
    print(json.dumps({"warmed": True}), flush=True)

    for name in queries:
        q = registry[name]
        before = _stage_metrics(spark)
        prev_max = max(before, default=-1)
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        after = _stage_metrics(spark)
        mem = disk = shw = 0
        for sid, (m, d, w) in after.items():
            if sid > prev_max:
                mem, disk, shw = mem + m, disk + d, shw + w
        h = _value_hash(q.fn(spark, sf_dir))
        print(json.dumps({
            "query": name,
            "sec": round(min(runs), 3),
            "sec_cold": round(runs[0], 3),
            "spill_mem_bytes": mem,
            "spill_disk_bytes": disk,
            "shuffle_write_bytes": shw,
            "rows": h["n"],
            "value_hash": None if h["h"] is None else str(h["h"]),
        }), flush=True)
        spark.catalog.clearCache()
    print(json.dumps({"done": True}), flush=True)


# ----------------------------------------------------------- parent ----


def run_heap(heap: str, sf_dir: str, reps: int) -> dict[str, dict]:
    """One heap config; resumes across JVM deaths."""
    results: dict[str, dict] = {}
    remaining = [q for q in MEM_QUERIES]
    while remaining:
        cmd = [
            sys.executable, os.path.abspath(__file__), "--worker",
            "--heap", heap, "--sf-dir", sf_dir, "--reps", str(reps),
            "--queries", ",".join(remaining),
        ]
        env = dict(os.environ, SPARK_GRAFT_PREWARM_SKIP=PREWARM_SKIP)
        proc = subprocess.run(cmd, env=env, capture_output=True, text=True, cwd=REPO)
        done = warmed = False
        for line in proc.stdout.splitlines():
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if rec.get("done"):
                done = True
            elif rec.get("warmed"):
                warmed = True
            elif "query" in rec:
                results[rec.pop("query")] = rec
        if done:
            break
        if not warmed:
            # the JVM died in the WARM phase — no query ever ran; blaming
            # (and skipping) remaining[0] would falsify the evidence blob
            tail = proc.stderr.strip().splitlines()[-3:]
            print(f"# {heap}: JVM died during WARM-UP (no query ran): {tail}",
                  file=sys.stderr)
            results["__warmup__"] = {"failed": True, "stderr_tail": tail}
            break
        # the worker died mid-query: the first un-recorded name is the victim
        victim = next((q for q in remaining if q not in results), None)
        if victim is None:
            break
        tail = proc.stderr.strip().splitlines()[-3:]
        results[victim] = {"failed": True, "stderr_tail": tail}
        print(f"# {heap}: {victim} KILLED the JVM (recorded, resuming)",
              file=sys.stderr)
        remaining = remaining[remaining.index(victim) + 1:]
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".localdata", "sf10"))
    ap.add_argument("--heaps", default="32g,8g,4g")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--heap", default="32g")
    a = ap.parse_args()

    if a.worker:
        worker(a.heap, a.sf_dir, a.queries.split(","), a.reps)
        return

    if a.queries:
        MEM_QUERIES[:] = a.queries.split(",")

    per_heap: dict[str, dict] = {}
    for heap in a.heaps.split(","):
        print(f"# heap {heap} ...", file=sys.stderr)
        per_heap[heap] = run_heap(heap, a.sf_dir, a.reps)
        tot = sum(r["sec"] for r in per_heap[heap].values() if "sec" in r)
        print(f"# heap {heap}: total {tot:.1f}s, "
              f"{sum(1 for r in per_heap[heap].values() if r.get('failed'))} failed",
              file=sys.stderr)

    heaps = list(per_heap)
    base = heaps[0]
    summary = {}
    for q in MEM_QUERIES:
        row = {}
        for h in heaps:
            r = per_heap[h].get(q, {})
            row[h] = {
                k: r.get(k)
                for k in ("sec", "spill_mem_bytes", "spill_disk_bytes", "failed")
                if k in r
            }
        b = per_heap[base].get(q, {})
        hashes = {
            h: per_heap[h][q]["value_hash"]
            for h in heaps
            if q in per_heap[h] and "value_hash" in per_heap[h][q]
        }
        if q in HASH_EXEMPT:
            row["hash_consistent"] = "exempt (sketch merge order is heap-dependent)"
        else:
            row["hash_consistent"] = len(set(hashes.values())) <= 1
        if b.get("sec"):
            row["slowdown_vs_" + base] = {
                h: round(per_heap[h][q]["sec"] / b["sec"], 2)
                for h in heaps
                if q in per_heap[h] and "sec" in per_heap[h][q]
            }
        summary[q] = row
    ev = {"sf_dir": a.sf_dir, "heaps": heaps, "reps": a.reps,
          "queries": summary, "raw": per_heap}
    out = os.path.join(REPO, ".localdata", "mem_pressure.json")
    with open(out, "w") as f:
        json.dump(ev, f, indent=2)
    print(json.dumps(ev, indent=2))


if __name__ == "__main__":
    main()
