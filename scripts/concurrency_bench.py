#!/usr/bin/env python
"""Concurrency evidence axis: the suite under K simultaneous query
streams in ONE session — the fifth resource axis after data scale, skew,
cores, and memory pressure.

A 100 TB cluster is multi-tenant: the scheduler interleaves many
queries, and a plan that is correct and fast solo can (a) starve under
fair sharing, (b) collapse throughput by thrashing a shared resource
(driver lock, Python worker pool, page cache), or (c) — worst — return
WRONG answers if any driver-side state the engine memoizes (literal
bucket bounds, bucketed-layout sidecars, persist registries) is not
safe under concurrent query construction. None of the four existing
axes exercises any of that: every prior measurement ran queries one at
a time.

Protocol (one subprocess = one JVM, mem_pressure.py's fault isolation):

1. serial baseline: the representative set, min-of-``reps`` each, plus
   an order-insensitive value hash per query (mem_pressure's in-Spark
   xxhash64 sum — no driver collect);
2. K streams: K threads, each in its OWN fair-scheduler pool
   (``spark.scheduler.mode=FAIR`` + per-thread
   ``spark.scheduler.pool`` — unconfigured pools share FAIRly at equal
   weight, the standard multi-tenant setup), each running the full set
   once, rotated by ``i*len/K`` so the streams collide on DIFFERENT
   queries at any instant; record per-query wall time and value hash;
3. compare: every hash must equal the serial hash (correctness under
   concurrency), makespan vs serial total gives the throughput ratio
       R = (K × T_serial) / T_makespan
   (R ≈ K would mean free concurrency — impossible at fixed cores;
   R ≥ 1 means the box does MORE aggregate work per second under
   concurrent load than serially — overlap fills scheduling gaps and
   stragglers' idle cores; R < 1 means interference costs more than
   overlap buys — a shared-resource bottleneck worth naming), and
   per-query latency inflation = concurrent / serial (mean over
   streams) names which families suffer under contention.

Usage:
    python scripts/concurrency_bench.py [--sf-dir .localdata/sf10]
        [--streams 4] [--reps 2] [--queries q_a,q_b]
Output: JSON to stdout + .localdata/concurrency_bench.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# One query per execution shape (core_scaling's discipline), biased
# toward plans that touch shared driver-side state: bucketed layouts
# (join_inner, nation_volume), memoized literal bounds + Arrow workers
# (rolling_zscore), persist-tracked intermediates (dedup_near), sketch
# UDAFs (kll rollup), explode+broadcast (bm25).
CONC_QUERIES = [
    "q_agg_groupby_basic",
    "q_report_pricing_summary",
    "q_join_inner",
    "q_report_nation_volume",
    "q_join_asof",
    "q_win_rank",
    "q_event_rolling_zscore",
    "q_llm_dedup_exact",
    "q_llm_dedup_near",
    "q_llm_bm25",
    "q_agg_kll_quantile_rollup",
]

PREWARM_SKIP = (
    "events_jsonl,events_partitioned,documents_drift,events_nested,"
    "events_shredded,sink,orders_csv,lineitem_orc"
)


# ----------------------------------------------------------- worker ----


def _run_one(spark, registry, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def worker(sf_dir: str, queries: list[str], streams: int, reps: int) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from mem_pressure import _value_hash, warm_worker
    from fineventstream_spark.registry import all_queries
    from fineventstream_spark.session import get_spark

    registry = all_queries()
    spark = get_spark(
        app_name=f"concurrency-{streams}x",
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )
    warm_worker(spark, sf_dir)  # shared warm discipline (mem_pressure.py)
    # untimed pass: materialize bucketed layouts / .cache derivatives the
    # set depends on, so neither arm pays one-off build cost
    for name in queries:
        _run_one(spark, registry, name, sf_dir)

    # --- serial baseline -------------------------------------------------
    serial: dict[str, float] = {}
    hashes: dict[str, tuple] = {}
    for name in queries:
        runs = [_run_one(spark, registry, name, sf_dir) for _ in range(reps)]
        serial[name] = min(runs)
        h = _value_hash(registry[name].fn(spark, sf_dir))
        hashes[name] = (h["n"], None if h["h"] is None else str(h["h"]))
    print(json.dumps({"serial": {k: round(v, 3) for k, v in serial.items()},
                      "serial_hashes": hashes}), flush=True)

    # --- K concurrent streams -------------------------------------------
    # Two concurrent phases split by a barrier: phase A (timed — the
    # makespan measures ONLY the K×set query executions, matching what
    # the serial total measures) and phase B (value hashes, still under
    # full concurrency so the correctness evidence is contention-borne,
    # but excluded from the throughput arithmetic — the first cut ran
    # hashes inside the makespan while the serial baseline excluded
    # them, silently understating R by ~2×).
    stream_times: list[dict[str, float]] = [dict() for _ in range(streams)]
    stream_hashes: list[dict[str, tuple]] = [dict() for _ in range(streams)]
    errors: list[str] = []
    barrier = threading.Barrier(streams)
    makespans: list[float] = [0.0] * streams

    def run_stream(i: int) -> None:
        try:
            spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", f"stream-{i}"
            )
            off = (i * len(queries)) // streams
            rotation = queries[off:] + queries[:off]
            t0 = time.perf_counter()
            for name in rotation:
                stream_times[i][name] = _run_one(spark, registry, name, sf_dir)
            makespans[i] = time.perf_counter() - t0
            barrier.wait(timeout=3600)
            for name in rotation:
                h = _value_hash(registry[name].fn(spark, sf_dir))
                stream_hashes[i][name] = (
                    h["n"], None if h["h"] is None else str(h["h"])
                )
        except Exception as exc:  # noqa: BLE001 — recorded, not swallowed
            errors.append(f"stream-{i}: {type(exc).__name__}: {exc}")
            barrier.abort()

    t0 = time.perf_counter()
    threads = [
        threading.Thread(target=run_stream, args=(i,), daemon=True)
        for i in range(streams)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    makespan = max(makespans) if any(makespans) else time.perf_counter() - t0

    print(json.dumps({
        "streams": streams,
        "makespan_sec": round(makespan, 3),
        "stream_times": [
            {k: round(v, 3) for k, v in st.items()} for st in stream_times
        ],
        "stream_hashes": stream_hashes,
        "errors": errors,
        "done": True,
    }), flush=True)


# ----------------------------------------------------------- parent ----


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".localdata", "sf10"))
    ap.add_argument("--streams", default="4")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--worker-streams", type=int, default=4)
    a = ap.parse_args()

    queries = a.queries.split(",") if a.queries else CONC_QUERIES

    if a.worker:
        worker(a.sf_dir, queries, a.worker_streams, a.reps)
        return

    out_blob: dict = {"sf_dir": a.sf_dir, "queries": queries, "reps": a.reps,
                      "runs": {}}
    for streams in [int(s) for s in a.streams.split(",")]:
        cmd = [
            sys.executable, os.path.abspath(__file__), "--worker",
            "--worker-streams", str(streams), "--sf-dir", a.sf_dir,
            "--reps", str(a.reps), "--queries", ",".join(queries),
        ]
        env = dict(os.environ, SPARK_GRAFT_PREWARM_SKIP=PREWARM_SKIP)
        print(f"# streams={streams} ...", file=sys.stderr)
        proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                              cwd=REPO)
        serial = serial_hashes = conc = None
        for line in proc.stdout.splitlines():
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if "serial" in rec:
                serial, serial_hashes = rec["serial"], rec["serial_hashes"]
            elif rec.get("done"):
                conc = rec
        if serial is None or conc is None:
            tail = proc.stderr.strip().splitlines()[-5:]
            out_blob["runs"][str(streams)] = {"failed": True,
                                              "stderr_tail": tail}
            print(f"# streams={streams}: WORKER DIED: {tail}", file=sys.stderr)
            continue

        serial_total = sum(serial.values())
        makespan = conc["makespan_sec"]
        inflation = {}
        for q in queries:
            times = [st[q] for st in conc["stream_times"] if q in st]
            if times and serial.get(q):
                inflation[q] = round(sum(times) / len(times) / serial[q], 2)
        # a crashed stream leaves an empty/partial hash dict; all() over
        # nothing would read as green — require K COMPLETE matching sets
        hash_ok = (
            not conc["errors"]
            and all(set(sh) == set(queries) for sh in conc["stream_hashes"])
            and all(
                sh.get(q) == serial_hashes.get(q)
                for sh in conc["stream_hashes"]
                for q in queries
            )
        )
        out_blob["runs"][str(streams)] = {
            "serial_total_sec": round(serial_total, 2),
            "makespan_sec": makespan,
            "throughput_ratio": round(streams * serial_total / makespan, 2),
            "latency_inflation": inflation,
            "hash_consistent": hash_ok,
            "errors": conc["errors"],
            "serial": serial,
            "stream_times": conc["stream_times"],
        }
        print(f"# streams={streams}: serial {serial_total:.1f}s, makespan "
              f"{makespan:.1f}s, R={streams * serial_total / makespan:.2f}, "
              f"hashes {'OK' if hash_ok else 'MISMATCH'}", file=sys.stderr)

    out = os.path.join(REPO, ".localdata", "concurrency_bench.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(out_blob, f, indent=2)
    print(json.dumps(out_blob, indent=2))


if __name__ == "__main__":
    main()
