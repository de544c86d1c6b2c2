#!/usr/bin/env python
"""r12 state-store axis: high-cardinality streaming state under the
in-heap HDFSBackedStateStoreProvider vs RocksDB (verdict #3).

The dedup/alert state lives per-key in the state store; at 100 TB key
cardinality the in-heap provider bounds it by executor heap (it keeps
recent store versions as in-memory maps), while RocksDB keeps state on
local disk with a block-cache. This script runs the SAME stateful query
— dropDuplicatesWithinWatermark over N_KEYS distinct keys, watermark
wide enough that nothing expires, so the store must HOLD the full key
set — under both providers in separate fixed-heap subprocess JVMs, and
reports per-provider: wall time, peak state rows, in-heap state bytes
(memoryUsedBytes), RocksDB on-disk bytes, and per-batch latency stats.

Usage: python scripts/rocksdb_state_evidence.py [N_KEYS] [DRIVER_MEM]
Defaults: 1_500_000 keys, 3g heap. Prints one JSON line per provider.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import json, sys, time
    sys.path.insert(0, %(repo)r)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    provider, inp, out, ckpt = sys.argv[1:5]
    b = (
        SparkSession.builder.master("local[8]")
        .appName(f"state-evidence-{provider}")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if provider == "rocksdb":
        b = b.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    src = (
        spark.readStream.schema("k long, ets long")
        .option("maxFilesPerTrigger", "1")
        .json(inp)
        .withColumn("ets", F.timestamp_seconds("ets"))
        .withWatermark("ets", "30 days")
        .dropDuplicatesWithinWatermark(["k"])
    )
    t0 = time.monotonic()
    q = (
        src.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    ok = q.awaitTermination(1800)
    wall = time.monotonic() - t0
    rows = spark.read.parquet(out).count()
    progress = [json.loads(p.json) for p in q.recentProgress]
    sops = [p["stateOperators"][0] for p in progress if p.get("stateOperators")]
    durs = sorted(
        p["batchDuration"] for p in progress if p.get("numInputRows", 0) > 0
    )
    cm = sops[-1].get("customMetrics", {}) if sops else {}
    print("RESULT" + json.dumps({
        "provider": provider,
        "finished": bool(ok),
        "wall_sec": round(wall, 1),
        "output_rows": rows,
        "peak_state_rows": max(s["numRowsTotal"] for s in sops),
        "peak_state_mem_bytes": max(s.get("memoryUsedBytes", 0) for s in sops),
        "rocksdb_sst_bytes": cm.get("rocksdbSstFileSize", 0),
        "rocksdb_mem_bytes": cm.get("rocksdbTotalMemoryUsageBytes", 0),
        "batch_ms": {
            "p50": durs[len(durs) // 2] if durs else None,
            "max": durs[-1] if durs else None,
            "n": len(durs),
        },
    }))
    spark.stop()
    """
)


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    mem = sys.argv[2] if len(sys.argv) > 2 else "3g"
    n_files = 20
    per_file = n_keys // n_files
    work = tempfile.mkdtemp(prefix="rocksdb_evidence_")
    inp = os.path.join(work, "in")
    os.makedirs(inp)
    base = 1704100000
    for f in range(n_files):
        with open(os.path.join(inp, f"f{f:03d}.json"), "w") as fh:
            fh.writelines(
                json.dumps({"k": f * per_file + j, "ets": base + f}) + "\n"
                for j in range(per_file)
            )
        os.utime(os.path.join(inp, f"f{f:03d}.json"), (base + f, base + f))

    try:
        for provider in ("default", "rocksdb"):
            out = os.path.join(work, f"out_{provider}")
            ckpt = os.path.join(work, f"ckpt_{provider}")
            env = dict(os.environ)
            env["PYSPARK_SUBMIT_ARGS"] = (
                f"--driver-memory {mem} pyspark-shell"
            )
            r = subprocess.run(
                [sys.executable, "-c", WORKER % {"repo": REPO},
                 provider, inp, out, ckpt],
                capture_output=True, text=True, env=env, timeout=2400,
            )
            line = next(
                (l for l in r.stdout.splitlines() if l.startswith("RESULT")),
                None,
            )
            if line is None:
                print(json.dumps({
                    "provider": provider, "error": True,
                    "rc": r.returncode, "stderr": r.stderr[-1500:],
                }))
            else:
                print(line[len("RESULT"):])
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
