#!/usr/bin/env python
"""Small-files / compaction evidence (r10 verdict #5).

The reference writes one S3 object per ≤100-record Lambda batch
(processor_stock_quotes.py:64-83) — the canonical small-files regime: a
day of 10 s micro-batches leaves thousands of tiny objects per
partition, and every later scan pays a footer fetch + task per file.
``streaming/maintenance.py::compact_partition`` exists and is
unit-tested; this script supplies the MEASUREMENT the policy needs:

1. build a fragmented event-time-partitioned lake (year/…/hour hive
   dirs, ~100-300 rows per file — the reference's object size);
2. time a representative scan+agg over it;
3. compact every closed partition; re-time the same scan;
4. record file counts, mean sizes, scan times, compaction cost.

The adopted trigger policy lives in
``streaming/maintenance.py::should_compact`` (count- OR mean-size-
based); this run is its calibration record.

Usage:
    python scripts/compaction_evidence.py [--sf-dir /root/repo/.localdata/sf10]
        [--days 3] [--writers 64] [--reps 3]
Output: JSON to stdout + .localdata/compaction_evidence.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fineventstream_spark.session import get_spark
from fineventstream_spark.streaming.maintenance import compact_partition, should_compact
from fineventstream_spark.streaming.pipelines import with_arrival_partitions

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def file_stats(root: str) -> tuple[int, float]:
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(root)
        for f in fs
        if f.endswith(".parquet")
    ]
    total = sum(os.path.getsize(f) for f in files)
    return len(files), (total / len(files) if files else 0.0)


def partition_dirs(root: str) -> list[str]:
    """Leaf hive partition dirs (hour level)."""
    out = []
    for dp, dns, fs in os.walk(root):
        if any(f.endswith(".parquet") for f in fs) and "hour=" in dp:
            out.append(dp)
    return sorted(out)


def scan_query(spark, lake: str):
    """Representative lake consumer: event-time filtered per-type rollup —
    partition pruning (one day) + column-pruned scan + small agg."""
    return (
        spark.read.parquet(lake)
        .filter((F.col("year") == 2024) & (F.col("month") == 1) & (F.col("day") == 2))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
        )
    )


def timed(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".localdata", "sf10"))
    ap.add_argument("--days", type=int, default=3)
    ap.add_argument("--writers", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    a = ap.parse_args()

    spark = get_spark(app_name="compaction-evidence")
    lake = tempfile.mkdtemp(prefix="fes_fraglake_")
    try:
        # Fragmented write: N shuffled writers × hour partitions → every
        # writer holds rows of every hour, so each hour dir collects ~N
        # small files — one write job reproducing a day of micro-batch
        # appends (reference cadence: one object per ≤100-record batch).
        ev = (
            spark.read.parquet(os.path.join(a.sf_dir, "events.parquet"))
            .filter(F.col("ts") < F.lit(f"2024-01-{a.days + 1:02d}").cast("timestamp"))
            .select("ts", "event_type", "value", "user_id")
        )
        (
            with_arrival_partitions(ev, F.col("ts"))
            .repartition(a.writers)
            .write.mode("overwrite")
            .partitionBy("year", "month", "day", "hour")
            .parquet(lake)
        )
        n_before, mean_before = file_stats(lake)
        rows = spark.read.parquet(lake).count()
        print(f"# fragmented lake: {rows} rows, {n_before} files, "
              f"mean {mean_before / 1024:.1f} KiB", file=sys.stderr)

        scan_frag = timed(
            lambda: scan_query(spark, lake).write.format("noop").mode("overwrite").save(),
            a.reps,
        )
        # footer-bound read: full-lake count (no pruning) — the pure
        # per-file overhead signal
        count_frag = timed(lambda: spark.read.parquet(lake).count(), a.reps)

        parts = partition_dirs(lake)
        decisions = [should_compact(p) for p in parts]
        t0 = time.perf_counter()
        for p in parts:
            compact_partition(spark, p)
        compact_sec = round(time.perf_counter() - t0, 3)

        n_after, mean_after = file_stats(lake)
        # cache-bust: new files, fresh DataFrame lineage either way
        scan_comp = timed(
            lambda: scan_query(spark, lake).write.format("noop").mode("overwrite").save(),
            a.reps,
        )
        count_comp = timed(lambda: spark.read.parquet(lake).count(), a.reps)
        rows_after = spark.read.parquet(lake).count()
        assert rows_after == rows, f"compaction lost rows: {rows} -> {rows_after}"

        out = {
            "sf_dir": a.sf_dir,
            "days": a.days,
            "rows": rows,
            "partitions": len(parts),
            "files_before": n_before,
            "mean_file_kib_before": round(mean_before / 1024, 1),
            "files_after": n_after,
            "mean_file_kib_after": round(mean_after / 1024, 1),
            "should_compact_flagged": sum(decisions),
            "scan_day_agg_sec_before": scan_frag,
            "scan_day_agg_sec_after": scan_comp,
            "scan_speedup": round(scan_frag / scan_comp, 2) if scan_comp else None,
            "full_count_sec_before": count_frag,
            "full_count_sec_after": count_comp,
            "count_speedup": round(count_frag / count_comp, 2) if count_comp else None,
            "compaction_sec_total": compact_sec,
            "compaction_sec_per_partition": round(compact_sec / max(len(parts), 1), 3),
        }
    finally:
        shutil.rmtree(lake, ignore_errors=True)
    path = os.path.join(REPO, ".localdata", "compaction_evidence.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
