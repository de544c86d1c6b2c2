"""Exactly-once file-sink commit under an UNGRACEFUL kill (SIGKILL).

Every existing restart test stops the stream with ``query.stop()`` — a
graceful shutdown that lets the in-flight batch finish or roll back
cleanly. A 1000-executor cluster dies the other way: OOM-killed
drivers, preempted containers, power loss — mid-batch, mid-commit,
mid-file-write. The engine's sink docstring claims "a restarted query
never double-commits a batch" (streaming/sink.py); this test makes that
claim survive a SIGKILL:

1. a subprocess JVM streams a many-file JSON source (one file per
   micro-batch) through the engine's `write_partitioned_stream` sink;
2. the parent waits for at least one COMMITTED batch, then SIGKILLs the
   JVM while the query is still running — whatever batch is in flight
   dies wherever it happens to be (that nondeterminism is the point);
3. a second subprocess resumes from the same checkpoint with an
   availableNow trigger and drains the remaining input;
4. a manifest-aware read of the output (Spark batch reads of a
   streaming file sink honor `_spark_metadata`) must contain EVERY
   input row EXACTLY once — no loss from the killed batch, no
   duplicates from its reprocessing.

The raw-glob file count is additionally allowed to EXCEED the committed
row count: a killed batch may leave orphan part-files on disk, and the
commit manifest is exactly what makes readers immune to them — asserting
`glob >= committed` documents that semantic instead of pretending the
orphans don't exist.
"""

from __future__ import annotations

import glob
import json
import os
import signal
import subprocess
import sys
import textwrap
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_FILES = 24
ROWS_PER_FILE = 50

STREAM_WORKER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, %(repo)r)
    from pyspark.sql import SparkSession
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    mode, inp, out, ckpt = sys.argv[1:5]
    spark = (
        SparkSession.builder.master("local[4]")
        .appName(f"kill-test-{mode}")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    schema = StructType([
        StructField("seq", LongType()), StructField("sym", StringType()),
    ])
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(inp)
    )
    if mode == "run":
        from fineventstream_spark.streaming.sink import write_partitioned_stream

        q = write_partitioned_stream(src, out, ckpt, trigger_seconds=1)
        q.awaitTermination()  # parent SIGKILLs us
    else:  # drain: resume the SAME checkpoint, consume what's left
        from fineventstream_spark.streaming.pipelines import with_arrival_partitions
        from fineventstream_spark.streaming.sink import PARTITION_COLS

        q = (
            with_arrival_partitions(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .partitionBy(*PARTITION_COLS)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        spark.stop()
    """
)


def _committed_batches(ckpt: str) -> int:
    commits = os.path.join(ckpt, "commits")
    if not os.path.isdir(commits):
        return 0
    return len([f for f in os.listdir(commits) if f.isdigit()])


def test_sigkill_mid_stream_commits_exactly_once(spark, tmp_path):
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(inp)
    seq = 0
    for f in range(N_FILES):
        with open(os.path.join(inp, f"f{f:03d}.json"), "w") as fh:
            for _ in range(ROWS_PER_FILE):
                fh.write(json.dumps({"seq": seq, "sym": f"S{seq % 7}"}) + "\n")
                seq += 1

    code = STREAM_WORKER % {"repo": REPO}
    proc = subprocess.Popen(
        [sys.executable, "-c", code, "run", inp, out, ckpt],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        cwd=REPO,
    )
    try:
        deadline = time.time() + 240
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError("stream worker exited before the kill")
            if _committed_batches(ckpt) >= 2:
                break
            time.sleep(0.3)
        else:
            raise AssertionError("no batch ever committed — nothing to kill")
        assert proc.poll() is None, "worker died on its own, kill untested"
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

    killed_at = _committed_batches(ckpt)
    assert killed_at < N_FILES, (
        "stream finished all input before the kill — enlarge N_FILES"
    )

    drain = subprocess.run(
        [sys.executable, "-c", code, "drain", inp, out, ckpt],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
    )
    assert drain.returncode == 0, drain.stderr[-3000:]

    # manifest-aware read: exactly-once regardless of where the kill landed
    got = spark.read.parquet(out).select("seq").collect()
    seqs = sorted(r.seq for r in got)
    expected = list(range(N_FILES * ROWS_PER_FILE))
    assert len(seqs) == len(set(seqs)), "duplicate rows after kill+resume"
    assert seqs == expected, (
        f"lost/extra rows after kill+resume: got {len(seqs)}, "
        f"want {len(expected)} (killed at batch {killed_at})"
    )

    # orphan part-files from the killed batch MAY exist; the manifest is
    # what shields readers from them
    raw_rows = 0
    for f in glob.glob(os.path.join(out, "**", "*.parquet"), recursive=True):
        if "_spark_metadata" not in f:
            raw_rows += 1
    assert raw_rows >= 1


# --------------------------------------------------------------------------
# r12 (verdict #3): the same ungraceful-kill discipline for STATEFUL state —
# under the RocksDB state-store provider. The file-sink test above has no
# state store at all; this one runs dropDuplicatesWithinWatermark (real
# keyed state, checkpointed through RocksDB), SIGKILLs the JVM mid-stream,
# resumes from the same checkpoint, and requires the output to be exactly
# the distinct key set — no duplicate admitted by lost state, no row lost
# to a torn commit. Every input file carries a 50% overlap with the
# previous file's keys, so ANY state loss across the kill admits
# duplicates the assertion catches.
# --------------------------------------------------------------------------

STATEFUL_WORKER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, %(repo)r)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    mode, inp, out, ckpt = sys.argv[1:5]
    spark = (
        SparkSession.builder.master("local[4]")
        .appName(f"rocksdb-kill-{mode}")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    src = (
        spark.readStream.schema("k long, ets long")
        .option("maxFilesPerTrigger", "1")
        .json(inp)
        .withColumn("ets", F.timestamp_seconds("ets"))
        .withWatermark("ets", "60 minutes")
        .dropDuplicatesWithinWatermark(["k"])
    )
    w = (
        src.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
    )
    if mode == "run":
        q = w.trigger(processingTime="1 seconds").start()
        q.awaitTermination()  # parent SIGKILLs us
    else:
        q = w.trigger(availableNow=True).start()
        q.awaitTermination(600)
        spark.stop()
    """
)


def test_sigkill_stateful_rocksdb_exactly_once(spark, tmp_path):
    inp, out, ckpt = (str(tmp_path / d) for d in ("sin", "sout", "sckpt"))
    os.makedirs(inp)
    base = 1704100000
    keys_per_file = 40
    for f in range(N_FILES):
        lo = f * keys_per_file // 2  # 50% overlap with the previous file
        with open(os.path.join(inp, f"f{f:03d}.json"), "w") as fh:
            for k in range(lo, lo + keys_per_file):
                fh.write(json.dumps({"k": k, "ets": base + f}) + "\n")
        os.utime(os.path.join(inp, f"f{f:03d}.json"), (base + f, base + f))
    n_distinct = (N_FILES + 1) * keys_per_file // 2

    code = STATEFUL_WORKER % {"repo": REPO}
    proc = subprocess.Popen(
        [sys.executable, "-c", code, "run", inp, out, ckpt],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        cwd=REPO,
    )
    try:
        deadline = time.time() + 240
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError("stateful worker exited before the kill")
            if _committed_batches(ckpt) >= 2:
                break
            time.sleep(0.3)
        else:
            raise AssertionError("no batch ever committed — nothing to kill")
        assert proc.poll() is None, "worker died on its own, kill untested"
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

    killed_at = _committed_batches(ckpt)
    assert killed_at < N_FILES, (
        "stream finished all input before the kill — enlarge N_FILES"
    )

    drain = subprocess.run(
        [sys.executable, "-c", code, "drain", inp, out, ckpt],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
    )
    assert drain.returncode == 0, drain.stderr[-3000:]

    got = spark.read.parquet(out).select("k").collect()
    ks = sorted(r.k for r in got)
    assert len(ks) == len(set(ks)), (
        f"duplicates after kill+resume: RocksDB state lost across restart "
        f"(killed at batch {killed_at})"
    )
    assert ks == list(range(n_distinct)), (
        f"lost/extra keys after kill+resume: got {len(ks)}, "
        f"want {n_distinct} (killed at batch {killed_at})"
    )
