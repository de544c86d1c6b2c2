"""Stream-static join + lake compaction coverage."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from fineventstream_spark.streaming.maintenance import compact_partition


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="fes_maint_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_static_join(spark, tmpdir):
    """J8 variant: streaming quotes enriched against a static dim table."""
    src = os.path.join(tmpdir, "src")
    os.makedirs(src)
    with open(os.path.join(src, "b.jsonl"), "w") as f:
        for sym, px in [("AAPL", 190.0), ("MSFT", 400.0), ("ZZZZ", 1.0)]:
            f.write(json.dumps({"symbol": sym, "price": px}) + "\n")

    dim = spark.createDataFrame(
        [("AAPL", "Apple"), ("MSFT", "Microsoft")], "symbol string, company string"
    )
    stream = spark.readStream.schema("symbol string, price double").json(src)
    enriched = stream.join(F.broadcast(dim), "symbol", "inner")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {(r.symbol, r.company) for r in spark.sql("SELECT * FROM enriched").collect()}
    assert rows == {("AAPL", "Apple"), ("MSFT", "Microsoft")}  # no dim row → dropped


def test_compaction_preserves_data(spark, tmpdir):
    """Compaction: many tiny files → few files, identical contents."""
    path = os.path.join(tmpdir, "part")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2.0)
    df.repartition(64).write.mode("overwrite").parquet(path)  # 64 tiny files
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_before >= 32

    before = df.collect()
    n_files = compact_partition(spark, path, target_file_bytes=10 * 1024 * 1024)
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_after == n_files <= 4

    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).first()[0] == sum(r.v for r in before)


def test_dynamic_partition_overwrite_reprocess(spark, tmpdir):
    """Idempotent partition reprocessing: dynamic partitionOverwriteMode
    replaces only the partitions present in the new batch — the backfill /
    late-data reprocess pattern for a 100 TB lake."""
    path = os.path.join(tmpdir, "lake")
    day1 = spark.createDataFrame([(1, "2024-01-01"), (2, "2024-01-01")], "id long, day string")
    day2 = spark.createDataFrame([(3, "2024-01-02")], "id long, day string")
    day1.write.partitionBy("day").mode("overwrite").parquet(path)
    day2.write.partitionBy("day").mode("append").parquet(path)
    assert spark.read.parquet(path).count() == 3

    # reprocess day1 only (corrected data); day2 must survive
    fixed = spark.createDataFrame([(10, "2024-01-01")], "id long, day string")
    (
        fixed.write.partitionBy("day")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)
    )
    # partition-column type inference reads day= values back as dates
    rows = {(r.id, str(r.day)) for r in spark.read.parquet(path).collect()}
    assert rows == {(10, "2024-01-01"), (3, "2024-01-02")}


def test_vacuum_upsert_keeps_current_and_recent(spark, tmpdir):
    """Vacuum removes old snapshot versions but never the pointer's
    current version, and the snapshot read is unaffected."""
    import json
    import os

    from fineventstream_spark.streaming.maintenance import vacuum_upsert_versions
    from fineventstream_spark.streaming.sink import read_upsert_snapshot

    table = os.path.join(tmpdir, "t")
    os.makedirs(table)
    for v in range(4):
        spark.createDataFrame([(1, v)], "k long, ver long").write.parquet(
            os.path.join(table, f"v={v}")
        )
    with open(os.path.join(table, "_CURRENT"), "w") as f:
        json.dump({"version": 3, "checkpoint": "c", "last_batch": 3}, f)

    removed = vacuum_upsert_versions(table, keep=2)
    assert removed == [0, 1]
    assert sorted(os.listdir(table)) == ["_CURRENT", "v=2", "v=3"]
    assert read_upsert_snapshot(spark, table).collect()[0].ver == 3


def test_streaming_incremental_theta_sketch_union(spark, tmpdir):
    """Incremental sketch maintenance under streaming: each micro-batch
    contributes a per-day Theta sketch; the maintained store unions the
    batch sketch into the stored one (theta_union) WITHOUT touching prior
    raw data. After all batches, estimates from the maintained sketches
    must equal the batch-computed exact distincts (Theta is exact below
    k=4096) — the mergeability contract every incremental sketch rollup
    relies on at 100 TB."""
    src = os.path.join(tmpdir, "src")
    os.makedirs(src)
    # three arrival batches, overlapping users across days
    batches = [
        [("2024-01-01", u) for u in range(0, 60)] + [("2024-01-02", u) for u in range(30, 80)],
        [("2024-01-01", u) for u in range(40, 90)] + [("2024-01-02", u) for u in range(0, 20)],
        [("2024-01-02", u) for u in range(70, 120)],
    ]
    store: dict[str, bytearray] = {}

    def fold(batch_df, _bid):
        daily = batch_df.groupBy("day").agg(F.expr("theta_sketch_agg(user_id)").alias("sk"))
        for r in daily.collect():
            if r.day in store:
                merged = spark.createDataFrame(
                    [(bytes(store[r.day]), bytes(r.sk))], "a binary, b binary"
                ).select(F.expr("theta_union(a, b)").alias("u")).collect()[0].u
                store[r.day] = merged
            else:
                store[r.day] = r.sk

    for i, rows in enumerate(batches):
        with open(os.path.join(src, f"b{i}.jsonl"), "w") as f:
            for day, u in rows:
                f.write(json.dumps({"day": day, "user_id": u}) + "\n")
        # one file per availableNow run → deterministic batch contents
        stream = spark.readStream.schema("day string, user_id long").json(src)
        q = (
            stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    exact = {
        "2024-01-01": len({u for b in batches for d, u in b if d == "2024-01-01"}),
        "2024-01-02": len({u for b in batches for d, u in b if d == "2024-01-02"}),
    }
    for day, sk in store.items():
        est = (
            spark.createDataFrame([(bytes(sk),)], "s binary")
            .select(F.expr("CAST(theta_sketch_estimate(s) AS BIGINT)").alias("e"))
            .collect()[0]
            .e
        )
        assert est == exact[day], (day, est, exact[day])


def test_should_compact_policy(tmpdir):
    """r11 trigger policy: count-over-threshold OR mean-size-under-
    threshold flags a partition; a single file (or an already-compacted
    healthy partition) never does."""
    from fineventstream_spark.streaming.maintenance import should_compact

    def mkpart(name: str, files: list[int]) -> str:
        d = os.path.join(tmpdir, name)
        os.makedirs(d)
        for i, size in enumerate(files):
            with open(os.path.join(d, f"part-{i:05d}.parquet"), "wb") as f:
                f.write(b"\x00" * size)
        return d

    # 40 files > max_files=32 → compact regardless of size
    assert should_compact(mkpart("many", [16 * 1024 * 1024] * 40))
    # 10 large files → healthy
    assert not should_compact(mkpart("healthy", [64 * 1024 * 1024] * 10))
    # 10 tiny files → mean under min_mean_bytes → compact
    assert should_compact(mkpart("tiny", [64 * 1024] * 10))
    # single file never compacts (nothing to merge)
    assert not should_compact(mkpart("single", [1024]))
    # commit-log/_hidden files are ignored
    d = mkpart("hidden", [64 * 1024 * 1024] * 2)
    with open(os.path.join(d, "_SUCCESS"), "wb") as f:
        f.write(b"")
    assert not should_compact(d)
