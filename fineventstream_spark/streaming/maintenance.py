"""Lake maintenance: small-file compaction.

A micro-batch sink writing every ≤10 s (the reference's cadence,
terraform/lambda.tf:53) produces thousands of tiny objects per partition
per day — the classic small-files problem that degrades every later scan
(footer fetches dominate I/O). Compaction rewrites a partition's files
into ~target-sized ones; run it per closed partition (e.g. the previous
hour) so it never races the live writer.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def compact_partition(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite one partition directory into ⌈size/target⌉ files.

    Returns the resulting file count. Uses a rewrite-to-temp + atomic-ish
    swap; on a real object store this would be a commit-protocol rename.
    """
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if not f.startswith("_") and not f.startswith(".")
    )
    n_files = max(1, -(-total // target_file_bytes))
    df = spark.read.format(fmt).load(path)
    tmp = path.rstrip("/") + "__compacting"
    df.coalesce(n_files).write.mode("overwrite").format(fmt).save(tmp)
    backup = path.rstrip("/") + "__old"
    os.rename(path, backup)
    os.rename(tmp, path)
    import shutil

    shutil.rmtree(backup, ignore_errors=True)
    return n_files
