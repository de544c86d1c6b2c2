#!/usr/bin/env python
"""Capture .explain("formatted") for declared queries into plans/<dir>/.

Usage:
    python scripts/capture_plans.py <out_subdir> <tag> [query ...]

Writes plans/<out_subdir>/<query>_<tag>.txt for each named query (default:
the bench.py HEADLINE set). The tag is usually "before" or "after"; the
judge checks plan claims in OPTIMIZATION_r*.md against these files.

The session and per-query confs mirror the driver contract wrapper in
__spark_entry__.py so that the captured plan is the plan the driver's
bench executes (AQE on -> plans print as AdaptiveSparkPlan initial plans;
Exchange/join-strategy/PushedFilters structure is what we assert on).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fineventstream_spark.registry import all_queries
from fineventstream_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    registry = all_queries()
    spark = get_spark(app_name="fes-plan-capture")
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", out_dir
    )
    os.makedirs(root, exist_ok=True)
    for name in names:
        q = registry.get(name)
        if q is None:
            print(f"# {name}: not in registry", file=sys.stderr)
            continue
        try:
            df = q.fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — isolate per query
            text = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}\n"
            print(f"# {name}: FAILED {exc}", file=sys.stderr)
        path = os.path.join(root, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"# wrote {path} ({len(text)} bytes)", file=sys.stderr)
        # plan-side cache hygiene mirrors bench.py: a persist()-bearing
        # query must not leave cached intermediates that change the NEXT
        # query's captured plan (InMemoryTableScan instead of the scan)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
