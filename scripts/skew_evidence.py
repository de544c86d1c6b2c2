#!/usr/bin/env python
"""Skew-robustness evidence (round-9 verdict ask #1).

Every driver fixture is key-uniform, so AQE skew handling, the salting
operators, the bucketed layouts, and the LSH bucket caps had never met a
hot key. This script runs the engine against the Zipf-skewed fixture
(``scripts/gen_sf.py --sf 10 --skew zipf:1.2`` → hottest orderkey ≈ 18%
of ALL lineitem rows, hottest user ≈ 18% of the event stream, 10%
boilerplate documents) and records, with assertions where a guarantee is
claimed:

E1  AQE skew-join split engages at PRODUCTION thresholds (256 MB /
    factor 5 — nothing lowered) on a plain shuffle SMJ over the hot
    orderkey, and the split matters: same plan with skewJoin disabled is
    timed for comparison. Asserts ``skew=true`` in the executed plan.
E2  The bucketed zero-exchange SMJ on the same logical join. AQE cannot
    split a bucketed join (no shuffle to re-plan), so the hot bucket IS
    a straggler — this measures what the layout bet costs under
    adversarial skew vs what it saves on uniform data.
E3  q_agg_salted's two-phase salted aggregation vs the plain groupBy on
    skewed input. Expected finding (recorded honestly): for algebraic
    count/sum, Spark's partial aggregation already neutralizes the hot
    key, so salting is ~parity — its value is reserved for buffer-heavy
    aggregates (collect_*/percentile UDAFs).
E4  Window family under a pathological partition (hottest user owns 18%
    of events): q_win_rank / q_win_frame_rows wall time on skewed vs
    uniform fixture — a PARTITION BY user_id window cannot be split, so
    this measures the single-task-sort straggler directly.
E5  MinHash-LSH bucket caps under boilerplate: candidate pair count must
    stay bounded (capped buckets dropped) instead of the ~C(50k,2) ≈
    1.2e9 quadratic explosion the raw boilerplate group implies.
    Asserts the bound.
E6  Heavy hitters (Misra-Gries candidates + exact verify) on the zipf
    stream — the first fixture where the "heavy" in heavy-hitters is
    real.

Correctness under skew is NOT asserted here — run the differential suite
on the same directory (the suite is the single authority):

    SPARK_GRAFT_TEST_SF=/root/repo/.localdata/sf10zipf1.2 \
        python -m pytest tests/test_differential.py -q -k "<family>"

Output: one JSON blob to stdout + ``.localdata/skew_evidence.json``;
timings are min-of-``--reps`` (default 3) after the bench.py-style warm
pass. Co-tenant caveat (BASELINE.md methodology): compare numbers from
the same run, not across processes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fineventstream_spark.catalog import load_table  # noqa: E402
from fineventstream_spark.registry import all_queries  # noqa: E402
from fineventstream_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _timed_ab(arms: dict[str, object], reps: int) -> dict[str, float]:
    """INTERLEAVED A/B: one rep of every arm per round, min per arm.
    Sequential per-arm blocks (the r9 shape of this file) are exposed to
    multi-rep co-tenant contention windows — a single noisy window lands
    entirely on one arm and inverts the comparison (observed r10: the
    E1 skewJoin-on block read 21.1 s sequential vs 7.1 s interleaved,
    flipping the recorded speedup from 1.8× to 0.6×). Round-robin puts
    every arm inside the same windows."""
    best = {k: float("inf") for k in arms}
    for _ in range(reps):
        for k, fn in arms.items():
            t0 = time.perf_counter()
            fn()
            best[k] = min(best[k], time.perf_counter() - t0)
    return {k: round(v, 3) for k, v in best.items()}


def _executed_plan(df) -> str:
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _enrich_join(li, orders):
    """The E1/E2 logical join: a full-width enrichment of lineitem with its
    order's priority (the cross-result hash consumes every lineitem column
    POST-join, so column pruning cannot narrow the shuffled fact row —
    representative of real enrichment joins, where the wide row is the
    point). At sf10 zipf1.2 the hot orderkey's shuffle partition is then
    comfortably past AQE's default 256 MB skew threshold."""
    cols = [c for c in li.columns] + ["o_orderpriority"]
    j = li.join(orders.select("o_orderkey", "o_orderpriority"),
                li.l_orderkey == orders.o_orderkey)
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64(*cols)).alias("row_hash_xor"),  # ANSI-safe, no overflow
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("price_cents"),
    )


def _shuffle_join(spark, sf_dir: str):
    return _enrich_join(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=os.path.join(REPO, ".localdata", "sf10zipf1.2"))
    ap.add_argument("--uniform-dir", default=os.path.join(REPO, ".localdata", "sf10"))
    ap.add_argument("--reps", type=int, default=3)
    a = ap.parse_args()
    if not os.path.exists(os.path.join(a.dir, "lineitem.parquet")):
        raise SystemExit(f"skewed fixture missing: {a.dir} — run gen_sf.py --skew zipf:1.2")

    spark = get_spark(app_name="fes-skew-evidence")
    registry = all_queries()
    ev: dict[str, object] = {"fixture": a.dir, "reps": a.reps}

    # warm: page cache + JVM + python workers (bench.py discipline)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for tbl in ("lineitem", "orders", "events", "documents", "customer",
                "nation", "region", "supplier", "part"):
        _materialize(spark.read.parquet(os.path.join(a.dir, f"{tbl}.parquet")))

    # ---- E1+E2: one interleaved 3-arm block ------------------------------
    # shuffle+AQE-on vs shuffle+skewJoin-off (E1) vs bucketed SMJ (E2) on
    # the SAME logical join — all three arms share every contention window.
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    thr = spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")

    from fineventstream_spark.operators.bucketed import bucketed_table

    def bucketed_join():
        return _enrich_join(
            bucketed_table(spark, a.dir, "lineitem"),
            bucketed_table(spark, a.dir, "orders"),
        )

    _materialize(bucketed_join())  # layout build (ingest work) excluded from timing

    def _shuffle_arm(skew_on: bool):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        try:
            _materialize(_shuffle_join(spark, a.dir))
        finally:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    t3 = _timed_ab(
        {
            "aqe_on": lambda: _shuffle_arm(True),
            "skewjoin_off": lambda: _shuffle_arm(False),
            "bucketed": lambda: _materialize(bucketed_join()),
        },
        a.reps,
    )
    t_aqe, t_noskew, t_bucketed = t3["aqe_on"], t3["skewjoin_off"], t3["bucketed"]
    # plan capture must execute THIS DataFrame's queryExecution — a
    # .write(...) action plans a separate command, leaving q's own
    # adaptive plan un-finalized (no skew markers)
    q = _shuffle_join(spark, a.dir)
    q.collect()
    plan = _executed_plan(q)
    skew_engaged = "skew=true" in plan
    ev["E1_aqe_skew_split"] = {
        "threshold": thr,
        "engaged_at_production_thresholds": skew_engaged,
        "shuffle_smj_aqe_on_sec": t_aqe,
        "shuffle_smj_skewjoin_off_sec": t_noskew,
        "split_speedup": round(t_noskew / t_aqe, 2) if t_aqe else None,
    }
    assert skew_engaged, (
        "AQE did not mark the hot partition skewed at production thresholds — "
        f"plan:\n{plan[:2000]}"
    )

    # ---- E2: bucketed zero-exchange SMJ under the same skew ------------
    bq = bucketed_join()
    bq.collect()
    bplan = _executed_plan(bq)
    # the join itself must be exchange-free: the FINAL adaptive plan may
    # carry exactly ONE Exchange — the post-agg shuffle of the 5-row
    # priority rollup (the tree also prints the Initial Plan; ignore it)
    tree = bplan.split("\n\n")[0]
    final = tree.split("== Initial Plan ==")[0]
    ev["E2_bucketed_smj"] = {
        "sec": t_bucketed,
        "final_plan_exchanges_incl_post_agg": final.count("Exchange ("),
        "join_zero_exchange": final.count("Exchange (") == 1,
        "vs_shuffle_aqe": round(t_bucketed / t_aqe, 2) if t_aqe else None,
        "note": "AQE cannot split a bucketed join; the hot bucket is one task",
    }

    # ---- E3: salted vs plain aggregation (algebraic) --------------------
    from fineventstream_spark.operators.skew import salted_agg_count_sum

    li = load_table(spark, a.dir, "lineitem")
    t_e3 = _timed_ab(
        {
            "salted": lambda: _materialize(
                salted_agg_count_sum(li, "l_returnflag", "l_quantity")
            ),
            "plain": lambda: _materialize(
                li.groupBy("l_returnflag").agg(
                    F.count("*").alias("n"),
                    F.round(F.sum("l_quantity"), 4).alias("total"),
                )
            ),
        },
        a.reps,
    )
    t_salted, t_plain = t_e3["salted"], t_e3["plain"]
    ev["E3_salted_agg"] = {
        "salted_sec": t_salted,
        "plain_sec": t_plain,
        "finding": "partial aggregation already neutralizes algebraic-agg skew"
        if t_plain <= t_salted * 1.2
        else "salting beat plain partial aggregation",
    }

    # ---- E4: window family straggler (skew vs uniform fixture) ----------
    win = {}
    for name in ("q_win_rank", "q_win_frame_rows"):
        fn = registry[name].fn
        if os.path.exists(os.path.join(a.uniform_dir, "events.parquet")):
            t4 = _timed_ab(
                {
                    "skew": lambda fn=fn: _materialize(fn(spark, a.dir)),
                    "uniform": lambda fn=fn: _materialize(fn(spark, a.uniform_dir)),
                },
                a.reps,
            )
            row = {
                "skew_sec": t4["skew"],
                "uniform_sec": t4["uniform"],
                "skew_tax": round(t4["skew"] / t4["uniform"], 2),
            }
        else:
            row = {"skew_sec": _timed(lambda: _materialize(fn(spark, a.dir)), a.reps)}
        win[name] = row
    ev["E4_window_straggler"] = win

    # ---- E5: LSH bucket caps under boilerplate ---------------------------
    from fineventstream_spark.operators.dedup import minhash_lsh_candidates

    docs = load_table(spark, a.dir, "documents")
    n_docs = docs.count()
    t0 = time.perf_counter()
    pairs = minhash_lsh_candidates(docs, "text", "doc_id").count()
    t_lsh = round(time.perf_counter() - t0, 3)
    # every surviving bucket contributes ≤ C(max_bucket=50, 2) pairs and
    # there are ≤ docs×bands/1 buckets, but the real guarantee is "not
    # quadratic in the boilerplate group (~n_docs/10 docs on 8 templates)"
    boiler_group = n_docs // 10 // 8
    quadratic = boiler_group * (boiler_group - 1) // 2
    ev["E5_lsh_bucket_caps"] = {
        "n_docs": n_docs,
        "candidate_pairs": pairs,
        "smallest_boilerplate_group_quadratic_pairs": quadratic,
        "sec": t_lsh,
        "capped": pairs < quadratic,
    }
    assert pairs < quadratic, (
        f"LSH produced {pairs} pairs ≥ one boilerplate group's quadratic "
        f"{quadratic} — bucket caps did not engage"
    )
    from fineventstream_spark.operators.dedup import release_intermediates

    release_intermediates(spark)

    # ---- E6: heavy hitters on a stream with real heavy hitters ----------
    fn = registry["q_event_heavy_hitters"].fn
    ev["E6_heavy_hitters"] = {
        "sec": _timed(lambda: _materialize(fn(spark, a.dir)), a.reps),
        "top_share_expected": "hottest user ≈ 1/ζ(1.2) ≈ 18% of the stream",
    }

    # ---- E7 (r10): layout routing is CONSUMER-shaped ---------------------
    # E2 measured the WIDE per-row enrichment shape (routing wins 1.3×);
    # this measures the registry's actual aggregate-collapsing consumers,
    # where the zero-exchange layout wins ~3× even on the hot key — the A/B
    # that flipped bucketed_table's routing default to per-call-site opt-in.
    from fineventstream_spark.operators.bucketed import SKEW_ROUTE_ALL_CONF_KEY

    def _routed_run(routed: bool, qname: str) -> None:
        spark.conf.set(SKEW_ROUTE_ALL_CONF_KEY, "true" if routed else "false")
        try:
            _materialize(registry[qname].fn(spark, a.dir))
        finally:
            spark.conf.unset(SKEW_ROUTE_ALL_CONF_KEY)

    e7 = {}
    for qname in ("q_join_inner", "q_report_nation_volume"):
        t7 = _timed_ab(
            {
                "forced": lambda qname=qname: _routed_run(False, qname),
                "routed": lambda qname=qname: _routed_run(True, qname),
            },
            a.reps,
        )
        e7[qname] = {
            "forced_bucketed_sec": t7["forced"],
            "routed_shuffle_aqe_sec": t7["routed"],
            "layout_speedup": round(t7["routed"] / t7["forced"], 2),
        }
    e7["note"] = (
        "aggregate-collapsing consumers keep the layout (default); only "
        "wide per-row enrichment (E2 shape) should opt into routing"
    )
    ev["E7_routing_consumer_shape"] = e7

    # ---- E8 (r10): window hot/cold split crossover -----------------------
    # q_win_frame_rows routes through skew_split_sum_frames; below the
    # 64 MiB hot-partition budget the plain window's straggler is cheaper
    # than the split's bookkeeping barrier (so the router picks plain on
    # this fixture), above it the split wins (sf10zipf2, 61% hot user).
    from fineventstream_spark.operators.rolling import (
        SERIAL_WINDOW_PARTITION_CONF_KEY,
    )

    def _win(budget: str) -> None:
        spark.conf.set(SERIAL_WINDOW_PARTITION_CONF_KEY, budget)
        try:
            _materialize(registry["q_win_frame_rows"].fn(spark, a.dir))
        finally:
            spark.conf.unset(SERIAL_WINDOW_PARTITION_CONF_KEY)

    # budget just under the hot user's ~27 MB partition: exactly ONE key
    # routes through the split branch (a 1-byte budget would mark every
    # key hot — its own pathology, now capped at 64 keys in the operator)
    t8 = _timed_ab(
        {"plain": lambda: _win("0"), "split": lambda: _win(str(20 << 20))},
        a.reps,
    )
    ev["E8_window_split_crossover"] = {
        "plain_sec": t8["plain"],
        "forced_split_sec": t8["split"],
        "note": (
            "on this fixture's ~27 MB hot partition the plain window wins "
            "(the split's exact-carry bookkeeping barrier costs more than "
            "the straggler); the 64 MiB default budget encodes the "
            "measured crossover — see BASELINE r10 for the 61%-hot "
            "fixture where the split wins"
        ),
    }

    out = os.path.join(REPO, ".localdata", "skew_evidence.json")
    with open(out, "w") as f:
        json.dump(ev, f, indent=2)
    print(json.dumps(ev, indent=2))
    print(f"\nwritten: {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
