"""bench.py one-line JSON contract (r15, r14 verdict #2).

The r13 driver artifact lost its per-query map because the full result
line (5,022 bytes with the 53-entry "order" map and "cold_disagreement")
outgrew the driver's ~4 KB tail capture — the HEAD of the line was cut
off, `parsed` came back absent, and the round lost its ground-truth
round-over-round pair (`prev_bench_ok: false`, `n_common: 0`).

These tests pin the fix: the printed line is `compact_result(result)`,
which must (a) stay under 4 KB for the CURRENT headline set even with
worst-plausible timing widths, (b) keep every driver-contract key
verbatim, and (c) keep the failure markers (`n_failed`,
`total_is_partial`) so a failing round can never read as a speedup.
No Spark session is needed — this is a pure-dict contract test.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, _COMPACT_KEYS, compact_result

# The driver's tail capture demonstrably held ~4 KB lines and lost the
# 5,022-byte r13 line; bound with margin below the observed cliff.
LINE_BUDGET_BYTES = 4096


def _worst_case_result() -> dict:
    """A full bench result with worst-plausible field widths.

    Every timing rendered at max width (9999.999 — four integer digits is
    an hour-and-a-half per query, far past any plausible sf0.1 number),
    every query flagged persist-bearing, every cold pair in disagreement,
    and the order map present — the compact line must stay bounded no
    matter how fat the full result gets.
    """
    t = {name: 9999.999 for name in HEADLINE}
    return {
        "metric": "total_headline_sec",
        "value": 99999.999,
        "unit": "sec",
        "queries": dict(t),
        "queries_cold": dict(t),
        "persist_bearing": list(HEADLINE),
        "cold_disagreement": {n: [9999.999, 9999.999] for n in HEADLINE},
        "order_seed": 4294967295,
        "order": {n: i for i, n in enumerate(HEADLINE)},
        "sf": "sf0.001",
        "n_queries": len(HEADLINE),
        "n_failed": len(HEADLINE),
        "failures": {n: "x" * 500 for n in HEADLINE},
        "total_is_partial": True,
    }


def test_compact_line_is_bounded():
    line = json.dumps(compact_result(_worst_case_result()))
    assert len(line.encode()) < LINE_BUDGET_BYTES, (
        f"one-line JSON is {len(line)} bytes with persist_bearing covering "
        f"all {len(HEADLINE)} headline queries — over the driver tail-capture "
        f"budget; trim _COMPACT_KEYS or shorten query names"
    )


def test_compact_line_keeps_driver_contract_keys():
    result = _worst_case_result()
    compact = compact_result(result)
    # contract keys (driver parses these; additions-only rule) — these
    # survive even when the shedding path fires
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in compact
    # per-query "queries" entries verbatim — the driver's per-query
    # comparison; NEVER shed
    assert compact["queries"] == result["queries"]
    # failure markers survive so a partial total can't read as a speedup
    assert compact["n_failed"] == len(HEADLINE)
    assert compact["total_is_partial"] is True
    # the fat diagnostics are what gets dropped (they live in
    # BENCH_LOCAL_r<N>.json)
    for key in ("order", "cold_disagreement", "failures"):
        assert key not in compact


def test_compact_line_typical_sweep_keeps_cold_map_verbatim():
    # a realistic sweep (r14/r15: 6 persist-bearing queries, no failures,
    # sub-100 s timings) must NOT trigger the shedding path — the driver
    # sees the full cold map
    result = _worst_case_result()
    result["persist_bearing"] = result["persist_bearing"][:6]
    result["queries"] = {n: 12.345 for n in HEADLINE}
    result["queries_cold"] = {n: 12.345 for n in HEADLINE}
    del result["failures"]
    del result["total_is_partial"]
    result["n_failed"] = 0
    compact = compact_result(result)
    assert compact["queries_cold"] == result["queries_cold"]
    assert len(json.dumps(compact).encode()) < LINE_BUDGET_BYTES


def test_compact_keys_do_not_drop_contract_fields():
    # regression guard: someone trimming _COMPACT_KEYS must not remove a
    # field the driver's parser reads
    for key in ("metric", "value", "unit", "queries", "queries_cold",
                "persist_bearing", "order_seed", "sf", "n_queries",
                "n_failed", "total_is_partial"):
        assert key in _COMPACT_KEYS
