"""Audit toggle for the self-certifying sketch queries.

The rows-only sketch queries (HLL distinct, HLL/KLL/Theta/top-k rollups)
ship an IN-PLAN exact pass whose only job is to certify the sketch's
accuracy in the driver's rows-only check (`rel_err` columns). That audit
dominates their runtime at scale — the KLL rollup spends most of its
45 s (sf60, in-suite) computing the exact percentiles it exists to avoid
(r8 verdict #3). Production rollups run the sketch alone.

``SPARK_GRAFT_AUDIT=off`` switches those queries to their PRODUCTION
form: sketch-only, no exact pass, no audit columns (the schema shrinks —
this mode is for benching the production cost, never for the driver or
the differential suite, which keep the default ON).
"""

from __future__ import annotations

import os


def audits_enabled() -> bool:
    """True unless SPARK_GRAFT_AUDIT is set to off/0/false."""
    return os.environ.get("SPARK_GRAFT_AUDIT", "on").strip().lower() not in (
        "off",
        "0",
        "false",
    )
