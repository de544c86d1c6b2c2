#!/usr/bin/env python
"""Generate a larger scale-factor fixture with the SAME shape as the
driver's seed-42 tables under /root/testdata (TESTDATA.md / FIXTURES.md).

The driver only materializes sf0.001/0.01/0.1; the round-3 VERDICT asked
for the Spark-vs-DuckDB scaling CURVE, which needs sf >= 1. This generator
reproduces the observed schemas, key cardinalities, domains, and value
distributions (measured from the sf0.1 parquet):

- row counts scale 10x per sf step (region/nation fixed; documents and
  embeddings follow the sf0.1 ratios: 50k docs / 20k vectors at sf1);
- lines-per-order ~ Poisson(4) INCLUDING zeros (sf0.1 shows ~1.8% of
  orders with no lineitem, matching P[Pois(4)=0]);
- l_quantity integer-valued 1..50, discounts 0..0.10 step .01, tax
  0..0.08 step .01, prices uniform in the observed ranges;
- events.value ~ Exp(mean 50) (measured quantiles 5.3/34.7/114/228),
  event ts uniform over 2024-01, users = events/66.7;
- documents are word soup over the exact 31-word vocab of the originals
  with ~0.2% planted exact duplicates; embeddings are label-centered
  gaussians (10 labels, dim 64, component scale ~0.1/0.1).

NOT bit-identical to what the driver would emit (its generator code is
not available) — identical in shape and scale, which is what the scaling
benchmark and the cross-engine differential suite need: both engines read
THESE files, so comparisons stay exact.

Usage: python scripts/gen_sf.py --sf 1 --out /root/repo/.localdata/sf1

SKEWED VARIANT (round-9 verdict ask — every uniform fixture leaves AQE
skew handling, salting, and the bucketed layouts untested against a hot
key): ``--skew zipf:1.2`` draws the three verdict-named key columns from
a bounded Zipf(s) instead of uniform, leaving every other column and all
schemas identical:

- ``lineitem.l_orderkey``: lines-per-order becomes the Zipf rank-count
  profile (expected total unchanged at ~4/order). At s=1.2 the hottest
  order carries ~1/ζ(1.2) ≈ 18% of ALL lineitem rows (~10.7 M rows at
  sf10 — several hundred MB on one join key, past AQE's default 256 MB
  skew threshold, so mitigation must engage with production settings).
- ``events.user_id``: per-event Zipf user draw — the hottest user owns
  ~18% of the stream, so any PARTITION BY user_id window gets one
  pathological partition.
- ``documents``: 10% of docs are boilerplate from 8 templates with
  1/rank weights — exact-dup groups and MinHash-LSH buckets orders of
  magnitude over the bucket caps.

Hot keys are scattered across the key domain by a coprime multiplicative
step (not left at rank 0,1,2,… — hash partitioning doesn't care, but
range/file locality would be unrealistically favorable).

Usage: python scripts/gen_sf.py --sf 10 --skew zipf:1.2
  -> .localdata/sf10zipf1.2
"""

from __future__ import annotations

import argparse
import json
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split()
MKTSEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["click", "purchase", "error", "signup", "view"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PNOUNS = ["ring", "bolt", "screw", "wire", "tube", "plate", "cog", "pin"]
PADJS = ["large", "hot", "blue", "red", "green", "small", "dim", "shiny"]

MS = pa.timestamp("ms")
US = pa.timestamp("us")


def _write(out: str, name: str, table: pa.Table) -> None:
    # Row-group sizing (r10): the row group is the atomic unit of scan
    # parallelism — pyarrow's default (1 Mi rows/group) wrote sf10
    # documents (500k rows, 127 MB) as ONE group, so every documents scan
    # decoded serially in one task and the q_llm family flatlined on the
    # core-scaling sweep (3.6 s at 4 cores AND at 32). Target ~64 groups
    # per table (floored so tiny fixtures stay single-group) — the layout
    # a real lake writer would produce, and the local stand-in for "at
    # 100 TB this table is many files".
    rg = max(16_384, min(1_048_576, table.num_rows // 64 or 1))
    pq.write_table(table, os.path.join(out, f"{name}.parquet"), row_group_size=rg)
    print(f"  {name}: {table.num_rows} rows (row_group_size={rg})")


def _ts_ms(days_from_1995: np.ndarray) -> pa.Array:
    base = np.datetime64("1995-01-01", "ms")
    return pa.array(base + (days_from_1995 * 86_400_000).astype("timedelta64[ms]"), MS)


def _bounded_zipf(rng: np.random.Generator, s: float, n_keys: int, n_draws: int) -> np.ndarray:
    """``n_draws`` 0-based RANKS from Zipf(s) truncated to ``n_keys`` via
    rejection (numpy's sampler is unbounded; for s=1.2 at 15 M keys only
    ~3–4% of draws are rejected)."""
    out = np.empty(n_draws, dtype=np.int64)
    filled = 0
    while filled < n_draws:
        cand = rng.zipf(s, int((n_draws - filled) * 1.15) + 16)
        cand = cand[cand <= n_keys]
        take = min(len(cand), n_draws - filled)
        out[filled : filled + take] = cand[:take] - 1
        filled += take
    return out


def _scatter_ranks(ranks: np.ndarray, n_keys: int) -> np.ndarray:
    """Bijective rank→key map (multiplicative step coprime to n_keys) so
    the hot keys are spread across the domain instead of clustered at
    0,1,2,…; deterministic, overflow-safe (step < n_keys so the product
    stays ≤ n_keys² ≪ 2^63 at any reachable sf)."""
    step = 2654435761 % n_keys
    while math.gcd(step, n_keys) != 1:
        step += 1
    return (ranks * step + 7) % n_keys


def generate(
    sf: float,
    out: str,
    seed: int = 42,
    skew: float | None = None,
    tables: set[str] | None = None,
) -> None:
    """``tables=None`` generates everything. A subset (r12 verdict #4:
    the sf100 recall sweep touches only documents/embeddings — the full
    sf100 TPC-H ring would be ~19 GB ×2 fixtures for queries the sweep
    never runs) generates just those tables. NOTE: rng state is consumed
    per-table in declaration order, so a subset fixture is NOT
    column-identical to the same table inside a full fixture — fine for
    the recall gates, which compare Spark vs DuckDB on the SAME files.
    """
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)

    def want(name: str) -> bool:
        return tables is None or name in tables
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = max(int(15_000 * sf), 10)
    n_docs = int(50_000 * sf)
    n_vec = int(20_000 * sf)

    if want("region"):
        _write(out, "region", pa.table({
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": REGIONS,
        }))
    if want("nation"):
        _write(out, "nation", pa.table({
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": [f"NATION_{i:02d}" for i in range(25)],
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        }))
    if want("customer"):
        _write(out, "customer", pa.table({
            "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
            "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
            "c_mktsegment": pa.array(np.array(MKTSEGS)[rng.integers(0, 5, n_cust)]),
        }))
    if want("supplier"):
        _write(out, "supplier", pa.table({
            "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
            "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
        }))
    if want("part"):
        _write(out, "part", pa.table({
            "p_partkey": pa.array(np.arange(n_part), pa.int64()),
            "p_name": [f"{PADJS[i % 8]} {PNOUNS[(i // 8) % 8]}" for i in range(n_part)],
            "p_brand": [f"Brand#{i % 25}" for i in range(n_part)],
            "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
            "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
            "p_retailprice": np.round(900.0 + np.arange(n_part) * 0.1 % 1200, 2),
        }))

    if want("orders") or want("lineitem"):
        order_days = rng.uniform(0, 2404, n_ord)  # 1995-01-01 .. 2001-08-01
    if want("orders"):
        _write(out, "orders", pa.table({
            "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
            "o_orderstatus": pa.array(np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]),
            "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
            "o_orderdate": _ts_ms(np.floor(order_days)),
            "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
        }))

    if want("lineitem"):
        if skew is not None:
            # zipf rank-counts scattered over the orderkey domain: same
            # expected 4 lines/order, but the hottest key holds ~1/ζ(s) of
            # ALL lineitem rows
            ranks = _bounded_zipf(rng, skew, n_ord, int(4.0 * n_ord))
            keys = _scatter_ranks(ranks, n_ord)
            lines_per = np.bincount(keys, minlength=n_ord)
        else:
            lines_per = rng.poisson(4.0, n_ord)
        l_orderkey = np.repeat(np.arange(n_ord), lines_per)
        n_li = len(l_orderkey)
        l_orderdays = np.repeat(np.floor(order_days), lines_per)
        # mostly ship 1..95 days after the order; a small tail is fully random
        ship = l_orderdays + rng.integers(1, 96, n_li)
        wild = rng.random(n_li) < 0.02
        ship[wild] = rng.uniform(1, 2500, int(wild.sum()))
        linenumber = np.concatenate([np.arange(1, k + 1) for k in lines_per]) if n_li else np.array([], dtype=np.int64)
        _write(out, "lineitem", pa.table({
            "l_orderkey": pa.array(l_orderkey, pa.int64()),
            "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
            "l_linenumber": pa.array(linenumber, pa.int32()),
            "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
            "l_discount": rng.integers(0, 11, n_li) / 100.0,
            "l_tax": rng.integers(0, 9, n_li) / 100.0,
            "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
            "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
            "l_shipdate": _ts_ms(np.floor(ship)),
        }))
    if want("events"):

        ev_base = np.datetime64("2024-01-01", "us")
        ev_us = np.sort(rng.integers(0, 30 * 86_400_000_000, n_ev))
        if skew is not None:
            # hottest user owns ~1/ζ(s) of the whole stream: one pathological
            # PARTITION BY user_id window partition
            ev_users = _scatter_ranks(_bounded_zipf(rng, skew, n_users, n_ev), n_users)
        else:
            ev_users = rng.integers(0, n_users, n_ev)
        _write(out, "events", pa.table({
            "event_id": pa.array(np.arange(n_ev), pa.int64()),
            "ts": pa.array(ev_base + ev_us.astype("timedelta64[us]"), US),
            "user_id": pa.array(ev_users, pa.int64()),
            "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_ev)]),
            "value": np.round(rng.exponential(50.0, n_ev), 2),
            "props": pa.array([json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)]),
        }))

    if want("documents"):
        vocab = np.array(VOCAB)
        lens = rng.integers(8, 81, n_docs)
        texts = [" ".join(vocab[rng.integers(0, len(vocab), k)]) for k in lens]
        # plant ~0.2% exact duplicates (the originals have 8 in 5000) at
        # indices the skew-mode boilerplate overwrite below can never hit:
        # that loop rewrites every i%10==0 doc, and 500-stride bases are all
        # %10==0, so the r9 (i, i+1) pairs were silently destroyed in the
        # skewed fixture (r9 advisor) — i+1/i+2 are ≡1/2 (mod 10), safe in
        # both modes, keeping the scattered small-group dup pairs alongside
        # the big boilerplate groups.
        for i in range(0, n_docs, 500):
            if i + 2 < n_docs:
                texts[i + 2] = texts[i + 1]
        if skew is not None:
            # 10% boilerplate from 8 templates with 1/rank weights: the top
            # template alone is ~3.7% of the corpus — exact-dup groups and
            # LSH buckets far past any per-bucket cap
            templates = [" ".join(vocab[rng.integers(0, len(vocab), 40)]) for _ in range(8)]
            tw = 1.0 / np.arange(1, 9)
            picks = rng.choice(8, size=(n_docs + 9) // 10, p=tw / tw.sum())
            for j, i in enumerate(range(0, n_docs, 10)):
                texts[i] = templates[picks[j]]
        _write(out, "documents", pa.table({
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": texts,
            "lang": pa.array(np.array(["de", "en", "es", "fr", "zh"])[rng.integers(0, 5, n_docs)]),
            "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n_docs)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }))

    if want("embeddings"):
        labels = rng.integers(0, 10, n_vec)
        centers = rng.normal(0, 0.1, (10, 64))
        vecs = (centers[labels] + rng.normal(0, 0.1, (n_vec, 64))).astype(np.float32)
        _write(out, "embeddings", pa.table({
            "vec_id": pa.array(np.arange(n_vec), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--skew", default=None, metavar="zipf:S",
        help="skew the verdict-named key columns with a bounded Zipf(S)",
    )
    ap.add_argument(
        "--tables", default=None,
        help="comma-separated subset of tables to generate (default: all)",
    )
    a = ap.parse_args()
    skew = None
    if a.skew is not None:
        kind, _, sval = a.skew.partition(":")
        if kind != "zipf" or not sval:
            raise SystemExit(f"--skew must look like zipf:1.2, got {a.skew!r}")
        skew = float(sval)
        if skew <= 1.0:
            raise SystemExit("zipf exponent must be > 1 (numpy's sampler requires it)")
    suffix = f"sf{a.sf:g}" + (f"zipf{skew:g}" if skew is not None else "")
    out = a.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", suffix,
    )
    tables = set(a.tables.split(",")) if a.tables else None
    _KNOWN = {"region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"}
    if tables and not tables <= _KNOWN:
        raise SystemExit(f"unknown tables: {sorted(tables - _KNOWN)} (known: {sorted(_KNOWN)})")
    print(f"generating sf={a.sf} skew={a.skew} tables={sorted(tables) if tables else 'all'} -> {out}")
    generate(a.sf, out, a.seed, skew=skew, tables=tables)
