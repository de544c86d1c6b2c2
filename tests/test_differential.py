"""Differential correctness: every declared query vs its DuckDB oracle —
the local replica of the driver's correctness gate (row count + column
names + order-insensitive value multiset).

Rows-only queries (no oracle) are executed and must return a stable,
non-empty-schema DataFrame without error.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from fineventstream_spark.registry import all_queries

REGISTRY = all_queries()


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # queries pre-round computed floats; this guards pass-through noise
        return round(v, 6)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _multiset(rows, col_order):
    return sorted(
        (tuple(_norm(row[i]) for i in col_order) for row in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = sdf.collect()

    rel = duck.execute(q.oracle)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(map(str.lower, spark_cols)) == sorted(map(str.lower, duck_cols)), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    # align columns by (lowercased) name before hashing values
    s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i].lower())
    d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i].lower())
    s_set = _multiset(spark_rows, s_order)
    d_set = _multiset(duck_rows, d_order)
    if s_set != d_set:
        diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(name, spark, sf_dir):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    assert len(df.schema.fields) > 0
    n = df.count()
    assert n >= 0
