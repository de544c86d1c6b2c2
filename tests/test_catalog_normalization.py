"""Catalog timestamp normalization — the round-2 killer, pinned.

The driver's fixtures have shipped ``events.ts`` in two parquet flavors
across rounds: INT64 TIMESTAMP(NANOS) (Spark reads a raw long under
``nanosAsLong``) and plain ``timestamp[us]`` with no zone (Spark reads
TIMESTAMP_NTZ). ``catalog.load_table`` must normalize BOTH to
TimestampType with identical microsecond values — these tests synthesize
each flavor with pyarrow and assert the normalized read, so a future
fixture-flavor change can never again reach queries as a raw long or an
NTZ column.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fineventstream_spark.catalog import load_table

_MICROS = [
    1_704_067_200_000_000,      # 2024-01-01T00:00:00Z
    1_704_067_200_000_001,      # +1 µs — precision must survive
    1_706_572_800_123_456,      # 2024-01-30T00:00:00.123456Z
]


@pytest.fixture()
def tmp_lake():
    d = tempfile.mkdtemp(prefix="fes_catalog_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_events(tmp_lake: str, ts_array: pa.Array) -> str:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 11, 12], pa.int64()),
            "event_type": pa.array(["click", "view", "click"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(['{"k": 1}', '{"k": 2}', '{"k": 3}']),
        }
    )
    path = os.path.join(tmp_lake, "events.parquet")
    pq.write_table(table, path)
    return tmp_lake


def _assert_normalized(spark, sf_dir: str) -> None:
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", f"ts not normalized: {df.dtypes}"
    got = sorted(
        r["ts"].replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
        for r in df.select("ts").collect()
    )
    # exact microsecond equality — the normalization must be a type-tag
    # change, never a value shift
    assert [round(x) for x in got] == _MICROS


def test_ntz_flavor_normalizes_to_timestamp(spark, tmp_lake):
    """timestamp[us] WITHOUT a zone → Spark reads TIMESTAMP_NTZ → catalog
    casts to TIMESTAMP with identical micros (session TZ pinned UTC)."""
    ts = pa.array(
        [dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=m) for m in _MICROS],
        pa.timestamp("us"),  # no tz → NTZ in Spark
    )
    _assert_normalized(spark, _write_events(tmp_lake, ts))


def test_nanos_flavor_normalizes_to_timestamp(spark, tmp_lake):
    """INT64 TIMESTAMP(NANOS) → Spark (under nanosAsLong) reads a raw
    bigint → catalog truncates ns→µs with exact integer division."""
    ts = pa.array([m * 1000 for m in _MICROS], pa.timestamp("ns"))
    _assert_normalized(spark, _write_events(tmp_lake, ts))


def test_tz_aware_flavor_passes_through(spark, tmp_lake):
    """timestamp[us, UTC] is already TimestampType — normalization must
    leave it untouched (no double-conversion)."""
    ts = pa.array(
        [
            dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
            + dt.timedelta(microseconds=m)
            for m in _MICROS
        ],
        pa.timestamp("us", tz="UTC"),
    )
    _assert_normalized(spark, _write_events(tmp_lake, ts))


def test_memoized_load_table_supports_df_col_self_join(spark):
    """r13 advisor: the _LOADED memo must NOT hand back the identical
    DataFrame object (same expression IDs) on repeated calls — a caller
    building a self-join from two load_table calls and disambiguating
    via df[col] would hit AMBIGUOUS_SELF_JOIN. load_table wraps every
    return in a fresh alias, restoring per-call attribute resolution."""
    sf_dir = "/root/testdata/sf0.001"
    a = load_table(spark, sf_dir, "nation")
    b = load_table(spark, sf_dir, "nation")  # memo hit
    joined = a.join(b, a["n_regionkey"] == b["n_regionkey"]).select(
        a["n_nationkey"], b["n_name"]
    )
    # 25 nations over 5 regions, 5 each -> 125 pairs
    assert joined.count() == 125
