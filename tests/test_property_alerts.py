"""Property-based test (hypothesis): the alert kernel is micro-batch
invariant.

The whole point of carrying the last-alerted price in the state store is
that HOW the tick stream is chopped into micro-batches must not change
WHICH alerts fire. hypothesis generates arbitrary positive price paths
and arbitrary batch boundaries; threading the reference through
``_evaluate_alerts`` batch-by-batch must produce exactly the alerts of a
single uninterrupted pass. This covers the state contract itself,
independent of any Spark session — the streaming tests then pin that
both state APIs wire the same kernel to a real checkpoint.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from fineventstream_spark.streaming.alerts import _evaluate_alerts


def _run_chunked(prices: list[float], cuts: list[int], threshold: float):
    rows = pd.DataFrame(
        {"symbol": "X", "seq": range(len(prices)), "price": prices}
    )
    bounds = sorted({0, len(prices), *cuts})
    ref = None
    alerts: list[tuple] = []
    for lo, hi in zip(bounds, bounds[1:]):
        frame, ref = _evaluate_alerts("X", iter([rows.iloc[lo:hi]]), ref, threshold)
        if frame is not None:
            alerts.extend(map(tuple, frame.itertuples(index=False)))
    return alerts, ref


@settings(max_examples=200, deadline=None)
@given(
    prices=st.lists(
        st.floats(min_value=0.5, max_value=500.0, allow_nan=False), min_size=1, max_size=60
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=60), max_size=8),
    threshold=st.floats(min_value=0.1, max_value=20.0, allow_nan=False),
)
def test_alert_kernel_is_batch_boundary_invariant(prices, cuts, threshold):
    whole, ref_whole = _run_chunked(prices, [], threshold)
    chunked, ref_chunked = _run_chunked(prices, cuts, threshold)
    assert chunked == whole
    assert ref_chunked == ref_whole


@settings(max_examples=100, deadline=None)
@given(
    prices=st.lists(
        st.floats(min_value=0.5, max_value=500.0, allow_nan=False), min_size=1, max_size=60
    ),
    threshold=st.floats(min_value=0.1, max_value=20.0, allow_nan=False),
)
def test_alert_kernel_reference_semantics(prices, threshold):
    """Independent sequential model: first tick always alerts; afterwards
    a tick alerts iff it moved >= threshold%% from the last alert."""
    got, _ = _run_chunked(prices, [], threshold)
    ref = None
    want = []
    for seq, price in enumerate(prices):
        if ref is None:
            want.append(("X", seq, price, price, 0.0))
            ref = price
            continue
        move = abs(price - ref) / ref * 100.0
        if move >= threshold:
            want.append(("X", seq, price, ref, round(move, 4)))
            ref = price
    assert got == want


@settings(max_examples=300, deadline=None)
@given(
    a=st.tuples(
        st.integers(min_value=0, max_value=4_102_444_800_000_000),  # µs to year 2100
        st.integers(min_value=0, max_value=10**11),
    ),
    b=st.tuples(
        st.integers(min_value=0, max_value=4_102_444_800_000_000),
        st.integers(min_value=0, max_value=10**11),
    ),
)
def test_tick_key_string_order_matches_tuple_order(a, b):
    """The OHLC open/close pick rides min_by/max_by over a zero-padded
    '%020d|%012d' string of (epoch_us, event_id) — its lexicographic
    order must equal the numeric tuple order for every value either
    engine can produce (the '|' separator sorts below every digit, so
    padding is the only thing keeping this true; this pins it)."""
    key = lambda t: f"{t[0]:020d}|{t[1]:012d}"  # noqa: E731 — mirrors _tick_key
    assert (key(a) < key(b)) == (a < b)
    assert (key(a) == key(b)) == (a == b)
