"""Polling source (SURVEY §2.1 S1/S2): the reference's producers poll a
REST API on a cadence (quotes 60 s, news 900 s with a 2-day lookback —
producer_stock_quotes.py:45, producer_company_news.py:44-45) and fan
records into a keyed stream.

Spark re-expression: a ``rate`` streaming source provides the trigger
cadence; each micro-batch invokes a fetcher callable per tracked symbol
inside ``foreachBatch`` and appends typed rows to the lake (or any sink).
The fetcher is injected — tests and the container use a deterministic fake
(no HTTP libs here); production would wrap an HTTP client with the same
signature.

Scale note: polling 6 symbols is driver-side work by nature (the
bottleneck is the external API, not Spark); the heavy lifting — decode,
dedup, window aggs over the landed stream — runs distributed downstream.
The lookback/dedup interplay (re-fetch a sliding window, suppress
already-seen ids) is handled by streaming/state.py, not the source.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from fineventstream_spark.schemas import RAW_QUOTE_SCHEMA, SYMBOLS

Fetcher = Callable[[str, int], dict | None]
"""(symbol, batch_id) -> raw record dict (terse Finnhub-style keys) or None."""


def fake_quote_fetcher(symbol: str, batch_id: int) -> dict | None:
    """Deterministic stand-in for the Finnhub /quote call
    (producer_stock_quotes.py:56-81): price walks a fixed per-symbol path."""
    base = sum(ord(c) for c in symbol) % 100 + 50
    price = base + (batch_id * 7 % 13) * 0.25
    return {
        "c": price,
        "d": 0.25,
        "dp": round(0.25 / price * 100, 4),
        "h": price + 1,
        "l": price - 1,
        "o": price - 0.5,
        "pc": price - 0.25,
        "t": 1_704_067_200 + batch_id * 60,
        "symbol": symbol,
    }


def poll_quotes_stream(
    spark: SparkSession,
    sink: Callable[[DataFrame, int], None],
    fetcher: Fetcher = fake_quote_fetcher,
    symbols: Sequence[str] = tuple(SYMBOLS),
    poll_seconds: int = 60,
    checkpoint: str | None = None,
) -> StreamingQuery:
    """Start the polling loop: one fetch sweep per trigger, rows handed to
    ``sink(df, batch_id)``. Invalid fetches (None) are dropped — the
    caller's validity filter handles partial records (P4)."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", 1).load()

    def _poll(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        records = [fetcher(s, batch_id) for s in symbols]
        rows = [r for r in records if r is not None]
        if not rows:
            return
        out = spark.createDataFrame(rows, RAW_QUOTE_SCHEMA)
        sink(out, batch_id)

    writer = (
        rate.writeStream.foreachBatch(_poll)
        .trigger(processingTime=f"{poll_seconds} seconds")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
