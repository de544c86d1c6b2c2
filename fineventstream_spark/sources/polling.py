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

from fineventstream_spark.schemas import RAW_NEWS_SCHEMA, RAW_QUOTE_SCHEMA, SYMBOLS

Fetcher = Callable[[str, int], dict | None]
"""(symbol, batch_id) -> raw record dict (terse Finnhub-style keys) or None."""

NewsFetcher = Callable[[str, int, int], list[dict]]
"""(symbol, from_epoch_s, to_epoch_s) -> raw article dicts (Finnhub
company-news response shape). Like the real API, the same time range must
return the same articles — re-fetch overlap produces duplicate ids that
downstream high-water dedup suppresses."""


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


def fake_news_fetcher(symbol: str, from_ts: int, to_ts: int) -> list[dict]:
    """Deterministic stand-in for the Finnhub /company-news call
    (producer_company_news.py:60-93): one article per 6-hour slot inside
    [from_ts, to_ts], id derived from (symbol, slot) — so overlapping
    lookback windows regenerate identical articles, exercising dedup."""
    sym_base = sum(ord(c) for c in symbol) * 1_000_000
    slot_s = 6 * 3600
    out = []
    for slot in range(from_ts // slot_s, to_ts // slot_s + 1):
        published = slot * slot_s
        if not (from_ts <= published <= to_ts):
            continue
        out.append(
            {
                "category": "company",
                "datetime": published,
                "headline": f"{symbol} update {slot}",
                "id": sym_base + slot,
                "image": "",
                "related": symbol,
                "source": "fake-wire",
                "summary": f"summary for {symbol} slot {slot}",
                "url": f"https://example.invalid/{symbol}/{slot}",
            }
        )
    return out


def poll_news_stream(
    spark: SparkSession,
    sink: Callable[[DataFrame, int], None],
    fetcher: NewsFetcher = fake_news_fetcher,
    symbols: Sequence[str] = tuple(SYMBOLS),
    poll_seconds: int = 900,
    lookback_days: int = 2,
    now_fn: Callable[[int], int] | None = None,
    checkpoint: str | None = None,
) -> StreamingQuery:
    """Date-ranged news polling (S2): each trigger computes the
    ``[now - lookback_days, now]`` fetch window — the reference's 2-day
    sliding lookback (producer_company_news.py:44-45,213-217) — fetches
    every symbol's articles for that range, and hands the flattened rows to
    ``sink(df, batch_id)``. Non-list / malformed fetch results are dropped
    (P6 shape guard, producer_company_news.py:100-102).

    ``now_fn(batch_id) -> epoch_seconds`` injects a deterministic clock for
    tests; default is the rate source's wall-clock batch timestamp.
    Duplicate suppression across overlapping windows is downstream's job
    (streaming/state.py::highwater_dedup), mirroring the reference's
    producer-side state split.
    """
    rate = spark.readStream.format("rate").option("rowsPerSecond", 1).load()

    def _poll(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if now_fn is not None:
            now_s = now_fn(batch_id)
        else:
            now_s = int(batch_df.agg({"timestamp": "max"}).first()[0].timestamp())
        frm = now_s - lookback_days * 86400
        rows: list[dict] = []
        for s in symbols:
            arts = fetcher(s, frm, now_s)
            if not isinstance(arts, list):
                continue  # shape guard: non-list payload
            rows.extend(a for a in arts if isinstance(a, dict))
        if not rows:
            return
        sink(spark.createDataFrame(rows, RAW_NEWS_SCHEMA), batch_id)

    writer = (
        rate.writeStream.foreachBatch(_poll)
        .trigger(processingTime=f"{poll_seconds} seconds")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def project_news(raw: DataFrame) -> DataFrame:
    """Raw Finnhub article → company_news record (P1 projection + P2
    epoch→timestamp derive; reference producer_company_news.py:144-164).
    Pure DataFrame→DataFrame: identical under batch and readStream."""
    from pyspark.sql import functions as F

    return raw.select(
        F.col("related").alias("symbol"),
        F.col("id").alias("news_id"),
        F.current_timestamp().alias("fetch_timestamp_utc"),
        F.col("datetime").alias("article_published_unix"),
        F.timestamp_seconds("datetime").alias("article_published_utc"),
        "category",
        "headline",
        "summary",
        "source",
        "url",
        F.col("image").alias("image_url"),
    )
