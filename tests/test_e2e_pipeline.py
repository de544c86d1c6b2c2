"""End-to-end ring-[R] integration: the full reference workflow on Spark.

Simulates what a fineventstream user runs today, end to end:
  producers emit base64(JSON) Kinesis-style envelopes (quotes + news)
  → streaming decode / validate / project        (SURVEY §3.1 stages 2-6)
  → stateful high-water dedup on the news topic  (§3.2 stage 4)
  → partitioned lake sink, exactly-once          (§3.1 stage 7)
  → the planned Athena-style analytics on the landed lake: as-of join of
    quotes to news per symbol (§3.3 / J7).
"""

from __future__ import annotations

import base64
import json
import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from fineventstream_spark.operators.asof import asof_join
from fineventstream_spark.schemas import ENVELOPE_SCHEMA
from fineventstream_spark.streaming.pipelines import quote_pipeline_batch
from fineventstream_spark.streaming.sink import write_partitioned_stream
from fineventstream_spark.streaming.state import highwater_dedup

NEWS_SCHEMA = "symbol string, news_id long, article_published_unix long, headline string"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="fes_e2e_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _env(symbol: str, payload: dict) -> dict:
    return {
        "partition_key": symbol,
        "data": base64.b64encode(json.dumps(payload).encode()).decode(),
    }


def _quote(symbol: str, t: int, price: float) -> dict:
    return {"c": price, "d": 0.5, "dp": 0.2, "h": price + 1, "l": price - 1,
            "o": price, "pc": price - 0.5, "t": t, "symbol": symbol}


def _write_jsonl(path: str, name: str, rows: list[dict]) -> None:
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".{name}.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(path, name))


def test_full_pipeline_quotes_news_asof(spark, tmpdir):
    T0 = 1_704_103_200  # 2024-01-01 10:00:00 UTC

    # -- producers: two polls of quotes (plus one malformed envelope), two
    #    overlapping news fetches (the 2-day lookback re-fetch, dup ids)
    qsrc = os.path.join(tmpdir, "quotes_src")
    _write_jsonl(qsrc, "poll1.jsonl", [
        _env("AAPL", _quote("AAPL", T0, 190.0)),
        _env("MSFT", _quote("MSFT", T0, 400.0)),
        {"partition_key": "JUNK", "data": "!!"},
    ])
    _write_jsonl(qsrc, "poll2.jsonl", [
        _env("AAPL", _quote("AAPL", T0 + 600, 191.0)),
        _env("MSFT", _quote("MSFT", T0 + 600, 399.0)),
    ])

    nsrc = os.path.join(tmpdir, "news_src")
    _write_jsonl(nsrc, "fetch1.jsonl", [
        {"symbol": "AAPL", "news_id": 100, "article_published_unix": T0 + 300, "headline": "a100"},
        {"symbol": "MSFT", "news_id": 500, "article_published_unix": T0 + 200, "headline": "m500"},
    ])
    _write_jsonl(nsrc, "fetch2.jsonl", [  # overlap re-fetch: 100 is a dup
        {"symbol": "AAPL", "news_id": 100, "article_published_unix": T0 + 300, "headline": "a100"},
        {"symbol": "AAPL", "news_id": 101, "article_published_unix": T0 + 900, "headline": "a101"},
    ])

    # -- streaming: quotes decode→validate→project → partitioned lake
    quotes_lake = os.path.join(tmpdir, "lake", "stock_quotes")
    q1 = write_partitioned_stream(
        quote_pipeline_batch(spark.readStream.schema(ENVELOPE_SCHEMA).json(qsrc)),
        quotes_lake,
        os.path.join(tmpdir, "ckpt_q"),
        fmt="parquet",
        trigger_seconds=1,
    )
    q1.processAllAvailable()
    q1.stop()

    # -- streaming: news dedup (exact high-water semantics) → lake
    news_lake = os.path.join(tmpdir, "lake", "company_news")
    deduped = highwater_dedup(spark.readStream.schema(NEWS_SCHEMA).json(nsrc), NEWS_SCHEMA)
    q2 = (
        deduped.writeStream.format("parquet")
        .option("path", news_lake)
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt_n"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    # -- lake contents: quotes keep 4 valid rows; news deduped to 3
    quotes = spark.read.parquet(quotes_lake)
    news = spark.read.parquet(news_lake)
    assert quotes.count() == 4
    assert {(r.symbol, r.news_id) for r in news.collect()} == {
        ("AAPL", 100), ("AAPL", 101), ("MSFT", 500),
    }

    # -- analytics ring: latest quote at-or-before each article, per symbol
    news_t = news.withColumn("published_ts", F.timestamp_seconds("article_published_unix"))
    joined = asof_join(
        news_t.select("symbol", "news_id", "headline", "published_ts"),
        quotes.select("symbol", F.col("quote_timestamp_utc").alias("qts"),
                      F.col("current_price"), F.col("quote_timestamp_unix").alias("qtb")),
        on="symbol",
        left_ts="published_ts",
        right_ts="qts",
        right_values=["current_price"],
        right_tiebreak="qtb",
    )
    got = {r.news_id: r.current_price_asof for r in joined.collect()}
    # a100 published T0+300 → quote at T0 (190.0); a101 at T0+900 → quote at
    # T0+600 (191.0); m500 at T0+200 → quote at T0 (400.0)
    assert got == {100: 190.0, 101: 191.0, 500: 400.0}
