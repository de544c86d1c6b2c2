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
from fineventstream_spark.schemas import ENVELOPE_SCHEMA, RAW_NEWS_SCHEMA
from fineventstream_spark.sources.polling import (
    fake_news_fetcher,
    fake_quote_fetcher,
    poll_news_stream,
    poll_quotes_stream,
    project_news,
)
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


def test_full_pipeline_from_polling_sources(spark, tmpdir):
    """Producers→lake for BOTH topics starting at the polling sources:
    quotes (S1) are envelope-encoded and decoded downstream; news (S2)
    re-fetches an overlapping 2-day lookback window each poll and the
    high-water dedup collapses the duplicate article ids."""
    import time

    from pyspark.sql import functions as F

    T0 = 1_704_103_200  # 2024-01-01 10:00:00 UTC
    qsrc = os.path.join(tmpdir, "quotes_env_src")
    nstage = os.path.join(tmpdir, "news_staging")
    os.makedirs(qsrc, exist_ok=True)
    os.makedirs(nstage, exist_ok=True)

    # -- producer side: quote poll → keyed envelope (send_to_kinesis
    #    re-expression, producer_stock_quotes.py:113-145)
    def quote_sink(df, batch_id):
        env = df.select(
            F.col("symbol").alias("partition_key"),
            F.base64(F.to_json(F.struct(*df.columns)).cast("binary")).alias("data"),
        )
        env.coalesce(1).write.mode("append").json(qsrc)

    # -- producer side: news poll with a clock jumping 6 h per batch, so
    #    each poll re-fetches most of the previous window (dup ids) plus
    #    one new 6-hour slot per symbol
    def news_sink(df, batch_id):
        df.coalesce(1).write.mode("append").json(nstage)

    q_poll = poll_quotes_stream(
        spark, quote_sink, fetcher=fake_quote_fetcher,
        symbols=["AAPL", "MSFT"], poll_seconds=1,
    )
    n_poll = poll_news_stream(
        spark, news_sink, fetcher=fake_news_fetcher,
        symbols=["AAPL", "MSFT"], poll_seconds=1, lookback_days=2,
        now_fn=lambda batch_id: T0 + batch_id * 6 * 3600,
    )
    deadline = time.time() + 60
    def _json_files(d):
        return [f for f in os.listdir(d) if f.endswith(".json")]
    while time.time() < deadline and (
        len(_json_files(qsrc)) < 2 or len(_json_files(nstage)) < 2
    ):
        time.sleep(0.5)
    q_poll.stop()
    n_poll.stop()
    assert len(_json_files(qsrc)) >= 2, "quote poller produced <2 batches"
    assert len(_json_files(nstage)) >= 2, "news poller produced <2 batches"

    # -- consumer side: quotes decode→validate→project → partitioned lake,
    #    reading through the broker-agnostic envelope adapter (a real
    #    deployment changes only source_format + options here)
    from fineventstream_spark.sources.connector import read_envelope_stream

    quotes_lake = os.path.join(tmpdir, "lake", "stock_quotes")
    q1 = write_partitioned_stream(
        quote_pipeline_batch(read_envelope_stream(spark, "json", {"path": qsrc})),
        quotes_lake,
        os.path.join(tmpdir, "ckpt_q2"),
        fmt="parquet",
        trigger_seconds=1,
    )
    q1.processAllAvailable()
    q1.stop()

    # -- consumer side: news project → exact high-water dedup → lake
    news_lake = os.path.join(tmpdir, "lake", "company_news")
    staged = spark.readStream.schema(RAW_NEWS_SCHEMA).json(nstage)
    projected = project_news(staged).drop("fetch_timestamp_utc")  # nondeterministic col
    out_schema = (
        "symbol string, news_id long, article_published_unix long, "
        "article_published_utc timestamp, category string, headline string, "
        "summary string, source string, url string, image_url string"
    )
    q2 = (
        highwater_dedup(projected, out_schema)
        .writeStream.format("parquet")
        .option("path", news_lake)
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt_n2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    quotes = spark.read.parquet(quotes_lake)
    assert quotes.count() >= 4  # ≥2 batches × 2 symbols, all valid
    assert {r.symbol for r in quotes.select("symbol").distinct().collect()} == {"AAPL", "MSFT"}
    assert quotes.filter(F.col("current_price").isNull()).count() == 0

    staged_rows = spark.read.schema(RAW_NEWS_SCHEMA).json(nstage)
    news = spark.read.parquet(news_lake)
    # overlap re-fetch produced duplicate ids in staging; the lake has none
    assert staged_rows.count() > staged_rows.select("id").distinct().count()
    assert news.count() == news.select("news_id").distinct().count()
    assert news.count() == staged_rows.select("id").distinct().count()
