"""Native Python DataSource for the quote feed (Spark 4 DataSource API).

The reference's quote producer is a poll loop pushing records into a
broker (producer_stock_quotes.py:119-138). ``sources/polling.py``
re-expresses that with ``rate`` + ``foreachBatch``; THIS module is the
first-class form: a registered Spark data source, so the feed reads like
any other table —

    spark.dataSource.register(QuoteDataSource)
    spark.read.format("fineventstream_quotes")
         .option("ticks_per_symbol", 100).load()
    spark.readStream.format("fineventstream_quotes")
         .option("ticks_per_batch", 10).load()

Batch semantics: one InputPartition PER SYMBOL — fetches run in parallel
on executors, not in a driver loop (the reference serializes symbols,
producer_stock_quotes.py:122-124). Stream semantics: a monotone
tick-counter offset per micro-batch with replayability between
``initialOffset`` and commit — the at-least-once envelope the Kinesis
source provided, expressed in Spark's own offset protocol.

The fetcher is the deterministic fake from ``sources/polling.py`` (the
container has no HTTP client); a production fetcher swaps in behind the
same (symbol, seq) -> record signature. Determinism also makes the
source testable: the same options must yield byte-identical frames.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from fineventstream_spark.schemas import SYMBOLS
from fineventstream_spark.sources.polling import fake_quote_fetcher

_SCHEMA_DDL = (
    "symbol string, seq long, price double, change double, "
    "high double, low double, open double, prev_close double, quote_ts_unix long"
)


def _row(symbol: str, seq: int) -> tuple:
    r = fake_quote_fetcher(symbol, seq)
    return (
        symbol,
        seq,
        r["c"],
        r["d"],
        r["h"],
        r["l"],
        r["o"],
        r["pc"],
        r["t"],
    )


class _SymbolPartition(InputPartition):
    def __init__(self, symbol: str, start: int, end: int):
        self.symbol = symbol
        self.start = start
        self.end = end


class QuoteBatchReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.symbols: Sequence[str] = tuple(
            s for s in options.get("symbols", ",".join(SYMBOLS)).split(",") if s
        )
        self.n = int(options.get("ticks_per_symbol", 100))

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per symbol: fetch parallelism = symbol count,
        # and a symbol's ticks stay ordered within its partition
        return [_SymbolPartition(s, 0, self.n) for s in self.symbols]

    def read(self, partition: _SymbolPartition) -> Iterator[tuple]:
        for seq in range(partition.start, partition.end):
            yield _row(partition.symbol, seq)


class QuoteStreamReader(SimpleDataSourceStreamReader):
    """Offset = {"seq": next-unread tick index} across all symbols.

    ``read(start)`` returns every (symbol, seq) tick in
    [start.seq, start.seq + ticks_per_batch) — replayable: the same
    offset range always yields the same rows (deterministic fetcher),
    which is what makes checkpoint recovery exact."""

    def __init__(self, schema: StructType, options: dict):
        self.symbols: Sequence[str] = tuple(
            s for s in options.get("symbols", ",".join(SYMBOLS)).split(",") if s
        )
        self.per_batch = int(options.get("ticks_per_batch", 10))

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["seq"]
        hi = lo + self.per_batch
        rows = [
            _row(sym, seq) for seq in range(lo, hi) for sym in self.symbols
        ]
        return iter(rows), {"seq": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # replay path after restart: regenerate exactly [start, end)
        return iter(
            _row(sym, seq)
            for seq in range(start["seq"], end["seq"])
            for sym in self.symbols
        )

    def commit(self, end: dict) -> None:
        pass  # nothing external to acknowledge; offsets live in the checkpoint


class QuoteDataSource(DataSource):
    """``fineventstream_quotes``: the quote feed as a first-class source."""

    @classmethod
    def name(cls) -> str:
        return "fineventstream_quotes"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> QuoteBatchReader:
        return QuoteBatchReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> QuoteStreamReader:
        return QuoteStreamReader(schema, self.options)
