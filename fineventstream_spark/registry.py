"""Declared-query registry.

Every operator from SURVEY.md §2 is exposed as a named query: a PySpark
callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a
DuckDB oracle SQL twin. ``__spark_entry__.py`` and the differential test
suite both read this registry, so there is exactly one source of truth for
"what the engine claims to support".

Determinism rules (the driver hashes values order-insensitively):
- alias every computed column identically in Spark and SQL;
- round floating aggregates on BOTH sides (summation order differs);
- any LIMIT/top-k query must have a total order (unique tiebreak column);
- timestamps are UTC micros everywhere (see catalog.py).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB ANSI SQL twin; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a declared query (and its oracle twin)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import every query module (side effect: registration) and return the registry."""
    # imported here to avoid circular imports at package-import time
    from fineventstream_spark.queries import (  # noqa: F401
        aggregates,
        functions,
        joins,
        llm,
        projection,
        scans,
        sorts,
        streaming_batch,
        subqueries,
        windows,
    )

    return REGISTRY
