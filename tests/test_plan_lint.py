"""Routing-policy plan lint (r10 verdict residual #2): the measured
policy — "per-row post-join CPU decides routing" — previously lived only
in docstrings; operators/plan_audit.py makes it a checkable warning.
These tests prove the detector fires on the shape it exists for
(positive controls) and that every current bucketed-layout query is
clean under it (sweep), so a future query that builds an expensive
per-row consumer on the layout default turns this suite red instead of
silently serializing in the hot bucket's task."""

from __future__ import annotations

import inspect

import pytest
from pyspark.sql import functions as F

from fineventstream_spark.operators.bucketed import bucketed_table
from fineventstream_spark.operators.plan_audit import lint_registry, routing_lint
from fineventstream_spark.registry import all_queries


def _bucketed_query_names() -> list[str]:
    return sorted(
        name
        for name, q in all_queries().items()
        if "bucketed_table(" in inspect.getsource(q.fn)
    )


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _colocated_join(spark, sf_dir):
    li = bucketed_table(spark, sf_dir, "lineitem")
    od = bucketed_table(spark, sf_dir, "orders")
    return li.join(
        od.select("o_orderkey", "o_orderpriority").hint("merge"),
        F.col("o_orderkey") == F.col("l_orderkey"),
        "inner",
    )


def test_lint_flags_expensive_jvm_kernel_after_colocated_join(
    spark, sf_dir, no_broadcast
):
    joined = _colocated_join(spark, sf_dir)
    hashed = joined.select(
        F.xxhash64(*joined.columns).alias("h"), "o_orderpriority"
    ).groupBy("o_orderpriority").agg(F.sum("h").alias("s"))
    flags = routing_lint(hashed)
    assert flags, "per-row xxhash64 over every column must trip the lint"
    assert "xxhash64" in flags[0]


def test_lint_flags_python_kernel_after_colocated_join(spark, sf_dir, no_broadcast):
    joined = _colocated_join(spark, sf_dir).select(
        "l_orderkey", "l_quantity", "o_orderpriority"
    )

    def passthrough(batches):
        for b in batches:
            yield b

    piped = joined.mapInPandas(passthrough, joined.schema).groupBy(
        "o_orderpriority"
    ).count()
    flags = routing_lint(piped)
    assert flags, "a per-row Python kernel must trip the lint"
    assert "python-eval" in flags[0]


def test_lint_clean_on_cheap_per_row_consumer(spark, sf_dir, no_broadcast):
    """The measured-keep shape (q_join_enrich_priority's): plain
    sums/min/max straight into the aggregate — partial agg absorbs the
    hot bucket, the layout is correct, the lint must stay quiet."""
    out = (
        _colocated_join(spark, sf_dir)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert routing_lint(out) == []


def test_registry_bucketed_queries_are_lint_clean(spark, sf_dir):
    names = _bucketed_query_names()
    assert names, "no bucketed-layout queries found — sweep is vacuous"
    flags = {n: f for n, f in lint_registry(spark, sf_dir, names).items() if f}
    assert flags == {}, f"routing lint flagged: {flags}"
