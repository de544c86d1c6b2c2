"""Stateful high-water-mark dedup — the reference's one true stateful
operator (SURVEY §2.8 T2), exact semantics.

Reference rule (producer_company_news.py:122-141,169-171): keep an article
iff ``id > last_seen[symbol]``; after each batch advance
``last_seen[symbol] = max(seen ids)``. State is in-memory there (lost on
restart, :56); here it lives in Spark's checkpointed state store via
``applyInPandasWithState`` — strictly stronger (survives restarts,
exactly-once with the file sink).

Note this is *stricter* than ``dropDuplicatesWithinWatermark``: a late
record with an id below the high-water mark is dropped even if never seen
(monotone-id assumption), exactly matching the reference.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "max_id long"


def _dedup_group(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key (symbol) group: emit rows with id > high-water mark, then
    commit the new max — state advances only at epoch end, matching the
    reference's post-batch commit ordering (producer_company_news.py:169-171).

    Within a batch the rows are sorted by id first (the reference sorts
    each fetch by (datetime, id) before the monotone pass,
    producer_company_news.py:107-120) and duplicate ids are collapsed —
    a micro-batch may pack several overlapping poll files, so the same
    article can appear twice inside one epoch."""
    (max_id,) = state.get if state.exists else (None,)
    hwm = max_id if max_id is not None else -1
    pdfs = list(batches)
    if pdfs:
        merged = pd.concat(pdfs, ignore_index=True)
        merged = merged.sort_values("news_id").drop_duplicates("news_id")
        keep = merged[merged["news_id"] > hwm]
        if len(keep):
            hwm = int(keep["news_id"].max())
            yield keep
    state.update((hwm,))


def highwater_dedup(
    news: DataFrame,
    output_schema: str,
    key_col: str = "symbol",
) -> DataFrame:
    """Apply exact high-water dedup per key on a *streaming* DataFrame.

    ``output_schema`` must list the input columns (applyInPandasWithState
    requires an explicit output schema). Scale: state per key is a single
    long — millions of keys fit in MBs of state store; the shuffle is the
    one hash-partition on the key that any stateful op needs.
    """
    return news.groupBy(key_col).applyInPandasWithState(
        _dedup_group,
        outputStructType=output_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
