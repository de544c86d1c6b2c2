"""Skew mitigation: salted joins and salted aggregation.

AQE's skew-join splitting (on in session.py) handles most skew at runtime;
explicit salting is the deterministic fallback for the pathological case —
one key holding a double-digit percentage of a 100 TB fact table — and for
aggregations, where AQE does not split hot groups.

Salting trades one extra small-side replication (×``n_salts``) for an even
distribution of the hot key's rows across ``n_salts`` reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_expr=None,
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Result is identical to ``big.join(small, key, how)``; the physical
    difference is that each hot key's rows spread over ``n_salts``
    partitions instead of one. Supported: inner / left joins (the salt
    column never changes multiplicity — each big row gets exactly one
    salt; each small row appears once per salt value).

    CAVEAT — salt spread is bounded by input partitioning: the default
    salt is ``spark_partition_id % n_salts`` (deterministic under retry,
    see below), so a hot key clustered into fewer input partitions than
    ``n_salts`` — a single coalesced partition, or parquet
    sorted/partitioned BY THE JOIN KEY — takes fewer distinct salts than
    requested and skew mitigation silently degrades (a warning is
    emitted when detectable). Callers with key-clustered inputs should
    pass a per-row deterministic ``salt_expr`` built from a stable id
    column, e.g. ``salt_expr=F.pmod(F.xxhash64("row_id"), F.lit(n_salts))``
    — deterministic because the INPUT is stable, unlike rand()/
    monotonically_increasing_id which re-randomize per task attempt.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt_expr is None and big.rdd.getNumPartitions() < n_salts:
        import warnings

        warnings.warn(
            f"salted_join: big side has {big.rdd.getNumPartitions()} input "
            f"partitions < n_salts={n_salts}; the partition-id salt can only "
            "take that many distinct values, so hot keys spread less than "
            "requested. Pass salt_expr=F.pmod(F.xxhash64(<stable id col>), "
            "F.lit(n_salts)) for per-row spread.",
            stacklevel=2,
        )
    # The salt must be DETERMINISTIC under task retry: a nondeterministic
    # per-row value (monotonically_increasing_id, rand) can assign the
    # same row different salts across map-task attempts, and reducers
    # that fetched different attempts then see the row in different
    # (key, salt) groups — duplicated or dropped join rows (the
    # SPARK-23207 class; SQL nondeterministic expressions do NOT trigger
    # Spark's indeterminate-stage rollback). spark_partition_id is stable
    # for a given plan, costs nothing, and spreads a hot key across as
    # many salts as it has input partitions — the regime salting targets.
    # Callers needing guaranteed per-row spread inside one partition can
    # pass salt_expr=F.pmod(F.xxhash64(*cols), F.lit(n_salts)).
    salt = salt_expr if salt_expr is not None else F.pmod(
        F.spark_partition_id().cast("long"), F.lit(n_salts)
    )
    big_salted = big.withColumn("__salt", salt)
    small_replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_salted.join(small_replicated, [key, "__salt"], how)
    return out.drop("__salt")


def salted_agg_count_sum(
    df: DataFrame, key: str, value_col: str, n_salts: int = 16
) -> DataFrame:
    """Two-phase aggregation for hot groups: pre-aggregate on (key, salt),
    then merge per key. Shuffle #1 carries one row per (partition, key,
    salt); shuffle #2 one row per (key, salt) — the hot key never lands on
    a single reducer with raw rows.

    (Spark's partial aggregation already gives this for algebraic
    aggregates; the explicit form exists for buffer-heavy aggregates —
    collect_list, percentile, UDAFs — where partial buffers on a hot key
    can exceed executor memory.)
    """
    # Salt must be uncorrelated with the data (hashing the *value* maps a
    # constant hot group onto one salt) AND deterministic under retry —
    # with mixed map-task attempts a nondeterministically re-salted row
    # can be double-counted by one reducer and missed by another (same
    # SPARK-23207 class as the join above; "any salt assignment yields
    # the same aggregate" only holds when every reducer sees ONE
    # assignment). spark_partition_id satisfies both: per-partition
    # constant, stable across recomputes, and partial aggregation within
    # a partition makes per-row spread inside one partition worthless
    # anyway — one (key, salt) partial row per partition either way.
    salted = df.withColumn(
        "__salt", F.pmod(F.spark_partition_id().cast("long"), F.lit(n_salts))
    )
    pre = salted.groupBy(key, "__salt").agg(
        F.count("*").alias("__n"), F.sum(value_col).alias("__s")
    )
    return pre.groupBy(key).agg(
        F.sum("__n").alias("n"), F.round(F.sum("__s"), 4).alias("total")
    )
