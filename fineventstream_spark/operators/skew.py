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
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Result is identical to ``big.join(small, key, how)``; the physical
    difference is that each hot key's rows spread over ``n_salts``
    partitions instead of one. Supported: inner / left joins (the salt
    column never changes multiplicity — each big row gets exactly one
    salt; each small row appears once per salt value).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    # Salt from a per-row id, not a hash of every column: on a wide fact
    # table hashing all columns burns CPU per row for no better spread
    # (any uniform per-row value works — correctness is salt-independent).
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
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
    # Salt must be uncorrelated with the data: hashing the *value* maps a
    # constant/low-cardinality hot group onto one salt and defeats the
    # spread. A hash of the unique row id distributes uniformly no matter
    # the value distribution (any salt assignment yields the same final
    # aggregate, so nondeterminism across retries is harmless).
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    pre = salted.groupBy(key, "__salt").agg(
        F.count("*").alias("__n"), F.sum(value_col).alias("__s")
    )
    return pre.groupBy(key).agg(
        F.sum("__n").alias("n"), F.round(F.sum("__s"), 4).alias("total")
    )
