"""Declarative data-quality expectations (Great-Expectations-style).

The reference plans "a data validation framework e.g. Great Expectations"
as a next feature (/root/reference/README.md:37 "Next Feats"); its shipped
code has only ad-hoc shape guards (processor_stock_quotes.py:36-38,
producer_company_news.py:100-102). This operator is the declarative
re-expression: a rule set over a DataFrame yields

- :func:`expect`        → (clean_df, violations_df) row split, where each
  violating row carries the list of rule names it failed;
- :func:`expectation_summary` → one (rule, n_viol) row per rule — the
  violations report.

Scale: every row-level rule compiles to a pure JVM boolean expression
(whole-stage codegen; one scan, no Python). ``unique`` needs a shuffle by
the checked column: the summary form uses ``count - countDistinct``
(partial-aggregable, no row explosion); the row-split form counts per key
over a window. NULL semantics: ``in_range`` / ``in_set`` / ``matches``
pass NULLs (compose with ``not_null`` to reject them) — matching SQL's
three-valued logic so the DuckDB twin agrees.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    column: str
    kind: str  # not_null | in_range | in_set | matches | unique
    args: tuple = ()


def not_null(column: str, name: str | None = None) -> Rule:
    return Rule(name or f"{column}_not_null", column, "not_null")


def in_range(column: str, lo, hi, name: str | None = None) -> Rule:
    return Rule(name or f"{column}_in_range", column, "in_range", (lo, hi))


def in_set(column: str, values: tuple, name: str | None = None) -> Rule:
    return Rule(name or f"{column}_in_set", column, "in_set", tuple(values))


def matches(column: str, regex: str, name: str | None = None) -> Rule:
    return Rule(name or f"{column}_matches", column, "matches", (regex,))


def unique(column: str, name: str | None = None) -> Rule:
    return Rule(name or f"{column}_unique", column, "unique")


def _violated(rule: Rule) -> Column:
    """Boolean 'this row violates the rule' expression (row-level kinds)."""
    c = F.col(rule.column)
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "in_range":
        lo, hi = rule.args
        # NULL comparison → NULL → coalesce to 'not violated'
        return F.coalesce(~c.between(lo, hi), F.lit(False))
    if rule.kind == "in_set":
        return F.coalesce(~c.isin(*rule.args), F.lit(False))
    if rule.kind == "matches":
        return F.coalesce(~c.rlike(rule.args[0]), F.lit(False))
    raise ValueError(f"not a row-level rule kind: {rule.kind}")


def expect(df: DataFrame, rules: list[Rule]) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (clean, violations); violations carry a
    ``violated_rules`` array naming every failed rule."""
    flag_cols = []
    out = df
    for r in rules:
        if r.kind == "unique":
            w = Window.partitionBy(r.column)
            out = out.withColumn(f"__viol_{r.name}", F.count("*").over(w) > 1)
        else:
            out = out.withColumn(f"__viol_{r.name}", _violated(r))
        flag_cols.append((r.name, f"__viol_{r.name}"))
    out = out.withColumn(
        "violated_rules",
        F.array_compact(
            F.array(*[F.when(F.col(fc), F.lit(name)) for name, fc in flag_cols])
        ),
    ).drop(*[fc for _, fc in flag_cols])
    clean = out.filter(F.size("violated_rules") == 0).drop("violated_rules")
    violations = out.filter(F.size("violated_rules") > 0)
    return clean, violations


def expectation_summary(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Violations report: one (rule, n_viol) row per rule, computed in a
    single scan + single partial-aggregated job."""
    aggs = []
    for r in rules:
        if r.kind == "unique":
            # excess non-null rows beyond one per distinct value
            aggs.append(
                (F.count(r.column) - F.countDistinct(r.column)).alias(r.name)
            )
        else:
            aggs.append(
                F.sum(F.when(_violated(r), 1).otherwise(0)).alias(r.name)
            )
    wide = df.agg(*aggs)
    pairs = ", ".join(f"'{r.name}', `{r.name}`" for r in rules)
    return wide.selectExpr(f"stack({len(rules)}, {pairs}) AS (rule, n_viol)")
