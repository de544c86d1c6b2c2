"""Seeded differential fuzzing (SURVEY §5.4): randomly composed
filter/group/agg queries run on both engines and compared.

The declared-query suite checks fixed plans; this sweeps the predicate ×
aggregation space with a deterministic seed, catching semantics drift the
hand-written queries don't reach (operator interactions, null paths,
boundary literals). Every case is constructed so both SQL dialects parse
identically and floats are rounded on both sides.
"""

from __future__ import annotations

import random

import pytest

NUMERIC_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
STRING_COLS = ["l_returnflag", "l_linestatus"]
STRING_VALUES = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["F", "O"]}
CMP = ["<", "<=", ">", ">=", "=", "<>"]

N_CASES = 40


def _gen_case(rng: random.Random) -> str:
    preds = []
    for _ in range(rng.randint(1, 3)):
        if rng.random() < 0.6:
            c = rng.choice(NUMERIC_COLS)
            op = rng.choice(CMP)
            if c == "l_quantity":
                lit = round(rng.uniform(1, 50), 1)
            elif c == "l_extendedprice":
                lit = round(rng.uniform(1000, 90000), 2)
            else:
                lit = round(rng.uniform(0.0, 0.1), 3)
            preds.append(f"{c} {op} {lit}")
        else:
            c = rng.choice(STRING_COLS)
            v = rng.choice(STRING_VALUES[c])
            preds.append(f"{c} {'=' if rng.random() < 0.7 else '<>'} '{v}'")
    where = " AND ".join(preds) if rng.random() < 0.7 else " OR ".join(preds)

    group = rng.sample(STRING_COLS, rng.randint(0, 2))
    agg_col = rng.choice(NUMERIC_COLS)
    aggs = [
        "count(*) AS n",
        f"ROUND(SUM({agg_col}), 3) AS s",
        f"ROUND(AVG({agg_col}), 4) AS a",
        f"MIN({agg_col}) AS mn",
        f"MAX({agg_col}) AS mx",
    ]
    sel = (", ".join(group) + ", " if group else "") + ", ".join(aggs)
    gb = f" GROUP BY {', '.join(group)}" if group else ""
    return f"SELECT {sel} FROM lineitem WHERE {where}{gb}"


@pytest.fixture(scope="module")
def spark_lineitem(spark, sf_dir):
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView("lineitem")
    return spark


@pytest.mark.parametrize("case_id", range(N_CASES))
def test_fuzz_case(case_id, spark_lineitem, duck, sf_dir):
    rng = random.Random(42_000 + case_id)
    sql = _gen_case(rng)
    srows = [tuple(r) for r in spark_lineitem.sql(sql).collect()]
    drows = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert len(srows) == len(drows), f"{sql}\nrowcount {len(srows)} vs {len(drows)}"

    def norm(rows):
        return sorted(
            (tuple(round(v, 4) if isinstance(v, float) else v for v in r) for r in rows),
            key=str,
        )

    assert norm(srows) == norm(drows), f"value mismatch for:\n{sql}"
