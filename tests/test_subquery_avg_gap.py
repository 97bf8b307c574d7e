"""Regression: the CAST(avg AS BIGINT) truncate-vs-round hazard (r6 verdict,
"What's wrong" #1).

Spark ``CAST(double AS BIGINT)`` truncates toward zero; DuckDB rounds to
nearest, ties to even (C ``rint`` — probed this round: 100.5→100,
101.5→102, 120.5→120). The old subquery texts compared against
``CAST(avg(cents) AS BIGINT)`` — identical SQL, different thresholds
whenever frac(avg) > 0.5 (or == 0.5 with odd floor), so the keys were green
only because no fixture row landed in the gap. The fix (subqueries.py)
replaces the float avg with pure integer division (Spark ``DIV`` / DuckDB
``//`` — both floor on positive operands).

This test PLANTS rows exactly in that gap and asserts:
  1. the OLD texts genuinely disagree across engines on this fixture
     (proving the fixture exercises the hazard, not a vacuous pass), and
  2. the SHIPPED texts agree exactly (engine parity restored), with a
     non-empty result (no vacuous green).

Fixture (integer cents, chosen by exhaustive search in round 7):
  orders   cust 7: [1.01, 1.02]  -> per-cust avg 101.5c (spark 101, duck 102)
           cust 9: [2.04]        -> global avg 135.67c: old spark thr 202,
                                    old duck thr 204, row 204 in the gap
  customer acctbal [1.01, 1.02]  -> avg 101.5c; the 102c row is the gap row
"""

from __future__ import annotations

import datetime
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyetl_spark import registry
from pyetl_spark.parity import FXP
from pyetl_spark.tables import TABLE_NAMES
from tests.conftest import SF_ORACLE

registry.load_all()

_OLD_DATE = datetime.datetime(2000, 1, 1)  # before the dormancy cutoff


def _write_gap_fixture(root) -> str:
    """Build a full 10-table fixture dir: crafted orders + customer, the
    other eight tables symlinked from the standard SF dir (register_views
    loads all ten)."""
    fx = os.path.join(str(root), "gapfix")
    os.makedirs(fx, exist_ok=True)
    for name in TABLE_NAMES:
        if name in ("orders", "customer"):
            continue
        dst = os.path.join(fx, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF_ORACLE, f"{name}.parquet"), dst)

    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([7, 7, 9], pa.int64()),
            "o_orderstatus": pa.array(["F"] * 3, pa.string()),
            "o_totalprice": pa.array([1.01, 1.02, 2.04], pa.float64()),
            "o_orderdate": pa.array([_OLD_DATE] * 3, pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 3, pa.string()),
        }
    )
    pq.write_table(orders, os.path.join(fx, "orders.parquet"))

    customer = pa.table(
        {
            "c_custkey": pa.array([7, 8], pa.int64()),
            "c_name": pa.array(["a", "b"], pa.string()),
            "c_nationkey": pa.array([0, 0], pa.int32()),
            "c_acctbal": pa.array([1.01, 1.02], pa.float64()),
            "c_mktsegment": pa.array(["BUILDING"] * 2, pa.string()),
        }
    )
    pq.write_table(customer, os.path.join(fx, "customer.parquet"))
    return fx


@pytest.fixture(scope="module")
def gap_dir(tmp_path_factory):
    return _write_gap_fixture(tmp_path_factory.mktemp("avg_gap"))


@pytest.fixture(scope="module")
def gap_duck(gap_dir):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{gap_dir}/{name}.parquet')"
        )
    yield con
    con.close()


# The pre-fix predicate texts, kept here verbatim so the test can prove the
# fixture actually splits the engines. (p) = price column, (t) = table.
_OLD = {
    "subq_scalar": (
        "SELECT o_orderkey FROM orders WHERE {c} > "
        "(SELECT (CAST(avg({c}) AS BIGINT) * 3) {div} 2 FROM orders)"
    ),
    "subq_correlated": (
        "SELECT o.o_orderkey FROM orders o WHERE {co} > "
        "(SELECT CAST(avg({c2}) AS BIGINT) FROM orders o2 "
        "WHERE o2.o_custkey = o.o_custkey)"
    ),
    "subq_dormant_high_balance": (
        "SELECT c_custkey FROM customer WHERE {b} > "
        "(SELECT CAST(avg({b}) AS BIGINT) FROM customer WHERE c_acctbal > 0)"
    ),
}


def _old_sql(key: str, div: str) -> str:
    return _OLD[key].format(
        c=FXP("o_totalprice", 100),
        co=FXP("o.o_totalprice", 100),
        c2=FXP("o2.o_totalprice", 100),
        b=FXP("c_acctbal", 100),
        div=div,
    )


_KEYS = ["subq_scalar", "subq_correlated", "subq_dormant_high_balance"]


@pytest.mark.parametrize("key", _KEYS)
def test_old_texts_disagree_on_gap_fixture(spark, gap_duck, gap_dir, key):
    """Sanity: the fixture really sits in the truncate-vs-round gap — the
    pre-fix texts produce DIFFERENT key sets across engines here."""
    from pyetl_spark.tables import load_tables

    load_tables(spark, gap_dir).register_views()
    s_rows = {r[0] for r in spark.sql(_old_sql(key, "DIV")).collect()}
    d_rows = {r[0] for r in gap_duck.execute(_old_sql(key, "//")).fetchall()}
    assert s_rows != d_rows, (
        f"{key}: gap fixture no longer splits the old texts "
        f"(spark={sorted(s_rows)}, duck={sorted(d_rows)}) — fixture drifted"
    )


@pytest.mark.parametrize("key", _KEYS)
def test_fixed_texts_agree_on_gap_fixture(spark, gap_duck, gap_dir, key):
    """The shipped integer-division texts agree exactly on the gap fixture,
    with a non-empty result (no vacuous green)."""
    sdf = registry.QUERIES[key](spark, gap_dir)
    cols = sdf.columns
    s_rows = sorted(tuple(r) for r in sdf.collect())
    d = gap_duck.execute(registry.ORACLE[key]).df()
    d_rows = sorted(tuple(r) for r in d[cols].itertuples(index=False))
    assert s_rows, f"{key}: empty result on gap fixture — vacuous"
    assert s_rows == d_rows, (
        f"{key}: engines disagree after fix: spark={s_rows} duck={d_rows}"
    )
