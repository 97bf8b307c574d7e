"""Layout strategy tests (pyetl_spark.plans): bucketed joins must drop the
exchange entirely; salted joins must equal plain joins exactly."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from pyetl_spark.plans import bucketed_join, colocate_join, salted_join, write_bucketed
from pyetl_spark.tables import load_tables
from tests.conftest import SF_ORACLE


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    t = load_tables(spark, SF_ORACLE)
    write_bucketed(
        t.orders.select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey"
    )
    write_bucketed(
        t.lineitem.select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
        ),
        "b_lineitem",
        "o_orderkey",
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """The whole point of bucketing: the join reads co-located buckets —
    zero shuffles (broadcast disabled to force the merge path)."""
    left, right = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_join(spark, left, right)
        plan = _plan(df)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    t = load_tables(spark, SF_ORACLE)
    plain = (
        t.orders.select("o_orderkey", "o_totalprice")
        .join(
            t.lineitem.select(
                F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
            ),
            "o_orderkey",
        )
    )
    bucketed = bucketed_join(spark, left, right)
    assert bucketed.count() == plain.count()


def test_salted_join_equals_plain_join(spark):
    """Salting must be a pure physical rewrite — bag-equal results."""
    t = load_tables(spark, SF_ORACLE)
    orders = t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
    customer = t.customer.select("c_custkey", "c_mktsegment").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, "o_custkey")
    salted = salted_join(orders, customer, "o_custkey", salt_buckets=4)
    assert salted.count() == plain.count()
    p = plain.select("o_orderkey", "o_custkey", "c_mktsegment")
    s = salted.select("o_orderkey", "o_custkey", "c_mktsegment")
    assert p.exceptAll(s).count() == 0
    assert s.exceptAll(p).count() == 0


def test_colocate_join_reuses_partitioning(spark):
    """groupBy on the join key after a co-partitioned join must not add a
    third exchange (the partitioning is already correct)."""
    t = load_tables(spark, SF_ORACLE)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocate_join(
            t.orders.select("o_orderkey", "o_totalprice"),
            t.lineitem.select("l_orderkey", "l_quantity"),
            "o_orderkey",
            "l_orderkey",
            partitions=16,
        )
        agg = joined.groupBy("o_orderkey").agg(
            F.sum("l_quantity").alias("q")
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            agg.explain("simple")  # one line per node
        plan = buf.getvalue()
        # two repartition exchanges only; join and aggregate reuse them
        assert plan.count("Exchange") == 2
        assert agg.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
