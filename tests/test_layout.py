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


def test_zvalue_morton_bit_interleave(spark):
    """Known Morton codes: x at even bit positions, y at odd."""
    from pyetl_spark.plans import zvalue

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (7, 7)], ["x", "y"]
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zvalue(["x", "y"], bits=3)).collect()
    }
    assert got == {
        (0, 0): 0,
        (1, 0): 1,
        (0, 1): 2,
        (1, 1): 3,
        (2, 3): 14,  # x=10b → z bits 0,2 = 0,1; y=11b → z bits 1,3 = 1,1 → 1110b
        (7, 7): 63,
    }


def test_zorder_prunes_both_dimensions(spark):
    """The data-skipping claim, quantified: 32×32 grid, 16 partitions.
    A band predicate on y touches EVERY x-sorted partition but only a
    fraction of z-ordered ones; x-band pruning stays comparable. The
    z-order worst dimension beats the linear layout's worst dimension
    by ≥ 2× (it's ~√P vs P partitions touched)."""
    from pyetl_spark.plans import zorder_repartition

    pts = spark.createDataFrame(
        [(x, y) for x in range(32) for y in range(32)], ["x", "y"]
    )

    def partitions_touching(df, col, lo, hi):
        import pyspark.sql.functions as F

        stats = (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.min(col).alias("mn"), F.max(col).alias("mx"))
            .collect()
        )
        return sum(1 for r in stats if r["mx"] >= lo and r["mn"] <= hi)

    zdf = zorder_repartition(pts, ["x", "y"], 16, bits=5).cache()
    xdf = pts.repartitionByRange(16, "x").sortWithinPartitions("x").cache()
    n_parts = zdf.rdd.getNumPartitions()
    assert n_parts >= 8  # range partitioner actually spread the data

    z_worst = max(
        partitions_touching(zdf, "x", 8, 11),
        partitions_touching(zdf, "y", 8, 11),
    )
    lin_worst = max(
        partitions_touching(xdf, "x", 8, 11),
        partitions_touching(xdf, "y", 8, 11),
    )
    assert lin_worst >= 16  # y-band hits every x-slab
    assert z_worst * 2 <= lin_worst, (z_worst, lin_worst)
