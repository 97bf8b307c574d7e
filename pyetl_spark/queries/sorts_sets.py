"""Sorts, limits, top-k, and set operations (SURVEY.md §2.6–2.7, Tier A).

Top-k with LIMIT compiles to `TakeOrderedAndProject` — each task keeps a
k-row heap and only k rows per partition reach the driver-side merge; that's
the 100 TB-safe pattern vs a full global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyetl_spark.parity import R, rnd
from pyetl_spark.registry import query
from pyetl_spark.tables import load_tables


@query(
    "sort_multi_key",
    oracle="""
    SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 440000
    ORDER BY c_mktsegment ASC,
             o_totalprice DESC NULLS LAST,
             c_custkey ASC,
             o_orderkey ASC NULLS FIRST
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort, mixed asc/desc with explicit null placement over data
    that actually contains nulls (SURVEY §2.6 `sort_multi_key` [S])."""
    t = load_tables(spark, sf_dir)
    customer, orders = t.customer, t.orders
    cond = (customer.c_custkey == orders.o_custkey) & (
        orders.o_totalprice > 440000
    )
    return (
        customer.join(orders, cond, "left")
        .select("c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice")
        .orderBy(
            F.col("c_mktsegment").asc(),
            F.col("o_totalprice").desc_nulls_last(),
            F.col("c_custkey").asc(),
            F.col("o_orderkey").asc_nulls_first(),
        )
    )


@query(
    "topk_limit",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {R('l_extendedprice * (1 - l_discount)', 2)} AS revenue
    FROM lineitem
    ORDER BY l_extendedprice * (1 - l_discount) DESC,
             l_orderkey, l_linenumber
    LIMIT 10
    """,
)
def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by revenue with unique (orderkey, linenumber) tiebreak
    (SURVEY §2.6 `topk_limit` [S]); plans as TakeOrderedAndProject."""
    li = load_tables(spark, sf_dir).lineitem
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            revenue.alias("_rev"),
        )
        .orderBy(F.col("_rev").desc(), "l_orderkey", "l_linenumber")
        .limit(10)
        .select(
            "l_orderkey",
            "l_linenumber",
            rnd(F.col("_rev"), 2).alias("revenue"),
        )
    )


def _proj_a(t):
    return t.customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _proj_b(t):
    return t.supplier.select(F.col("s_nationkey").alias("nationkey"))


@query(
    "set_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT s_nationkey FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (SURVEY §2.7 `set_union_all` [S]) — duplicates preserved."""
    t = load_tables(spark, sf_dir)
    return _proj_a(t).unionAll(_proj_b(t))


@query(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (SURVEY §2.7 `set_union_distinct` [S])."""
    t = load_tables(spark, sf_dir)
    return _proj_a(t).union(_proj_b(t)).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (SURVEY §2.7 `set_intersect` [S])."""
    t = load_tables(spark, sf_dir)
    return _proj_a(t).intersect(_proj_b(t))


@query(
    "set_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (SURVEY §2.7 `set_except` [S]). `subtract` is Spark's
    EXCEPT DISTINCT — `exceptAll().distinct()` would differ (it keeps values
    whose left multiplicity exceeds the right's).

    Operands changed from the nationkey projections the other set ops
    share: supplier nations COVER all customer nations at sf ≥ 0.01, so
    the original difference was VACUOUSLY EMPTY at the driver's
    verification scale (r2's hash-match certified nothing — the same
    failure class as subq_scalar; caught by scripts/empty_result_lint.py).
    Custkeys with an URGENT order minus custkeys with a finished order is
    non-empty and ~linear at every SF (3 @ sf0.001, 48 @ sf0.01, 396 @
    sf0.1, 3,960 @ sf1)."""
    t = load_tables(spark, sf_dir)
    urgent = t.orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    finished = t.orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.subtract(finished)


@query(
    "set_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection, multiplicity-preserving (SURVEY §2.7
    `set_intersect_all` [S])."""
    t = load_tables(spark, sf_dir)
    return _proj_a(t).intersectAll(_proj_b(t))


@query(
    "set_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (multiplicity-preserving EXCEPT ALL): customers'
    open-order multiset minus their urgent-order multiset — completes the
    §2.7 set family's ALL variants alongside set_intersect_all."""
    o = load_tables(spark, sf_dir).orders
    open_orders = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return open_orders.exceptAll(urgent)
