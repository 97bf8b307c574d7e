"""Aggregation operators (SURVEY.md §2.4, all Tier A except approx_distinct).

Spark plans every groupBy().agg() as partial (map-side) + final HashAggregate
automatically — at 100 TB the partial combine is what keeps the shuffle small,
and nothing here defeats it (no Python in the hot path, no collect loops).
Float outputs are rounded identically on both engines (SURVEY §5.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyetl_spark.registry import query
from pyetl_spark.tables import load_tables


@query(
    "agg_groupby_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                    AS avg_qty,
           round(avg(l_extendedprice), 4)                               AS avg_price,
           round(avg(l_discount), 4)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_groupby_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship TPC-H Q1 shape: pricing summary per returnflag+linestatus.

    Capability basis: SURVEY.md §2.4 `agg_groupby_pricing` [T][S].
    Scan→filter→partial-agg→final-agg: one shuffle, fully codegen'd; the
    shipdate predicate reaches the parquet row-group stats.
    """
    li = load_tables(spark, sf_dir).lineitem
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "agg_global",
    oracle="""
    SELECT count(*) AS n_rows,
           round(sum(l_quantity), 2) AS total_qty,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table aggregate, no grouping (SURVEY §2.4 `agg_global` [S])."""
    li = load_tables(spark, sf_dir).lineitem
    return li.agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct per group (SURVEY §2.4 `agg_count_distinct` [S]).

    Spark expands count(distinct) into a two-phase aggregate (partial
    distinct then merge) — no driver-side dedup, scales with keys.
    """
    o = load_tables(spark, sf_dir).orders
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@query("agg_approx_distinct")  # Tier B: approximate → rows-only check
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct count (SURVEY §2.4 `agg_approx_distinct` [S]).

    Never hash-declared (approximate); engine test asserts <=2% error vs
    exact. This is the 100 TB path for cardinality estimation — constant
    memory per group vs the exact expand-and-merge.
    """
    o = load_tables(spark, sf_dir).orders
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers")
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 12 AND sum(o_totalprice) > 1000000
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (SURVEY §2.4 `agg_having` [S]). The filter on
    the un-rounded sum stays identical on both engines; only output rounds."""
    o = load_tables(spark, sf_dir).orders
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_totalprice").alias("_spend"),
        )
        .filter((F.col("n_orders") >= 12) & (F.col("_spend") > 1000000))
        .select(
            "o_custkey",
            "n_orders",
            F.round("_spend", 2).alias("total_spend"),
        )
    )


@query(
    "agg_conditional",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_discount > 0.05
                          THEN l_extendedprice ELSE 0 END), 2) AS hi_disc_rev,
           round(sum(CASE WHEN l_discount <= 0.05
                          THEN l_extendedprice ELSE 0 END), 2) AS lo_disc_rev,
           count(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
           count(*) FILTER (WHERE l_tax = 0) AS n_taxfree
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional aggregation (SURVEY §2.4 `agg_conditional`)."""
    li = load_tables(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(
                F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))
                .otherwise(0.0)
            ),
            2,
        ).alias("hi_disc_rev"),
        F.round(
            F.sum(
                F.when(F.col("l_discount") <= 0.05, F.col("l_extendedprice"))
                .otherwise(0.0)
            ),
            2,
        ).alias("lo_disc_rev"),
        F.count_if(F.col("l_quantity") >= 25).alias("n_bulk"),
        F.count_if(F.col("l_tax") == 0).alias("n_taxfree"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           round(var_samp(l_quantity), 4)         AS var_qty,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           round(covar_samp(l_discount, l_tax), 4)     AS cov_disc_tax
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates, rounded 4dp (SURVEY §2.4 `agg_stats` [S])."""
    li = load_tables(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_discount", "l_tax"), 4).alias("cov_disc_tax"),
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (SURVEY §2.4 `agg_percentile` [S]).

    Spark `percentile` == DuckDB `quantile_cont` (linear interpolation).
    At 100 TB the approx_percentile sketch is the right tool; exact kept
    here because the oracle demands determinism.
    """
    o = load_tables(spark, sf_dir).orders
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", 0.5), 2).alias("median_price"),
        F.round(F.percentile("o_totalprice", 0.9), 2).alias("p90_price"),
    )


@query(
    "agg_minmax_by",
    oracle="""
    SELECT o_custkey,
           max(struct_pack(p := o_totalprice, k := o_orderkey))['k'] AS best_order,
           min(struct_pack(p := o_totalprice, k := o_orderkey))['k'] AS worst_order,
           round(max(o_totalprice), 2) AS best_price
    FROM orders
    GROUP BY o_custkey
    """,
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-valued argmax/argmin (SURVEY §2.4 `agg_minmax_by` [S]).

    Deterministic under price ties via the struct-lexicographic idiom
    (max over (price, key) pairs) — same semantics both engines, unlike
    bare max_by whose tie behavior is unspecified.
    """
    o = load_tables(spark, sf_dir).orders
    pair = F.struct(
        F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k")
    )
    return o.groupBy("o_custkey").agg(
        F.max(pair)["k"].alias("best_order"),
        F.min(pair)["k"].alias("worst_order"),
        F.round(F.max("o_totalprice"), 2).alias("best_price"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name,
           grouping(r_name)::INT AS g_region,
           grouping(n_name)::INT AS g_nation,
           round(sum(c_acctbal), 2) AS total_bal,
           count(*) AS n_cust
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals region→nation (SURVEY §2.4 `agg_rollup` [S])."""
    t = load_tables(spark, sf_dir)
    customer, nation, region = t.customer, t.nation, t.region
    joined = customer.join(
        nation, customer.c_nationkey == nation.n_nationkey
    ).join(region, nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        F.count("*").alias("n_cust"),
    ).select(
        "r_name", "n_name", "g_region", "g_nation", "total_bal", "n_cust"
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           grouping(o_orderstatus)::INT AS g_status,
           grouping(o_orderpriority)::INT AS g_prio,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping combinations over 2 dims (SURVEY §2.4 `agg_cube` [S])."""
    o = load_tables(spark, sf_dir).orders
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    ).select(
        "o_orderstatus", "o_orderpriority", "g_status", "g_prio",
        "n_orders", "revenue",
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT c_mktsegment, c_nationkey,
           grouping(c_mktsegment)::INT AS g_seg,
           grouping(c_nationkey)::INT  AS g_nat,
           count(*) AS n_cust,
           round(avg(c_acctbal), 4) AS avg_bal
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping-set list (SURVEY §2.4 `agg_grouping_sets` [S]).

    Uses the SQL entry point (DataFrame API has no groupingSets pre-4.x
    parity) — same Catalyst plan as rollup/cube's Expand node.
    """
    load_tables(spark, sf_dir).register_views()
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey,
               CAST(grouping(c_mktsegment) AS INT) AS g_seg,
               CAST(grouping(c_nationkey) AS INT)  AS g_nat,
               count(*) AS n_cust,
               round(avg(c_acctbal), 4) AS avg_bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT o_custkey,
           list_sort(list(o_orderpriority)) AS priorities,
           count(*) AS n
    FROM orders
    WHERE o_custkey < 50
    GROUP BY o_custkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group sorted value list (SURVEY §2.4 `agg_collect_sorted` [S]).
    Sorted because bare collect_list order is partition-dependent."""
    o = load_tables(spark, sf_dir).orders
    return (
        o.filter(F.col("o_custkey") < 50)
        .groupBy("o_custkey")
        .agg(
            F.array_sort(F.collect_list("o_orderpriority")).alias(
                "priorities"
            ),
            F.count("*").alias("n"),
        )
    )


@query(
    "agg_distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate
    FROM lineitem
    WHERE l_quantity > 45
    """,
)
def agg_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT row dedup (SURVEY §2.4 `agg_distinct_rows` [S])."""
    li = load_tables(spark, sf_dir).lineitem
    return (
        li.filter(F.col("l_quantity") > 45)
        .select("l_returnflag", "l_linestatus", "l_shipdate")
        .distinct()
    )
