"""Aggregation operators (SURVEY.md §2.4, all Tier A except approx_distinct).

Spark plans every groupBy().agg() as partial (map-side) + final HashAggregate
automatically — at 100 TB the partial combine is what keeps the shuffle small,
and nothing here defeats it (no Python in the hot path, no collect loops).

Float discipline: all rounded outputs go through pyetl_spark.parity — money
sums use exact fixed-point integer summation (order-free, bit-identical
across engines and partitionings); see parity.py for why native round() is
banned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyetl_spark.parity import FXP, MAVG, MSUM, R, fxp, mavg, msum, rnd
from pyetl_spark.registry import query
from pyetl_spark.tables import load_tables


@query(
    "agg_groupby_pricing",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {MSUM('l_quantity', 100)}                                    AS sum_qty,
           {MSUM('l_extendedprice', 100)}                               AS sum_base_price,
           {MSUM('l_extendedprice * (1 - l_discount)', 10**4)}          AS sum_disc_price,
           {MSUM('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 10**6)} AS sum_charge,
           {MAVG('l_quantity', 100)}                                    AS avg_qty,
           {MAVG('l_extendedprice', 100)}                               AS avg_price,
           {MAVG('l_discount', 100)}                                    AS avg_disc,
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
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            msum(F.col("l_quantity"), 100).alias("sum_qty"),
            msum(F.col("l_extendedprice"), 100).alias("sum_base_price"),
            msum(disc_price, 10**4).alias("sum_disc_price"),
            msum(charge, 10**6).alias("sum_charge"),
            mavg(F.col("l_quantity"), 100).alias("avg_qty"),
            mavg(F.col("l_extendedprice"), 100).alias("avg_price"),
            mavg(F.col("l_discount"), 100).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "agg_global",
    oracle=f"""
    SELECT count(*) AS n_rows,
           {MSUM('l_quantity', 100)} AS total_qty,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           {MAVG('l_discount', 100)} AS avg_disc,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table aggregate, no grouping (SURVEY §2.4 `agg_global` [S]).
    min/max need no rounding — they return bit-identical input values."""
    li = load_tables(spark, sf_dir).lineitem
    return li.agg(
        F.count("*").alias("n_rows"),
        msum(F.col("l_quantity"), 100).alias("total_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        mavg(F.col("l_discount"), 100).alias("avg_disc"),
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
    oracle=f"""
    SELECT o_custkey, count(*) AS n_orders,
           {MSUM('o_totalprice', 100)} AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 12 AND sum({FXP('o_totalprice', 100)}) > 100000000
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (SURVEY §2.4 `agg_having` [S]). The HAVING
    threshold compares in the exact scaled-integer domain so the predicate
    decides identically on both engines."""
    o = load_tables(spark, sf_dir).orders
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(fxp(F.col("o_totalprice"), 100)).alias("_spend_c"),
        )
        .filter((F.col("n_orders") >= 12) & (F.col("_spend_c") > 100000000))
        .select(
            "o_custkey",
            "n_orders",
            rnd(F.col("_spend_c").cast("double") / F.lit(100.0), 2).alias(
                "total_spend"
            ),
        )
    )


@query(
    "agg_conditional",
    oracle=f"""
    SELECT l_returnflag,
           {MSUM("CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END", 100)} AS hi_disc_rev,
           {MSUM("CASE WHEN l_discount <= 0.05 THEN l_extendedprice ELSE 0.0 END", 100)} AS lo_disc_rev,
           count(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
           count(*) FILTER (WHERE l_tax = 0) AS n_taxfree
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional aggregation (SURVEY §2.4 `agg_conditional`)."""
    li = load_tables(spark, sf_dir).lineitem
    hi = (
        F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))
        .otherwise(0.0)
    )
    lo = (
        F.when(F.col("l_discount") <= 0.05, F.col("l_extendedprice"))
        .otherwise(0.0)
    )
    return li.groupBy("l_returnflag").agg(
        msum(hi, 100).alias("hi_disc_rev"),
        msum(lo, 100).alias("lo_disc_rev"),
        F.count_if(F.col("l_quantity") >= 25).alias("n_bulk"),
        F.count_if(F.col("l_tax") == 0).alias("n_taxfree"),
    )


@query(
    "agg_stats",
    oracle=f"""
    SELECT l_returnflag,
           {R('stddev_samp(l_extendedprice)', 4)} AS sd_price,
           {R('var_samp(l_quantity)', 4)}         AS var_qty,
           {R('corr(l_quantity, l_extendedprice)', 4)} AS corr_qty_price,
           {R('covar_samp(l_discount, l_tax)', 4)}     AS cov_disc_tax
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates, rounded 4dp (SURVEY §2.4 `agg_stats` [S]).
    These aren't on a decimal grid, so tie-risk is measure-zero; the parity
    round only normalizes the final bits."""
    li = load_tables(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        rnd(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        rnd(F.var_samp("l_quantity"), 4).alias("var_qty"),
        rnd(F.corr("l_quantity", "l_extendedprice"), 4).alias(
            "corr_qty_price"
        ),
        rnd(F.covar_samp("l_discount", "l_tax"), 4).alias("cov_disc_tax"),
    )


@query(
    "agg_percentile",
    oracle=f"""
    SELECT o_orderpriority,
           {R('quantile_cont(o_totalprice, 0.5)', 4)} AS median_price,
           {R('quantile_cont(o_totalprice, 0.9)', 4)} AS p90_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (SURVEY §2.4 `agg_percentile` [S]).

    Spark `percentile` == DuckDB `quantile_cont` (linear interpolation);
    results land on a ~3dp grid (interpolating 2dp data at 0.1 fractions),
    so the 4dp parity round is tie-free. At 100 TB approx_percentile is the
    right tool; exact kept because the oracle demands determinism.
    """
    o = load_tables(spark, sf_dir).orders
    return o.groupBy("o_orderpriority").agg(
        rnd(F.percentile("o_totalprice", 0.5), 4).alias("median_price"),
        rnd(F.percentile("o_totalprice", 0.9), 4).alias("p90_price"),
    )


@query(
    "agg_minmax_by",
    oracle="""
    SELECT o_custkey,
           max(struct_pack(p := o_totalprice, k := o_orderkey))['k'] AS best_order,
           min(struct_pack(p := o_totalprice, k := o_orderkey))['k'] AS worst_order,
           max(o_totalprice) AS best_price
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
        F.max("o_totalprice").alias("best_price"),
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT r_name, n_name,
           grouping(r_name)::INT AS g_region,
           grouping(n_name)::INT AS g_nation,
           {MSUM('c_acctbal', 100)} AS total_bal,
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
        msum(F.col("c_acctbal"), 100).alias("total_bal"),
        F.count("*").alias("n_cust"),
    ).select(
        "r_name", "n_name", "g_region", "g_nation", "total_bal", "n_cust"
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           grouping(o_orderstatus)::INT AS g_status,
           grouping(o_orderpriority)::INT AS g_prio,
           count(*) AS n_orders,
           {MSUM('o_totalprice', 100)} AS revenue
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
        msum(F.col("o_totalprice"), 100).alias("revenue"),
    ).select(
        "o_orderstatus", "o_orderpriority", "g_status", "g_prio",
        "n_orders", "revenue",
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT c_mktsegment, c_nationkey,
           grouping(c_mktsegment)::INT AS g_seg,
           grouping(c_nationkey)::INT  AS g_nat,
           count(*) AS n_cust,
           {MAVG('c_acctbal', 100)} AS avg_bal
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping-set list (SURVEY §2.4 `agg_grouping_sets` [S]).

    Uses the SQL entry point (DataFrame API has no groupingSets pre-4.x
    parity) — same Catalyst plan as rollup/cube's Expand node. The Spark SQL
    text mirrors parity.MAVG's arithmetic exactly.
    """
    load_tables(spark, sf_dir).register_views()
    return spark.sql(
        f"""
        SELECT c_mktsegment, c_nationkey,
               CAST(grouping(c_mktsegment) AS INT) AS g_seg,
               CAST(grouping(c_nationkey) AS INT)  AS g_nat,
               count(*) AS n_cust,
               {MAVG('c_acctbal', 100)} AS avg_bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderpriority)), '|')
             AS priorities,
           count(*) AS n
    FROM orders
    WHERE o_custkey < 50
    GROUP BY o_custkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group sorted value list (SURVEY §2.4 `agg_collect_sorted` [S]).
    Sorted because bare collect_list order is partition-dependent.

    The list is serialized '|'-joined: the driver's canon sorts the pandas
    frame on every output column, and array cells (numpy.ndarray) are
    unhashable/unsortable there — a scalar string keeps the operator
    semantics (collect + sort) with a well-defined value hash."""
    o = load_tables(spark, sf_dir).orders
    return (
        o.filter(F.col("o_custkey") < 50)
        .groupBy("o_custkey")
        .agg(
            F.concat_ws(
                "|", F.array_sort(F.collect_list("o_orderpriority"))
            ).alias("priorities"),
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


@query(
    "agg_equidepth_histogram",
    oracle=f"""
    SELECT bucket,
           count(*) AS n_orders,
           min(o_totalprice) AS lo,
           max(o_totalprice) AS hi,
           {MSUM('o_totalprice', 100)} AS bucket_revenue
    FROM (
      SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    GROUP BY bucket
    """,
)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-count) histogram of order prices — the twin of
    `agg_histogram` (equi-width): 10 buckets with ~equal row counts and
    data-driven boundaries, the shape optimizers use for statistics
    collection. Ordering is (price, orderkey) so ties split identically
    on both engines.

    Exact ntile(10) semantics WITHOUT the single-partition window the
    r6 verdict flagged: a two-phase ``global_order_rank`` over the fact
    table (range shuffle + local rank + driver offsets) and the ANSI
    bucket formula ``ntile_from_rank(rank, n, 10)`` — bit-identical to
    the oracle's ntile, but the sort is range-partitioned across the
    cluster. (Approx-quantile boundaries — `agg_approx_percentile` —
    remain the cheaper statistics path when exactness isn't required.)"""
    from pyetl_spark.operators.global_rank import (
        global_order_rank,
        ntile_from_rank,
    )

    o = load_tables(spark, sf_dir).orders
    picked = o.select("o_totalprice", "o_orderkey")
    n = picked.count()
    ranked = global_order_rank(
        picked, ["o_totalprice", "o_orderkey"], out_col="_rank"
    )
    return (
        ranked.select(
            "o_totalprice",
            ntile_from_rank(F.col("_rank"), n, 10).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            msum(F.col("o_totalprice"), 100).alias("bucket_revenue"),
        )
    )


@query(
    "agg_promo_revenue_share",
    oracle=f"""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
           {R("100.0 * (CAST(sum(CASE WHEN p_type = 'PROMO' THEN "
              + FXP('l_extendedprice * (1 - l_discount)', 10**4)
              + " ELSE 0 END) AS DOUBLE)"
              " / CAST(sum("
              + FXP('l_extendedprice * (1 - l_discount)', 10**4)
              + ") AS DOUBLE))", 6)} AS promo_share_pct,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY ship_month
    """,
)
def agg_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share per ship month (TPC-H Q14 shape): what
    percent of monthly revenue came from PROMO-type parts. Numerator and
    denominator are BOTH exact integer 4dp-cent sums (order-free partial
    aggregation), divided once per output row so the only float op is a
    single division on identical integers — deterministic across engines
    and across retries. The part join broadcasts the dimension; the
    month-grained output is bounded at the calendar."""
    t = load_tables(spark, sf_dir)
    rev_c = fxp(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10**4)
    promo_c = F.when(F.col("p_type") == "PROMO", rev_c).otherwise(F.lit(0))
    return (
        t.lineitem.join(
            F.broadcast(t.part.select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("ship_month"))
        .agg(
            rnd(
                F.lit(100.0)
                * F.sum(promo_c).cast("double")
                / F.sum(rev_c).cast("double"),
                6,
            ).alias("promo_share_pct"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "agg_corr_exact",
    oracle=f"""
    WITH g AS (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS x,
             {FXP('l_discount', 100)} AS y
      FROM lineitem
    )
    SELECT l_returnflag,
           count(*) AS n,
           {R('(CAST(count(*) AS DOUBLE) * sum(x * y) - '
              'CAST(sum(x) AS DOUBLE) * sum(y)) / '
              'sqrt(CAST(count(*) AS DOUBLE) * sum(x * x) - '
              'CAST(sum(x) AS DOUBLE) * sum(x)) / '
              'sqrt(CAST(count(*) AS DOUBLE) * sum(y * y) - '
              'CAST(sum(y) AS DOUBLE) * sum(y))', 8)} AS corr_qty_disc
    FROM g
    GROUP BY l_returnflag
    """,
)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per return flag between quantity and discount,
    from EXACT integer moments. Built-in corr() accumulates double
    products in partition order (CoMoment merges are order-sensitive), so
    instead n, Σx, Σy, Σxy, Σx², Σy² are BIGINT sums over the integer
    grids (qty units, discount in integer percent-points via fxp) — the
    five moments merge exactly in any order, and the final r is one
    float expression over identical integers on both engines. At 100 TB
    the BIGINT moments need DECIMAL(38,0)/hugeint sums (Σxy grows with
    row count); the plan shape — one partial+final aggregate, no second
    pass for the means — is unchanged."""
    li = load_tables(spark, sf_dir).lineitem
    g = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        fxp(F.col("l_discount"), 100).alias("y"),
    )
    n = F.count("*").cast("double")
    sx, sy = F.sum("x"), F.sum("y")
    sxy = F.sum(F.col("x") * F.col("y"))
    sxx = F.sum(F.col("x") * F.col("x"))
    syy = F.sum(F.col("y") * F.col("y"))
    r = (
        (n * sxy - sx.cast("double") * sy)
        / F.sqrt(n * sxx - sx.cast("double") * sx)
        / F.sqrt(n * syy - sy.cast("double") * sy)
    )
    return g.groupBy("l_returnflag").agg(
        F.count("*").alias("n"), rnd(r, 8).alias("corr_qty_disc")
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via Spark's bitmap aggregate surface: keys
    bucket into fixed 32k-bit bitmaps (bitmap_bucket_number /
    bitmap_bit_position), bitmaps OR-combine map-side per
    (group, bucket), and the final count is the sum of per-bucket
    popcounts. Same answer as count(DISTINCT) — the oracle — but the
    shuffle carries constant-size bitmaps instead of the key universe,
    the standard exact-distinct trick for dense integer keys at 100 TB
    (HLL's agg_approx_distinct is the sparse/approximate sibling)."""
    li = load_tables(spark, sf_dir).lineitem
    per_bucket = li.groupBy(
        "l_returnflag",
        F.bitmap_bucket_number(F.col("l_partkey")).alias("bucket"),
    ).agg(
        F.bitmap_construct_agg(
            F.bitmap_bit_position(F.col("l_partkey"))
        ).alias("bm")
    )
    return per_bucket.groupBy("l_returnflag").agg(
        F.sum(F.bitmap_count(F.col("bm"))).cast("long").alias("n_parts")
    )


@query(
    "agg_salted_twophase",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof aggregation: (flag, status) has ~6 giant groups — the
    worst case for a single hash shuffle (6 reducers own everything).
    Phase 1 salts the key with hash(orderkey)%16 and aggregates
    (key, salt); phase 2 re-aggregates by key alone. The salted exchange
    spreads each hot group over 16 reducers; phase 2 moves only
    6×16 partial rows. Hash-matches the PLAIN aggregate oracle — salting
    is a pure execution-strategy change, invisible in the result. (Spark's
    own partial aggregation covers this when upstream partitioning is
    random; explicit salting is the tool when inputs arrive pre-clustered
    by the hot key, e.g. reading a table sorted by the group column.)"""
    li = load_tables(spark, sf_dir).lineitem
    salted = li.withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey"), F.lit(16))
    )
    phase1 = salted.groupBy("l_returnflag", "l_linestatus", "salt").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
    )
    return phase1.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("n").alias("n"), F.sum("sum_qty").alias("sum_qty")
    )
