"""Remaining TPC-H query shapes, adapted to the fixture schema.

The fixtures lack ``partsupp`` and lineitem's commit/receipt/shipmode
columns, so Q2/Q12/Q20/Q21 are re-expressed over what exists (the shapes —
correlated min, delay buckets, nested semi-joins, exists/not-exists — are
preserved; the predicates are adapted). Q8/Q13/Q17/Q19 translate directly.

Scale notes per query live in the docstrings; the common themes:
dimension joins broadcast, fact scans are pruned by pushed-down date
filters, and every money/ratio output goes through the exact fixed-point
domain (parity.py) so Tier-A hashes are partition-order-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyetl_spark.parity import FXP, MSUM, R, fxp, msum, rnd
from pyetl_spark.registry import query
from pyetl_spark.tables import load_tables

_V = "l_extendedprice * (1 - l_discount)"  # volume expression (4dp grid)


@query(
    "join_market_share",
    oracle=f"""
    WITH flat AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             {FXP(_V, 10**4)} AS v_c,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders    ON l_orderkey = o_orderkey
      JOIN customer  ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN supplier  ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE cn.n_regionkey = 2
        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    )
    SELECT o_year,
           {R("CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN v_c ELSE 0 END) AS DOUBLE) / CAST(sum(v_c) AS DOUBLE)", 6)} AS mkt_share
    FROM flat
    GROUP BY o_year
    """,
)
def join_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): NATION_2 suppliers' slice
    of the region-2 (ASIA in real TPC-H; the fixtures carry synthetic
    NATION_* names and the selector is ``n_regionkey = 2``) order volume,
    by order year.

    Both the numerator and denominator are EXACT integer cent-sums, so the
    final ratio is one double division on identical bits — Tier-A safe.
    Plan: the two-year date filter prunes the orders scan; the nation
    joins broadcast explicitly (25 rows at any SF). customer- and
    supplier-derived sides scale with SF (~150k/~10k rows per SF unit),
    so they carry NO forced broadcast hint — autoBroadcastJoinThreshold /
    AQE picks broadcast while they fit and falls back to shuffle join
    beyond, instead of OOMing on a forced hint. The only unconditional
    big shuffle is lineitem⋈orders on orderkey, then a 2-row aggregate.
    At 100 TB the fact⋈fact join would be bucketed on orderkey
    (layouts.py); nothing else changes."""
    t = load_tables(spark, sf_dir)
    cust_asia = (
        t.customer.join(
            F.broadcast(t.nation.filter(F.col("n_regionkey") == 2)),
            F.col("c_nationkey") == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp_nat = (
        t.supplier.join(
            F.broadcast(t.nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    o = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    flat = (
        t.lineitem.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_asia, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_nat, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            fxp(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10**4).alias("v_c"),
            "supp_nation",
        )
    )
    num = F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("v_c")).otherwise(F.lit(0)))
    return flat.groupBy("o_year").agg(
        rnd(num.cast("double") / F.sum("v_c").cast("double"), 6).alias("mkt_share")
    )


@query(
    "join_cust_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    """,
)
def join_cust_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): how many
    customers placed exactly N non-low-priority orders, zero included.

    The LEFT join keeps order-less customers (count(o_orderkey) counts
    only matched rows — COUNT's null-skipping does the work). Plan: one
    shuffle on custkey for the join+first aggregate (Spark fuses them via
    partial aggregation), then a tiny second aggregate over ≤ max-orders
    distinct counts. Skew-safe at scale: the first groupBy key is the
    customer key (high cardinality), not the count."""
    t = load_tables(spark, sf_dir)
    o = t.orders.filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        t.customer.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "subq_small_qty_revenue",
    oracle=f"""
    WITH brand_parts AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'
    ), per_part AS (
      SELECT l_partkey,
             sum({FXP('l_quantity', 1)}) AS sum_q,
             count(*) AS cnt
      FROM lineitem JOIN brand_parts ON l_partkey = p_partkey
      GROUP BY l_partkey
    )
    SELECT count(*) AS n_lines,
           {R(f"CAST(sum({FXP('l_extendedprice', 100)}) AS DOUBLE) / 100.0 / 7.0", 2)} AS avg_yearly
    FROM lineitem
    JOIN per_part ON lineitem.l_partkey = per_part.l_partkey
    WHERE 5 * {FXP('l_quantity', 1)} * cnt < sum_q
    """,
)
def subq_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17): yearly revenue lost if
    small orders (below 20% of the part's average quantity) were dropped,
    for one brand.

    The 0.2·avg threshold is evaluated ENTIRELY in integers:
    ``5·qty·cnt < sum_qty`` avoids the float average — tie rows land on
    the same side in both engines. Plan: the brand filter prunes part to
    ~1/25 of partkeys; the per-part aggregate over the semi-joined
    lineitem is brand-bounded and broadcasts back onto the fact scan, so
    lineitem shuffles ONCE (for the per-part agg) and the correlated
    comparison itself is a broadcast hash join, not a second shuffle."""
    t = load_tables(spark, sf_dir)
    brand_parts = t.part.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    li_brand = t.lineitem.join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    per_part = li_brand.groupBy("l_partkey").agg(
        F.sum(fxp(F.col("l_quantity"), 1)).alias("sum_q"),
        F.count(F.lit(1)).alias("cnt"),
    )
    qualified = li_brand.drop("p_partkey").join(
        F.broadcast(per_part.withColumnRenamed("l_partkey", "pp_key")),
        F.col("l_partkey") == F.col("pp_key"),
    ).filter(F.lit(5) * fxp(F.col("l_quantity"), 1) * F.col("cnt") < F.col("sum_q"))
    return qualified.agg(
        F.count(F.lit(1)).alias("n_lines"),
        rnd(
            F.sum(fxp(F.col("l_extendedprice"), 100)).cast("double") / 100.0 / 7.0, 2
        ).alias("avg_yearly"),
    )


@query(
    "join_disjunctive_pred",
    oracle=f"""
    SELECT count(*) AS n_lines, {MSUM(_V, 10**4)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def join_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue under a disjunctive predicate (TPC-H Q19 shape):
    three brand/size/quantity conjunctions OR-ed together.

    The OR can't be pushed into either scan whole, but Catalyst extracts
    the common equi-key (partkey) for the join and derives per-side
    filters from the disjunction (brand∈{...} on part, quantity ranges on
    lineitem), so both scans still prune. part is dimension-sized →
    broadcast; the residual OR evaluates inside the joined codegen stage.
    One-row output in the exact-cents domain."""
    t = load_tables(spark, sf_dir)
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#3") & s.between(1, 15) & q.between(20, 30))
    )
    joined = t.lineitem.join(
        F.broadcast(t.part), F.col("p_partkey") == F.col("l_partkey")
    ).filter(cond)
    return joined.agg(
        F.count(F.lit(1)).alias("n_lines"),
        msum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10**4).alias("revenue"),
    )


@query(
    "subq_cheapest_supplier",
    oracle=f"""
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             {FXP('l_extendedprice / l_quantity', 100)} AS up_c
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_size = 15 AND p_type = 'SMALL'
    ), best AS (
      SELECT l_partkey AS bp, min(up_c) AS min_up FROM unit GROUP BY l_partkey
    )
    SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name,
           CAST(min_up AS DOUBLE) / 100.0 AS unit_price
    FROM unit
    JOIN best     ON l_partkey = bp AND up_c = min_up
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    """,
)
def subq_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest supplier per part (TPC-H Q2 shape, adapted: no partsupp
    table, so the observed unit price l_extendedprice/l_quantity from
    lineitem stands in for ps_supplycost).

    The correlated MIN is taken over fixed-point integers (the division is
    the same IEEE op on identical bits in both engines, then one rounding
    to cents), so min-tie membership is deterministic; DISTINCT collapses
    repeat (part, supplier) pairs at the same best price. Plan: the
    size/type filter prunes part to ~1/150 before anything touches
    lineitem; the per-part min is tiny and broadcasts back — lineitem
    shuffles once on partkey for the min, the verify join is broadcast."""
    t = load_tables(spark, sf_dir)
    parts = t.part.filter((F.col("p_size") == 15) & (F.col("p_type") == "SMALL"))
    unit = (
        t.lineitem.join(
            F.broadcast(parts.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "l_partkey",
            "l_suppkey",
            fxp(F.col("l_extendedprice") / F.col("l_quantity"), 100).alias("up_c"),
        )
    )
    best = unit.groupBy(F.col("l_partkey").alias("bp")).agg(
        F.min("up_c").alias("min_up")
    )
    return (
        unit.join(
            F.broadcast(best),
            (F.col("l_partkey") == F.col("bp")) & (F.col("up_c") == F.col("min_up")),
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            (F.col("min_up").cast("double") / 100.0).alias("unit_price"),
        )
        .distinct()
    )


@query(
    "agg_ship_delay_buckets",
    oracle="""
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) < 30 THEN 'fast'
                WHEN date_diff('day', o_orderdate, l_shipdate) < 60 THEN 'medium'
                ELSE 'slow' END AS delay_bucket,
           count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS high_line_count,
           count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY delay_bucket
    """,
)
def agg_ship_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-delay service levels (TPC-H Q12 shape, adapted: no
    shipmode/commitdate columns, so lines bucket by order→ship delay).

    Day arithmetic is calendar-boundary counting in both engines
    (Spark ``datediff`` = date(end)−date(start); DuckDB
    ``date_diff('day',...)`` likewise), so bucket membership is exact.
    Plan: the one-year shipdate filter prunes the lineitem scan before
    the orderkey shuffle join; output is a 3-row conditional aggregate
    with map-side partials. At 100 TB this is the bucketed-join poster
    child (both sides clustered on orderkey)."""
    t = load_tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    d = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.when(d < 30, "fast").when(d < 60, "medium").otherwise("slow").alias("delay_bucket"),
            high.alias("is_high"),
        )
        .groupBy("delay_bucket")
        .agg(
            F.count_if(F.col("is_high")).alias("high_line_count"),
            F.count_if(~F.col("is_high")).alias("low_line_count"),
        )
    )


@query(
    "subq_excess_shipments",
    oracle=f"""
    WITH widget_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'
    ), shipped AS (
      SELECT l_suppkey, sum({FXP('l_quantity', 1)}) AS qty
      FROM lineitem JOIN widget_parts ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM shipped WHERE qty > 300)
    """,
)
def subq_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-volume widget suppliers (TPC-H Q20 shape, adapted: shipped
    quantity from lineitem stands in for partsupp availability).

    The nested IN-chain (supplier ← qualifying shipments ← widget parts)
    compiles to semi-joins end to end — no row multiplication anywhere.
    Quantities sum as exact integers so the >300 cut is deterministic.
    Plan: part prunes on the LIKE first (dimension scan), broadcasts into
    lineitem (date-pruned), one shuffle for the per-supplier sum, and the
    final semi-join broadcasts the small qualifying set into supplier."""
    t = load_tables(spark, sf_dir)
    widget = t.part.filter(F.col("p_name").like("%widget%")).select("p_partkey")
    shipped = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(widget), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(fxp(F.col("l_quantity"), 1)).alias("qty"))
        .filter(F.col("qty") > 300)
    )
    return t.supplier.join(
        F.broadcast(shipped), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


@query(
    "join_waiting_orders",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l_orderkey AS pk, l_suppkey AS ps FROM lineitem
    ), late_pairs AS (
      SELECT DISTINCT l_orderkey AS lk, l_suppkey AS ls
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    SELECT s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN orders   ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
    JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM pairs
                  WHERE pk = l1.l_orderkey AND ps <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late_pairs
                      WHERE lk = l1.l_orderkey AND ls <> l1.l_suppkey)
    GROUP BY s_name
    """,
)
def join_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape, adapted: "late"
    means shipped >60 days after the order date — the fixtures carry no
    commit/receipt dates).

    The EXISTS/NOT-EXISTS pair ("another supplier exists on the order" /
    "no OTHER supplier was late") becomes a left-semi and a left-anti join
    on orderkey with a suppkey-inequality residual. Late-line counts per
    supplier are exact integers. Plan: all three lineitem derivations
    prune/distinct before joining; everything keys on orderkey so at
    100 TB one bucketing serves every hop; supplier broadcasts."""
    t = load_tables(spark, sf_dir)
    li, o = t.lineitem, t.orders
    late = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    )
    l1 = (
        late.filter(F.col("o_orderstatus") == "F")
        .select("l_orderkey", "l_suppkey")
    )
    pairs = li.select(
        F.col("l_orderkey").alias("pk"), F.col("l_suppkey").alias("ps")
    ).distinct()
    late_pairs = late.select(
        F.col("l_orderkey").alias("lk"), F.col("l_suppkey").alias("ls")
    ).distinct()
    qualified = (
        l1.join(
            pairs,
            (F.col("l_orderkey") == F.col("pk")) & (F.col("l_suppkey") != F.col("ps")),
            "left_semi",
        )
        .join(
            late_pairs,
            (F.col("l_orderkey") == F.col("lk")) & (F.col("l_suppkey") != F.col("ls")),
            "left_anti",
        )
    )
    return (
        qualified.join(
            F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


_Q5_FXP = FXP("l_extendedprice * (1 - l_discount)", 10**4)

@query(
    "join_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {R(f"CAST(sum({_Q5_FXP}) AS DOUBLE) / 10000.0", 2)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def join_local_supplier_volume(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Local supplier volume (TPC-H Q5): revenue from lineitems where the
    CUSTOMER and the SUPPLIER sit in the same nation, one region + one
    year, grouped by nation — the classic 6-table join with a non-FK
    equality (c_nationkey = s_nationkey) folded into the supplier join.

    Plan: lineitem⋈orders⋈customer shuffle on the two fact keys;
    supplier/nation/region broadcast; the year predicate pushes to the
    orders scan and the region predicate prunes the broadcast dims before
    they ship. Exact fixed-point revenue. At 100 TB: co-bucket
    orders/lineitem on orderkey and the only remaining exchange is the
    customer join."""
    t = load_tables(spark, sf_dir)
    y0 = F.lit("1996-01-01").cast("timestamp")
    y1 = F.lit("1997-01-01").cast("timestamp")
    asia = (
        t.nation.join(
            F.broadcast(t.region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == "ASIA")
        .select("n_nationkey", "n_name")
    )
    supp = t.supplier.join(
        F.broadcast(asia), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    return (
        t.orders.filter(
            (F.col("o_orderdate") >= y0) & (F.col("o_orderdate") < y1)
        )
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            rnd(
                F.sum(
                    fxp(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount")),
                        10**4,
                    )
                ).cast("double")
                / F.lit(10000.0),
                2,
            ).alias("revenue")
        )
    )


@query(
    "join_volume_shipping_pairs",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {R(f"CAST(sum(vol) AS DOUBLE) / 10000.0", 2)} AS revenue
    FROM (
      SELECT sn.n_name AS supp_nation,
             cn.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
             {_Q5_FXP} AS vol
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
         OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def join_volume_shipping_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Volume shipping between a nation pair (TPC-H Q7): bilateral trade
    revenue NATION_1↔NATION_2 by supplier-nation / customer-nation /
    ship-year. The disjunctive pair predicate stays on the two broadcast
    nation dims (each aliased once per role), so the fact-side plan is
    the same lineitem⋈orders⋈customer shuffle as Q5 with supplier
    broadcast — no disjunctive join condition ever reaches a shuffle key.
    Exact fixed-point revenue; year from l_shipdate on both engines."""
    t = load_tables(spark, sf_dir)
    sn = t.nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = t.nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1")
        & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2")
        & (F.col("cust_nation") == "NATION_1")
    )
    return (
        t.lineitem.join(
            F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            fxp(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10**4
            ).alias("vol"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            rnd(F.sum("vol").cast("double") / F.lit(10000.0), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "agg_forecast_revenue",
    oracle=f"""
    SELECT {MSUM("l_extendedprice * l_discount", 10**4)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND {FXP("l_discount", 100)} BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def agg_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting-revenue-change (TPC-H Q6): would-be extra revenue if
    small-quantity, mid-discount line items had shipped at full price —
    one filtered scan, one global sum, no join.

    The discount band predicate compares on the 2dp *integer* grid
    (``fxp(l_discount,100) BETWEEN 5 AND 7``) rather than
    ``BETWEEN 0.05 AND 0.07`` on raw doubles — both engines floor the
    same IEEE-754 product so the band edges cannot straddle a binary
    representation difference. Revenue is the exact integer cent-sum
    (order-free across partitions) descaled once.

    Plan: all three predicates push to the parquet scan (shipdate range +
    quantity are native column filters; the discount-grid expression
    evaluates post-scan but inside the same WholeStageCodegen), then a
    partial/final global agg — the cheapest possible TPC-H query, and the
    canonical 100 TB scan-throughput probe: at scale it is purely
    IO-bound and prunes to the one shipdate year via partition layout."""
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & fxp(F.col("l_discount"), 100).between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            msum(
                F.col("l_extendedprice") * F.col("l_discount"), 10**4
            ).alias("revenue")
        )
    )


@query(
    "join_product_type_profit",
    oracle=f"""
    SELECT nation, o_year,
           {R("CAST(sum(amount_c) AS DOUBLE) / 10000.0", 2)} AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             {FXP("l_extendedprice * (1 - l_discount)", 10**4)}
               - CAST(l_quantity AS BIGINT) * {FXP("0.6 * p_retailprice", 10**4)}
               AS amount_c
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey AND p_name LIKE '%red%'
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
    )
    GROUP BY nation, o_year
    """,
)
def join_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H Q9 shape): per supplier-nation,
    per order-year profit on 'red' parts. The fixtures carry no
    ``partsupp``/``ps_supplycost``, so unit cost is the deterministic
    proxy ``0.6 * p_retailprice`` — the join/agg shape (5-way star on the
    fact, name-LIKE part filter, nation×year rollup) is Q9's.

    Exactness: profit per line = revenue(4dp grid) − qty × cost(4dp
    grid); both terms are fixed-point BIGINTs, quantity is an exact
    integer, so the per-line amount and its sum are order-free integers —
    one descale+round after the final aggregate.

    Plan: the part filter prunes before its join; nation broadcasts (25
    rows); part/supplier carry no forced hint (they scale with SF —
    AQE broadcasts while small, shuffles beyond instead of OOMing). The
    unconditional shuffles are lineitem⋈orders on orderkey plus the
    25×7-group aggregate. At 100 TB: bucket lineitem+orders on orderkey,
    everything else is dimension-side."""
    t = load_tables(spark, sf_dir)
    part_red = (
        t.part.filter(F.col("p_name").like("%red%"))
        .select(
            "p_partkey",
            fxp(F.lit(0.6) * F.col("p_retailprice"), 10**4).alias("cost_c"),
        )
    )
    amount_c = fxp(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10**4
    ) - F.col("l_quantity").cast("long") * F.col("cost_c")
    return (
        t.lineitem.join(part_red, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            t.supplier.select("s_suppkey", "s_nationkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            t.orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount_c.alias("amount_c"),
        )
        .groupBy("nation", "o_year")
        .agg(
            rnd(F.sum("amount_c").cast("double") / F.lit(10000.0), 2).alias(
                "sum_profit"
            )
        )
    )


@query(
    "agg_important_stock",
    oracle=f"""
    WITH v AS (
      SELECT l_partkey,
             {FXP("l_extendedprice * (1 - l_discount)", 10**4)} AS v_c
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
    ), per AS (
      SELECT l_partkey, sum(v_c) AS part_c FROM v GROUP BY l_partkey
    ), tot AS (
      SELECT sum(part_c) AS total_c, count(*) AS nparts FROM per
    )
    SELECT l_partkey,
           {R("CAST(part_c AS DOUBLE) / 10000.0", 2)} AS part_value
    FROM per, tot
    WHERE part_c * nparts > 2 * total_c
    """,
)
def agg_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock identification (TPC-H Q11 shape): parts whose
    supplied value from NATION_7 suppliers exceeds a global threshold —
    the group-by-then-HAVING-vs-scalar-subquery shape. No ``partsupp``
    in the fixtures, so "stock value" is the supplied line revenue per
    part; the threshold is 2× the mean part value (``part_c * nparts >
    2 * total_c``), which keeps selectivity SF-invariant (~7-8% of parts
    at sf0.01 and sf0.1) where TPC-H's fixed 0.0001 fraction would decay
    to zero rows as SF grows.

    Exactness: the HAVING compare is pure BIGINT arithmetic (integer
    cent-sum × integer count vs integer total) — no float threshold can
    straddle engines. Plan: one shuffle groups by partkey; the global
    (total, count) scalar is a 16-byte broadcast joined back crossJoin-
    style, NOT a re-aggregation of the base — Spark materializes ``per``
    once for both consumers. At 100 TB the per-part aggregate is the only
    fact-sized shuffle; the scalar side is constant."""
    t = load_tables(spark, sf_dir)
    nat = t.nation.filter(F.col("n_name") == "NATION_7")
    supp7 = (
        t.supplier.join(
            F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
        ).select("s_suppkey")
    )
    per = (
        t.lineitem.join(supp7, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_partkey",
            fxp(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10**4
            ).alias("v_c"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("v_c").alias("part_c"))
        .localCheckpoint(eager=False)
    )
    tot = per.agg(
        F.sum("part_c").alias("total_c"), F.count(F.lit(1)).alias("nparts")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        # decimal(38,0) product: at 100 TB part_c×nparts can exceed
        # int64 (DuckDB auto-promotes to HUGEINT; Spark ANSI would
        # throw) — decimal128 keeps the compare exact at any scale
        .filter(
            F.col("part_c").cast("decimal(38,0)") * F.col("nparts")
            > F.lit(2) * F.col("total_c").cast("decimal(38,0)")
        )
        .select(
            "l_partkey",
            rnd(F.col("part_c").cast("double") / F.lit(10000.0), 2).alias(
                "part_value"
            ),
        )
    )
