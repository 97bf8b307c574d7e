"""Surface-completion queries beyond SURVEY §2's explicit inventory:
unpivot/melt, ordered string aggregation, range source, null semantics,
struct operations. All Tier A (oracle-matched)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyetl_spark.parity import R, fxp, rnd
from pyetl_spark.registry import query
from pyetl_spark.tables import load_tables


@query(
    "etl_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, round_val
    FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
             l_quantity AS round_val
      FROM lineitem WHERE l_orderkey < 500
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount
      FROM lineitem WHERE l_orderkey < 500
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'tax', l_tax
      FROM lineitem WHERE l_orderkey < 500
    )
    """,
)
def etl_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot/melt (ETL reshaping). Spark's native unpivot
    compiles to an Expand node — one pass, rows×metrics output, no join;
    the oracle spells it as the equivalent UNION ALL."""
    li = load_tables(spark, sf_dir).lineitem
    return (
        li.filter(F.col("l_orderkey") < 500)
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_discount", "l_tax"],
            "metric",
            "round_val",
        )
        .withColumn(
            "metric", F.regexp_replace(F.col("metric"), "^l_", "")
        )
    )


@query(
    "agg_string_concat",
    oracle="""
    SELECT o_custkey,
           string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
           count(*) AS n
    FROM orders
    WHERE o_custkey < 100
    GROUP BY o_custkey
    """,
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg): sorted collect_list joined
    with a separator ≡ DuckDB string_agg(... ORDER BY) — sort pinned on
    both sides for hash stability."""
    o = load_tables(spark, sf_dir).orders
    return (
        o.filter(F.col("o_custkey") < 100)
        .groupBy("o_custkey")
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_list("o_orderstatus"))
            ).alias("statuses"),
            F.count("*").alias("n"),
        )
    )


@query(
    "source_range",
    oracle=f"""
    SELECT CAST(range AS BIGINT) AS id,
           CAST(range AS BIGINT) * 3 % 7 AS scrambled,
           {R('sqrt(CAST(range AS BIGINT))', 4)} AS root
    FROM range(1000)
    """,
)
def source_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated-sequence source (spark.range): the zero-IO table
    generator — planning/codegen sanity and synthetic-data entry point."""
    return spark.range(1000).select(
        F.col("id"),
        (F.col("id") * 3 % 7).alias("scrambled"),
        rnd(F.sqrt("id"), 4).alias("root"),
    )


@query(
    "fn_null_semantics",
    oracle="""
    SELECT c_custkey, o_orderkey,
           (o_totalprice IS NULL) AS price_is_null,
           (o_totalprice IS NOT DISTINCT FROM NULL) AS null_safe_eq_null,
           o_totalprice + 1 IS NULL AS null_arith,
           coalesce(o_orderpriority, 'NONE') AS prio_or_none,
           CASE WHEN o_orderkey IS NULL THEN 0 ELSE 1 END AS has_order
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 460000
    """,
)
def fn_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic checkbox over real nulls (outer-join produced):
    IS NULL, null-safe equality (Spark `<=>` ≡ DuckDB IS NOT DISTINCT
    FROM), null propagation through arithmetic, coalesce defaulting."""
    t = load_tables(spark, sf_dir)
    customer, orders = t.customer, t.orders
    cond = (customer.c_custkey == orders.o_custkey) & (
        orders.o_totalprice > 460000
    )
    return customer.join(orders, cond, "left").select(
        "c_custkey",
        "o_orderkey",
        F.col("o_totalprice").isNull().alias("price_is_null"),
        F.col("o_totalprice").eqNullSafe(F.lit(None).cast("double")).alias(
            "null_safe_eq_null"
        ),
        (F.col("o_totalprice") + 1).isNull().alias("null_arith"),
        F.coalesce("o_orderpriority", F.lit("NONE")).alias("prio_or_none"),
        F.when(F.col("o_orderkey").isNull(), 0).otherwise(1).alias(
            "has_order"
        ),
    )


@query(
    "fn_struct",
    oracle="""
    SELECT o_orderkey,
           (struct_pack(s := o_orderstatus, p := o_orderpriority)).s
             AS status_field,
           (struct_pack(s := o_orderstatus, p := o_orderpriority)
             = struct_pack(s := 'F', p := '1-URGENT')) AS is_urgent_final,
           (struct_pack(a := o_totalprice, k := o_orderkey)
             > struct_pack(a := 300000.0, k := CAST(0 AS BIGINT)))
             AS above_struct_cmp
    FROM orders
    WHERE o_orderkey < 3000
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct create/access/compare (nested-type checkbox): named_struct
    field extraction and lexicographic struct comparison — outputs kept
    flat (bool/string) so cross-engine row encoding stays trivial."""
    o = load_tables(spark, sf_dir).orders
    sp = F.struct(
        F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")
    )
    target = F.struct(F.lit("F").alias("s"), F.lit("1-URGENT").alias("p"))
    price_key = F.struct(
        F.col("o_totalprice").alias("a"), F.col("o_orderkey").alias("k")
    )
    threshold = F.struct(
        F.lit(300000.0).alias("a"), F.lit(0).cast("long").alias("k")
    )
    return o.filter(F.col("o_orderkey") < 3000).select(
        "o_orderkey",
        sp.getField("s").alias("status_field"),
        (sp == target).alias("is_urgent_final"),
        (price_key > threshold).alias("above_struct_cmp"),
    )


@query(
    "win_locf",
    oracle="""
    SELECT event_id, user_id, event_type,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS last_purchase_value
    FROM events
    """,
)
def win_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: each event sees the most recent
    PRIOR purchase value for its user (IGNORE NULLS over a trailing frame)
    — the classic time-series gap-fill, and the windowed sibling of the
    as-of join."""
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    purchase_val = F.when(
        F.col("event_type") == "purchase", F.col("value")
    )
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.last(purchase_val, ignorenulls=True)
        .over(w)
        .alias("last_purchase_value"),
    )


@query(
    "agg_mode",
    oracle="""
    WITH counted AS (
      SELECT user_id, event_type, count(*) AS c
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           max(struct_pack(c := c, t := event_type))['t'] AS modal_type,
           max(struct_pack(c := c, t := event_type))['c'] AS modal_count
    FROM counted
    GROUP BY user_id
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode (most frequent event_type per user): count +
    struct-argmax with the value itself as tiebreak — built-in mode()'s
    tie behavior is unspecified on both engines, so it's banned for
    hash-matching (SURVEY §5.3 spirit) and rebuilt deterministically."""
    ev = load_tables(spark, sf_dir).events
    counted = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("c")
    )
    pair = F.struct(F.col("c").alias("c"), F.col("event_type").alias("t"))
    return counted.groupBy("user_id").agg(
        F.max(pair)["t"].alias("modal_type"),
        F.max(pair)["c"].alias("modal_count"),
    )


@query(
    "fn_try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE l_extendedprice / l_discount END AS price_per_disc,
           CASE WHEN l_quantity = 0 THEN NULL
                ELSE CAST(floor(l_extendedprice) AS BIGINT)
                     // CAST(floor(l_quantity) AS BIGINT)
           END AS int_div,
           l_extendedprice / nullif(l_tax, 0) AS price_per_tax
    FROM lineitem
    WHERE l_linenumber = 1 AND l_orderkey < 2000
    """,
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe arithmetic under ANSI semantics: try_divide and
    nullif-guarded division return NULL instead of erroring on zero
    denominators (Spark 4 runs ANSI mode by default — unguarded division
    by zero would kill the job; the oracle guards with CASE/nullif)."""
    li = load_tables(spark, sf_dir).lineitem
    # floor before the integer cast: bare double→BIGINT casts TRUNCATE in
    # Spark but ROUND in DuckDB — floor() pins both to the same integer
    iq = F.floor("l_quantity").cast("long")
    return li.filter(
        (F.col("l_linenumber") == 1) & (F.col("l_orderkey") < 2000)
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "price_per_disc"
        ),
        # exact integer division (DIV), not floor(double/) — double
        # quotients of large longs can floor across the wrong boundary
        F.when(iq == 0, None)
        .otherwise(F.expr(
            "CAST(floor(l_extendedprice) AS BIGINT)"
            " DIV CAST(floor(l_quantity) AS BIGINT)"
        ))
        .alias("int_div"),
        (
            F.col("l_extendedprice") / F.nullif(F.col("l_tax"), F.lit(0.0))
        ).alias("price_per_tax"),
    )


@query(
    "fn_interval",
    oracle="""
    SELECT event_id, ts,
           ts + INTERVAL 90 MINUTE AS plus_90m,
           ts - INTERVAL 2 HOUR   AS minus_2h,
           ts + INTERVAL 3 DAY    AS plus_3d,
           CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start,
           CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 12 HOUR
             AS noon_of_day
    FROM events
    WHERE event_id < 2000
    """,
)
def fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic family: timestamp ± minute/hour/day intervals,
    ISO week truncation (Monday-start on both engines), composed
    truncate+shift. months_between stays banned (SURVEY §5.3 — engine
    semantics differ)."""
    ev = load_tables(spark, sf_dir).events
    ts = F.col("ts")
    return ev.filter(F.col("event_id") < 2000).select(
        "event_id",
        "ts",
        (ts + F.expr("INTERVAL 90 MINUTE")).alias("plus_90m"),
        (ts - F.expr("INTERVAL 2 HOUR")).alias("minus_2h"),
        (ts + F.expr("INTERVAL 3 DAY")).alias("plus_3d"),
        F.date_trunc("week", ts).alias("week_start"),
        (F.date_trunc("day", ts) + F.expr("INTERVAL 12 HOUR")).alias(
            "noon_of_day"
        ),
    )


@query(
    "fn_array_outer",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x = 'database')
               AS hits
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           unnest(CASE WHEN len(hits) = 0 THEN [NULL] ELSE hits END) AS hit
    FROM t
    """,
)
def fn_array_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer semantics: docs with zero matching tokens still emit
    one NULL row (a plain explode/unnest drops them). The oracle emulates
    outer-explode by substituting [NULL] for empty lists — the exact
    definition of the operator."""
    d = load_tables(spark, sf_dir).documents
    hits = F.filter(
        F.split("text", " "), lambda x: x == F.lit("database")
    )
    return d.filter(F.col("doc_id") < 100).select(
        "doc_id", F.explode_outer(hits).alias("hit")
    )


@query(
    "fn_pipe_syntax",
    oracle="""
    SELECT o_orderpriority,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(sign(o_totalprice) * floor(abs(o_totalprice) * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority, o_year
    """,
)
def fn_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4's ``|>`` operator chain, from the
    Google 'Pipe Syntax in SQL' paper): the same filter → derive →
    aggregate flow a DataFrame chain expresses, written as piped SQL and
    proven equivalent to the standard GROUP BY oracle. Each ``|>`` stage
    maps 1:1 onto a logical operator, so Catalyst produces the identical
    plan as the orthodox spelling — pinned here so the dialect surface
    stays covered. Exact integer cents; one scan, one partial/final
    aggregate."""
    t = load_tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("pyetl_pipe_orders")
    return spark.sql(
        """
        FROM pyetl_pipe_orders
        |> WHERE o_orderstatus = 'F'
        |> EXTEND CAST(year(o_orderdate) AS INT) AS o_year,
                  CAST(sign(o_totalprice) * floor(abs(o_totalprice) * 100.0 + 0.5) AS BIGINT) AS cents
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n_orders,
                     CAST(sum(cents) AS BIGINT) AS revenue_cents
           GROUP BY o_orderpriority, o_year
        |> SELECT o_orderpriority, o_year, n_orders, revenue_cents
        """
    )


@query(
    "fn_sql_udf",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(sign(l_extendedprice * (1.0 - l_discount))
                    * floor(abs(l_extendedprice * (1.0 - l_discount)) * 10000.0 + 0.5)
                    AS BIGINT)) AS BIGINT) AS disc_fx,
           CAST(sum(CAST(sign(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax))
                    * floor(abs(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)) * 1000000.0 + 0.5)
                    AS BIGINT)) AS BIGINT) AS charge_fx
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def fn_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative SQL UDFs (Spark 4 `CREATE FUNCTION ... RETURNS ... RETURN
    expr`) — the reference's reusable-expression surface without ever
    leaving the JVM. Two functions are defined, one CALLING the other
    (pyetl_charge → pyetl_disc_price), and used inside an aggregate.

    Why this matters at 100 TB: unlike a Python UDF (per-row serialization)
    or even a Pandas UDF (Arrow batch hop), a SQL UDF is INLINED by the
    analyzer — the physical plan contains only the expanded arithmetic
    expression inside WholeStageCodegen, with constant folding applied
    through the function body (verified: `disc_price(p, 0.1)` folds to
    `p * 0.9` in the plan). Zero call overhead, full codegen, and the
    optimizer sees through the abstraction for pushdown. The oracle inlines
    the same arithmetic by hand; money sums go through the repo's
    fixed-point convention (4dp grid for price×(1-disc), 6dp with tax)."""
    t = load_tables(spark, sf_dir)
    t.lineitem.createOrReplaceTempView("pyetl_udf_li")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION pyetl_disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION pyetl_charge(p DOUBLE, d DOUBLE, t DOUBLE) "
        "RETURNS DOUBLE RETURN pyetl_disc_price(p, d) * (1.0 + t)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(sign(pyetl_disc_price(l_extendedprice, l_discount))
                        * floor(abs(pyetl_disc_price(l_extendedprice, l_discount)) * 10000.0 + 0.5)
                        AS BIGINT)) AS BIGINT) AS disc_fx,
               CAST(sum(CAST(sign(pyetl_charge(l_extendedprice, l_discount, l_tax))
                        * floor(abs(pyetl_charge(l_extendedprice, l_discount, l_tax)) * 1000000.0 + 0.5)
                        AS BIGINT)) AS BIGINT) AS charge_fx
        FROM pyetl_udf_li
        GROUP BY l_returnflag
        """
    )


@query(
    "fn_collation",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN o_orderkey % 2 = 0 THEN lower(o_orderpriority)
                  ELSE upper(o_orderpriority) END AS prio_mixed,
             o_totalprice
      FROM orders
    )
    SELECT lower(prio_mixed) AS prio,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(sign(o_totalprice) * floor(abs(o_totalprice) * 100.0 + 0.5)
                    AS BIGINT)) AS BIGINT) AS cents
    FROM mixed
    GROUP BY prio
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collated string semantics (Spark 4 collation support): a
    case-scrambled priority column is grouped under `UTF8_LCASE`, so
    '1-urgent' and '1-URGENT' land in ONE group with no expression-level
    normalization in the aggregation key — the collation IS the equality.

    Correctness subtlety the key pins: the representative value of a
    collated group is whichever variant a partition saw first —
    NONDETERMINISTIC across runs — so the output canonicalizes via
    lower() AFTER the collated grouping; the oracle groups by lower()
    directly, which is the same partition function by definition.

    Scale: collation comparisons use ICU sort keys inside the JVM hash —
    still a plain one-shuffle partial/final aggregate; no UDF, no second
    pass. (Case-insensitive joins get the same property: collate the key
    once instead of wrapping every probe in lower().)"""
    o = load_tables(spark, sf_dir).orders
    mixed = o.select(
        F.when(
            F.col("o_orderkey") % 2 == 0, F.lower("o_orderpriority")
        )
        .otherwise(F.upper("o_orderpriority"))
        .cast("string collate UTF8_LCASE")
        .alias("prio_mixed"),
        "o_totalprice",
    )
    return (
        mixed.groupBy("prio_mixed")
        .agg(
            F.count("*").alias("n"),
            F.sum(fxp(F.col("o_totalprice"), 100)).alias("cents"),
        )
        .select(
            F.lower("prio_mixed").cast("string").alias("prio"), "n", "cents"
        )
    )


@query(
    "fn_sql_params",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(max(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    WHERE o_totalprice >= 150000.0
      AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def fn_sql_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 `spark.sql(query, args=...)`): values
    bind as TYPED literals through `:name` markers and the table name
    binds through the `IDENTIFIER(:t)` clause — the injection-safe way to
    template queries (string-concatenated SQL is the anti-pattern this
    API retires). The oracle is the same query with literals inlined,
    proving parameter binding changes nothing semantically.

    Scale: parameters are resolved before optimization, so constant
    folding and parquet pushdown see the literal values — identical plan
    to the inlined spelling (the `>=` reaches PushedFilters)."""
    t = load_tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("pyetl_param_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(max(o_orderkey) AS BIGINT) AS max_key
        FROM IDENTIFIER(:tbl)
        WHERE o_totalprice >= :min_price AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={
            "tbl": "pyetl_param_orders",
            "min_price": 150000.0,
            "status": "O",
        },
    )


@query(
    "fn_sql_scripting",
    oracle="""
    WITH t AS (
      SELECT o_orderpriority, o_orderkey,
             CAST(sign(o_totalprice) * floor(abs(o_totalprice) * 100.0 + 0.5)
                  AS BIGINT) AS cents
      FROM orders
    ), thr AS (
      SELECT CAST(sum(cents) AS DOUBLE) / count(*) AS v FROM t
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_above,
           CAST(max(o_orderkey) AS BIGINT) AS max_key
    FROM t, thr
    WHERE cents > v
    GROUP BY o_orderpriority
    """,
)
def fn_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 `BEGIN … END` procedural blocks): DECLARE a
    variable, SET it from one query, use it in the next — the multi-step
    stored-procedure idiom compiled onto the SAME engine (each statement
    is an ordinary Catalyst plan; the script is control flow around them,
    not a second execution path). The oracle collapses the two steps into
    one statement with a scalar subquery, proving the scripted flow
    changes nothing semantically.

    Determinism note: the threshold is mean PRICE-IN-CENTS — an exact
    integer sum divided by an integer count, so both engines derive the
    same double and the > comparison cannot flip on summation order (a
    naive avg(double) threshold would be order-dependent on both sides).

    Scale: the SET runs one aggregate job, the final SELECT another —
    same two jobs a driver-side two-step DataFrame program would run; the
    scalar lives in the session, not in a broadcast of data."""
    t = load_tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("pyetl_script_orders")
    prev = spark.conf.get("spark.sql.scripting.enabled")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        # Forced eagerly (result is ≤5 priority rows) so the conf can be
        # restored without racing the script's lazy tail — sweep-order
        # independence is part of the gating contract (ADVICE r4).
        return spark.sql(
            """
            BEGIN
              DECLARE thr DOUBLE DEFAULT 0.0;
              SET thr = (
                SELECT CAST(sum(CAST(sign(o_totalprice) * floor(abs(o_totalprice) * 100.0 + 0.5)
                                  AS BIGINT)) AS DOUBLE) / count(*)
                FROM pyetl_script_orders
              );
              SELECT o_orderpriority,
                     CAST(count(*) AS BIGINT) AS n_above,
                     CAST(max(o_orderkey) AS BIGINT) AS max_key
              FROM pyetl_script_orders
              WHERE CAST(sign(o_totalprice) * floor(abs(o_totalprice) * 100.0 + 0.5)
                         AS BIGINT) > thr
              GROUP BY o_orderpriority;
            END
            """
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.scripting.enabled", prev)


@query(
    "agg_listagg_native",
    oracle="""
    SELECT o_custkey,
           string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
           string_agg(DISTINCT o_orderstatus, '|' ORDER BY o_orderstatus)
             AS distinct_statuses,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    WHERE o_custkey < 100
    GROUP BY o_custkey
    """,
)
def agg_listagg_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native `listagg` (SQL:2023, new in Spark 4) — the engine-level
    twin of `agg_string_concat`'s collect_list+array_sort composition.
    `WITHIN GROUP (ORDER BY ...)` makes the concatenation order part of
    the aggregate itself (without it listagg is partition-order-dependent
    and could never be hash-declared), and the DISTINCT form dedups
    before joining. Oracle: DuckDB string_agg with the same ORDER BY.

    Scale: same partial/final aggregate shape as the composition twin —
    the win is semantic (order is declared, not bolted on) and the
    standard spelling ports from other SQL:2023 engines unchanged."""
    t = load_tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("pyetl_listagg_orders")
    return spark.sql(
        """
        SELECT o_custkey,
               listagg(o_orderstatus, ',') WITHIN GROUP (ORDER BY o_orderstatus)
                 AS statuses,
               listagg(DISTINCT o_orderstatus, '|') WITHIN GROUP (ORDER BY o_orderstatus)
                 AS distinct_statuses,
               CAST(count(*) AS BIGINT) AS n
        FROM pyetl_listagg_orders
        WHERE o_custkey < 100
        GROUP BY o_custkey
        """
    )


@query(
    "fn_group_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(sign(o_totalprice) * floor(abs(o_totalprice) * 100.0 + 0.5)
                    AS BIGINT)) AS BIGINT) AS cents
    FROM orders
    GROUP BY ALL
    """,
)
def fn_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`GROUP BY ALL` — the modern SQL surface where the grouping key
    set is inferred from the non-aggregate select items (every 2020s
    engine grew this; Spark since 3.4). The SQL text is IDENTICAL on
    both engines modulo nothing — same clause, same inference rule — so
    the driver hash-match certifies that Spark's ALL-resolution picks
    exactly the two scalar columns and neither aggregate. The measure is
    an exact integer cents sum (order-free), so the key is FP-safe.

    Scale: resolves at analysis time into the ordinary partial/final
    hash aggregate — ALL is sugar, not a plan feature; there is nothing
    to regress physically (pinned by the shared plan lints)."""
    t = load_tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("pyetl_gba_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               sum(CAST(sign(o_totalprice) * floor(abs(o_totalprice) * 100.0 + 0.5)
                   AS BIGINT)) AS cents
        FROM pyetl_gba_orders
        GROUP BY ALL
        """
    )
