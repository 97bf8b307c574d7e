"""Projection / filter / ETL-hygiene operators (SURVEY.md §2.2, Tier A).

These are the reference's per-record cleanup steps (rename, drop, default,
cast, derive partition keys — SURVEY §3.1) re-expressed as declarative column
expressions so they fuse into the scan's WholeStageCodegen pipeline instead
of running row-at-a-time Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyetl_spark.parity import FXP, R, fxp, rnd
from pyetl_spark.registry import query
from pyetl_spark.tables import load_tables


@query(
    "proj_expr",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {R('l_extendedprice * (1 - l_discount)', 2)} AS revenue,
           {R('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 2)} AS charge,
           {R('l_quantity * l_extendedprice', 2)} AS gross,
           CASE WHEN l_discount > 0.05 THEN 'HI' ELSE 'LO' END AS disc_band
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
)
def proj_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns + aliases (SURVEY §2.2 `proj_expr` [S])."""
    li = load_tables(spark, sf_dir).lineitem
    return li.filter(F.col("l_linenumber") <= 2).select(
        "l_orderkey",
        "l_linenumber",
        rnd(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
            "revenue"
        ),
        rnd(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax")),
            2,
        ).alias("charge"),
        rnd(F.col("l_quantity") * F.col("l_extendedprice"), 2).alias(
            "gross"
        ),
        F.when(F.col("l_discount") > 0.05, "HI").otherwise("LO").alias(
            "disc_band"
        ),
    )


@query(
    "filter_compound",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE (o_orderstatus IN ('F', 'P') OR o_orderpriority = '1-URGENT')
      AND o_totalprice BETWEEN 100000 AND 300000
      AND NOT (o_orderpriority = '5-LOW' AND o_orderstatus = 'O')
      AND o_custkey IS NOT NULL
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT, IN-list, BETWEEN, IS NOT NULL (SURVEY §2.2
    `filter_compound` [S])."""
    o = load_tables(spark, sf_dir).orders
    return o.filter(
        (
            F.col("o_orderstatus").isin("F", "P")
            | (F.col("o_orderpriority") == "1-URGENT")
        )
        & F.col("o_totalprice").between(100000, 300000)
        & ~(
            (F.col("o_orderpriority") == "5-LOW")
            & (F.col("o_orderstatus") == "O")
        )
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@query(
    "filter_like_regex",
    oracle="""
    SELECT p_partkey, p_name, p_type, p_brand
    FROM part
    WHERE p_type LIKE '%BRASS%'
       OR regexp_matches(p_brand, '^Brand#[12][0-9]$')
    """,
)
def filter_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE + RLIKE predicates (SURVEY §2.2 `filter_like_regex` [S])."""
    p = load_tables(spark, sf_dir).part
    return p.filter(
        F.col("p_type").like("%BRASS%")
        | F.col("p_brand").rlike("^Brand#[12][0-9]$")
    ).select("p_partkey", "p_name", "p_type", "p_brand")


@query(
    "etl_field_cleanup",
    oracle="""
    SELECT s_suppkey AS suppkey,
           lower(s_name) AS name,
           coalesce(s_acctbal, 0.0) AS acctbal,
           CASE WHEN s_acctbal < 0 THEN 'DEBT' ELSE 'OK' END AS status
    FROM supplier
    """,
)
def etl_field_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rename / lowercase / default-missing hygiene (SURVEY §2.2
    `etl_field_cleanup` [P:med]) — the reference's per-record field cleanup
    as pure column expressions."""
    s = load_tables(spark, sf_dir).supplier
    return s.select(
        F.col("s_suppkey").alias("suppkey"),
        F.lower("s_name").alias("name"),
        F.coalesce(F.col("s_acctbal"), F.lit(0.0)).alias("acctbal"),
        F.when(F.col("s_acctbal") < 0, "DEBT").otherwise("OK").alias("status"),
    )


@query(
    "etl_type_cast",
    oracle=f"""
    SELECT event_id,
           CAST(event_id AS VARCHAR) AS id_str,
           {FXP('value', 1)} AS value_int,
           TRY_CAST(event_type AS DOUBLE) AS bad_cast,
           TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k_typed,
           CAST(ts AS DATE) AS event_date
    FROM events
    """,
)
def etl_type_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts incl. try_cast on dirty data (SURVEY §2.2 `etl_type_cast`):
    `bad_cast` is always NULL (letters → DOUBLE fails softly on both
    engines), `k_typed` goes string→int."""
    ev = load_tables(spark, sf_dir).events
    return ev.select(
        "event_id",
        F.col("event_id").cast("string").alias("id_str"),
        fxp(F.col("value"), 1).alias("value_int"),
        F.col("event_type").try_cast("double").alias("bad_cast"),
        F.get_json_object("props", "$.k").try_cast("int").alias("k_typed"),
        F.col("ts").cast("date").alias("event_date"),
    )


@query(
    "etl_enrich_partition_cols",
    oracle="""
    SELECT event_id, ts,
           CAST(ts AS DATE) AS dt,
           CAST(strftime(ts, '%Y-%m-%d') AS VARCHAR) AS dt_str,
           CAST(extract(hour FROM ts) AS INT) AS event_hour,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
    FROM events
    """,
)
def etl_enrich_partition_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive Hive-partition fields from the event timestamp (SURVEY §2.2
    `etl_enrich_partition_cols`) — the reference's enrichment step that
    feeds its date-partitioned output layout."""
    ev = load_tables(spark, sf_dir).events
    return ev.select(
        "event_id",
        "ts",
        F.to_date("ts").alias("dt"),
        F.date_format("ts", "yyyy-MM-dd").alias("dt_str"),
        F.hour("ts").alias("event_hour"),
        F.unix_timestamp("ts").alias("epoch_s"),
    )


@query(
    "etl_scd2_intervals",
    oracle="""
    SELECT user_id, value AS attr_value, ts AS valid_from,
           coalesce(
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
             TIMESTAMP '2200-01-01 00:00:00'
           ) AS valid_to,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             IS NULL) AS is_current
    FROM events
    WHERE event_type = 'signup'
    """,
)
def etl_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: each attribute change
    becomes a [valid_from, valid_to) interval via lead() over the per-key
    change stream; the open interval gets a sentinel end + is_current
    flag. One window shuffle on the key — the standard warehouse
    dimension-history pattern, same plan at any scale.

    Sentinel is 2200-01-01, NOT the conventional 9999-12-31: pandas/Arrow
    timestamp[ns] tops out at 2262-04-11, and the driver's canon does
    toPandas — the 9999 sentinel is an ArrowInvalid out-of-bounds error."""
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("value").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        F.coalesce(
            nxt, F.lit("2200-01-01 00:00:00").cast("timestamp")
        ).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "etl_latest_per_key",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
      SELECT user_id, event_id, ts, event_type, value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def etl_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction / upsert-read semantics: latest record per key by
    event time (event_id tiebreak) — the batch equivalent of "merge
    updates, keep newest". row_number-filter form; at 100 TB the same
    semantics ride max_by(struct) in one hash aggregate when the full row
    is small (agg_minmax_by shows that twin)."""
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


@query(
    "etl_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate < TIMESTAMP '1996-01-01'
    ),
    new AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate < TIMESTAMP '1997-01-01'
    )
    SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
           CASE WHEN old.o_orderkey IS NULL THEN 'added'
                WHEN new.o_orderkey IS NULL THEN 'removed'
                WHEN old.o_orderstatus <> new.o_orderstatus
                  OR old.o_totalprice <> new.o_totalprice THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           old.o_totalprice AS old_price,
           new.o_totalprice AS new_price
    FROM old FULL JOIN new ON old.o_orderkey = new.o_orderkey
    WHERE NOT (old.o_orderkey IS NOT NULL AND new.o_orderkey IS NOT NULL
               AND old.o_orderstatus = new.o_orderstatus
               AND old.o_totalprice = new.o_totalprice)
    """,
)
def etl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (CDC without a changelog): full-outer-join two
    keyed snapshots and classify rows added / removed / changed —
    emitting only the delta. The date-sliced orders table stands in for
    two snapshot epochs. One shuffle on the key for both sides; at
    100 TB bucket both snapshots on the key and the exchange disappears
    (plans/bucketed_join pattern)."""
    o = load_tables(spark, sf_dir).orders
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    old = o.filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")
    ).select(cols)
    new = o.filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    ).select(cols)
    ol, nw = old.alias("old"), new.alias("new")
    ok, nk = F.col("old.o_orderkey"), F.col("new.o_orderkey")
    same = (
        ok.isNotNull()
        & nk.isNotNull()
        & (F.col("old.o_orderstatus") == F.col("new.o_orderstatus"))
        & (F.col("old.o_totalprice") == F.col("new.o_totalprice"))
    )
    change = (
        F.when(ok.isNull(), "added")
        .when(nk.isNull(), "removed")
        .when(
            (F.col("old.o_orderstatus") != F.col("new.o_orderstatus"))
            | (F.col("old.o_totalprice") != F.col("new.o_totalprice")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return (
        ol.join(nw, ok == nk, "full")
        .filter(~same)
        .select(
            F.coalesce(ok, nk).alias("o_orderkey"),
            change.alias("change_type"),
            F.col("old.o_totalprice").alias("old_price"),
            F.col("new.o_totalprice").alias("new_price"),
        )
    )


@query(
    "etl_profile",
    oracle="""
    SELECT 'o_orderkey' AS "column",
           count(*) - count(o_orderkey) AS n_nulls,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS DOUBLE) AS min_num,
           CAST(max(o_orderkey) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*) - count(o_custkey),
           count(DISTINCT o_custkey),
           CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE),
           NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           min(o_totalprice), max(o_totalprice), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', count(*) - count(o_orderdate),
           count(DISTINCT o_orderdate),
           CAST(date_diff('day', DATE '1970-01-01',
                          CAST(min(o_orderdate) AS DATE)) AS DOUBLE),
           CAST(date_diff('day', DATE '1970-01-01',
                          CAST(max(o_orderdate) AS DATE)) AS DOUBLE),
           NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus),
           NULL, NULL, min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority),
           NULL, NULL, min(o_orderpriority), max(o_orderpriority)
    FROM orders
    """,
)
def etl_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling (operators/profile.py): null counts, distinct
    cardinalities, min/max for six orders columns — the recon step every
    ingest pipeline runs before trusting a feed. The operator computes
    ALL columns' stats in ONE scan as parallel partial-aggregable
    expressions (the oracle's 6-branch UNION reads the table six times —
    fine for DuckDB's checker, wrong at 100 TB; the plan difference IS
    the point, same answer). Dates profile as epoch-day numbers; strings
    via byte-order min/max."""
    from pyetl_spark.operators.profile import profile

    o = load_tables(spark, sf_dir).orders
    return profile(
        o,
        numeric_cols=["o_orderkey", "o_custkey", "o_totalprice"],
        date_cols=["o_orderdate"],
        string_cols=["o_orderstatus", "o_orderpriority"],
    )


@query(
    "etl_quality_checks",
    oracle="""
    SELECT 'orphan_orders' AS check_name,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
             AS n_violations
    UNION ALL
    SELECT 'dup_orderkeys',
           (SELECT count(*) FROM
             (SELECT o_orderkey FROM orders
              GROUP BY o_orderkey HAVING count(*) > 1))
    UNION ALL
    SELECT 'null_keys',
           (SELECT count(*) FROM orders
            WHERE o_orderkey IS NULL OR o_custkey IS NULL)
    UNION ALL
    SELECT 'nonpositive_price',
           (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
    UNION ALL
    SELECT 'bad_status',
           (SELECT count(*) FROM orders
            WHERE o_orderstatus NOT IN ('F', 'O', 'P'))
    UNION ALL
    SELECT 'date_out_of_range',
           (SELECT count(*) FROM orders
            WHERE o_orderdate < TIMESTAMP '1990-01-01'
               OR o_orderdate >= TIMESTAMP '2005-01-01')
    """,
)
def etl_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate: six constraint checks (referential integrity
    via anti-join, key uniqueness, null keys, price positivity, status
    domain, date sanity window) emitted as (check_name, n_violations) —
    the contract a pipeline asserts before promoting a batch; a clean
    feed returns all zeros (and does on the fixtures, which is the
    assertion: the checks run, find nothing, and say so).

    r15 (guide §2.4): TWO orders passes, not six. The pre-r15 form
    union'd the scalar-check aggregate in four times — each union
    branch replans its subtree, so the one conditional-count pass ran
    once per check name (4 redundant full scans; the before-plan shows
    orders scanned 6×). Now the scalar checks ride the dup-check's
    groupBy(o_orderkey) as per-group conditional counts summed in the
    second-level aggregate (integer counts — exact under any grouping),
    and the single fused result row is unpivoted with ``stack`` instead
    of four self-unions. The remaining passes are irreducible: the
    anti-join integrity check and the keyed dup/scalar aggregate."""
    t = load_tables(spark, sf_dir)
    o, c = t.orders, t.customer
    orphans = o.join(
        c, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
    ).agg(F.count("*").alias("n"))
    per_key = o.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("k"),
        F.count_if(
            F.col("o_orderkey").isNull() | F.col("o_custkey").isNull()
        ).alias("nk"),
        F.count_if(F.col("o_totalprice") <= 0).alias("np"),
        F.count_if(~F.col("o_orderstatus").isin("F", "O", "P")).alias("bs"),
        F.count_if(
            (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
            | (
                F.col("o_orderdate")
                >= F.lit("2005-01-01").cast("timestamp")
            )
        ).alias("dr"),
    )
    zero = F.lit(0).cast("long")
    fused = per_key.agg(
        F.count_if(F.col("k") > 1).alias("dup_orderkeys"),
        F.coalesce(F.sum("nk"), zero).alias("null_keys"),
        F.coalesce(F.sum("np"), zero).alias("nonpositive_price"),
        F.coalesce(F.sum("bs"), zero).alias("bad_status"),
        F.coalesce(F.sum("dr"), zero).alias("date_out_of_range"),
    )
    out = orphans.select(
        F.lit("orphan_orders").alias("check_name"),
        F.col("n").alias("n_violations"),
    )
    return out.unionAll(
        fused.select(
            F.expr(
                "stack(5, "
                "'dup_orderkeys', dup_orderkeys, "
                "'null_keys', null_keys, "
                "'nonpositive_price', nonpositive_price, "
                "'bad_status', bad_status, "
                "'date_out_of_range', date_out_of_range"
                ") AS (check_name, n_violations)"
            )
        )
    )


@query(
    "etl_incremental_agg",
    oracle="""
    WITH state AS (
      SELECT user_id, count(*) AS cnt, sum({MU}) AS sv,
             max(ts) AS last_ts
      FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
      GROUP BY user_id
    ),
    delta AS (
      SELECT user_id, count(*) AS cnt, sum({MU}) AS sv,
             max(ts) AS last_ts
      FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
      GROUP BY user_id
    ),
    merged AS (
      -- CAST: DuckDB sum(BIGINT) widens to HUGEINT, which pandas renders
      -- as float64 ("5.0") while Spark's BIGINT renders "5" — the r1
      -- hash mismatch. BIGINT keeps both engines integer-typed.
      SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n_events,
             CAST(sum(sv) AS BIGINT) AS sv,
             max(last_ts) AS last_ts
      FROM (SELECT * FROM state UNION ALL SELECT * FROM delta)
      GROUP BY user_id
    )
    SELECT user_id, n_events,
           {R} AS total_value, last_ts
    FROM merged
    """.replace("{MU}", FXP("value", 10**6)).replace(
        "{R}", R("CAST(sv AS DOUBLE) / 1000000.0", 4)
    ),
)
def etl_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregation via mergeable state: "yesterday's"
    per-user summaries (events before Jan 15) merged with the new
    partition's summaries by RE-AGGREGATING THE SUMMARIES — count/sum/max
    are merge-closed, so the full history never rescans (the batch twin
    of a streaming state store update, and the pattern behind every
    incremental rollup table). Sums carry exact fixed-point micro-units
    so state+delta merging is order-free; invariant-tested equal to the
    from-scratch aggregate. At 100 TB: the state side is one summary row
    per user (dimension-sized), the delta side scans ONLY the new
    partition — that asymmetry is the entire point."""
    e = load_tables(spark, sf_dir).events
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")

    def summarize(df):
        return df.groupBy("user_id").agg(
            F.count("*").alias("cnt"),
            F.sum(fxp(F.col("value"), 10**6)).alias("sv"),
            F.max("ts").alias("last_ts"),
        )

    state = summarize(e.filter(F.col("ts") < cut))
    delta = summarize(e.filter(F.col("ts") >= cut))
    merged = (
        state.unionAll(delta)
        .groupBy("user_id")
        .agg(
            F.sum("cnt").alias("n_events"),
            F.sum("sv").alias("sv"),
            F.max("last_ts").alias("last_ts"),
        )
    )
    return merged.select(
        "user_id",
        "n_events",
        rnd(F.col("sv").cast("double") / F.lit(1000000.0), 4).alias(
            "total_value"
        ),
        "last_ts",
    )


@query(
    "etl_cdc_compact",
    oracle="""
    WITH changes AS (
      SELECT o_orderkey AS key, o_orderdate AS change_ts,
             CASE WHEN o_orderstatus = 'F' THEN 'U'
                  WHEN o_orderkey % 11 = 0 THEN 'D'
                  ELSE 'I' END AS op,
             o_custkey, o_totalprice
      FROM orders
    ),
    latest AS (
      SELECT key, change_ts, op, o_custkey, o_totalprice,
             row_number() OVER (
               PARTITION BY key ORDER BY change_ts DESC, op DESC
             ) AS rn
      FROM changes
    )
    SELECT key, change_ts, op, o_custkey, o_totalprice
    FROM latest
    WHERE rn = 1 AND op != 'D'
    """,
)
def etl_cdc_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction (the Debezium-feed → snapshot kernel): keep
    each key's LATEST change (row_number over change time, deterministic
    op tiebreak), then drop keys whose last op is a delete. One window
    shuffle on the key; Spark's rank-limit pushdown (WindowGroupLimit)
    keeps map-side state at one row per key, so compacting a month of
    changelog costs one bounded shuffle at any scale. The change log is
    synthesized deterministically from orders so the oracle sees the
    identical feed."""
    from pyspark.sql import Window

    o = load_tables(spark, sf_dir).orders
    changes = o.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderdate").alias("change_ts"),
        F.when(F.col("o_orderstatus") == "F", "U")
        .when(F.col("o_orderkey") % 11 == 0, "D")
        .otherwise("I")
        .alias("op"),
        "o_custkey",
        "o_totalprice",
    )
    w = Window.partitionBy("key").orderBy(
        F.desc("change_ts"), F.desc("op")
    )
    return (
        changes.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .drop("rn")
    )


@query(
    "etl_fk_integrity",
    oracle="""
    SELECT rel, CAST(n_child AS BIGINT) AS n_child,
           CAST(n_orphan AS BIGINT) AS n_orphan
    FROM (
      SELECT 'orders->customer' AS rel, count(*) AS n_child,
             count(*) FILTER (WHERE c_custkey IS NULL) AS n_orphan
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      UNION ALL
      SELECT 'lineitem->orders', count(*),
             count(*) FILTER (WHERE o_orderkey IS NULL)
      FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
      UNION ALL
      SELECT 'lineitem->part', count(*),
             count(*) FILTER (WHERE p_partkey IS NULL)
      FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
      UNION ALL
      SELECT 'customer->nation', count(*),
             count(*) FILTER (WHERE n_nationkey IS NULL)
      FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
    )
    """,
)
def etl_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit — the pre-training data-quality gate:
    count orphaned foreign keys across the star schema's four FK edges in
    one report (a training pipeline that joins facts to dims silently
    DROPS orphans with an inner join; this measures what would vanish).

    Each edge is a left join + null-count — Catalyst prunes both sides to
    the key columns, dims broadcast, and the fact edges shuffle on their
    FK. A cheaper 100 TB variant aggregates distinct child keys first
    (orphan KEYS not orphan ROWS) — one distinct per edge, then an anti
    join against the parent's key set; the per-row form here is chosen
    because the oracle needs row counts. The four edges are independent
    jobs Spark schedules concurrently under the union."""
    t = load_tables(spark, sf_dir)

    def edge(child: DataFrame, ck: str, parent: DataFrame, pk: str, rel: str) -> DataFrame:
        j = child.select(ck).join(
            parent.select(pk), F.col(ck) == F.col(pk), "left"
        )
        return j.agg(
            F.lit(rel).alias("rel"),
            F.count("*").alias("n_child"),
            F.count(F.when(F.col(pk).isNull(), 1)).alias("n_orphan"),
        ).select("rel", "n_child", "n_orphan")

    return (
        edge(t.orders, "o_custkey", t.customer, "c_custkey", "orders->customer")
        .unionByName(edge(t.lineitem, "l_orderkey", t.orders, "o_orderkey", "lineitem->orders"))
        .unionByName(edge(t.lineitem, "l_partkey", t.part, "p_partkey", "lineitem->part"))
        .unionByName(edge(t.customer, "c_nationkey", t.nation, "n_nationkey", "customer->nation"))
    )


@query(
    "etl_freshness_lag",
    oracle="""
    WITH m AS (SELECT max(ts) AS global_max FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(date_diff('second', max(ts), (SELECT global_max FROM m))
                AS BIGINT) AS lag_secs
    FROM events
    GROUP BY event_type
    """,
)
def etl_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source freshness monitoring: how far each event_type's newest
    record trails the newest record overall — the lag alarm every
    continuously-landing table needs (a stuck upstream shows up as one
    source's lag growing while the others stay near zero).

    ONE events scan: the per-type max (partial/final on ≤ #types groups)
    is computed first, and the global max is a window max OVER that
    ≤ #types-row aggregate — never a second pass of the fact table, and
    no join at all (the unpartitioned window is safe precisely because
    its input is the group-count-bounded aggregate, not the fact).
    Second precision keeps the µs-vs-ns storage question out of the
    hash."""
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir).events
    per_type = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"), F.max("ts").alias("type_max")
    )
    global_max = F.max("type_max").over(
        Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return per_type.select(
        "event_type",
        "n_events",
        (F.unix_timestamp(global_max) - F.unix_timestamp("type_max"))
        .cast("bigint")
        .alias("lag_secs"),
    )


@query(
    "etl_k_anonymity",
    oracle="""
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
             count(*) AS grp_n
      FROM customer
      GROUP BY c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 1000.0) AS BIGINT)
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_qi_groups,
           CAST(sum(grp_n) AS BIGINT) AS n_customers,
           CAST(min(grp_n) AS BIGINT) AS min_group_size,
           CAST(count(*) FILTER (WHERE grp_n < 5) AS BIGINT)
             AS n_violating_groups,
           CAST(coalesce(sum(grp_n) FILTER (WHERE grp_n < 5), 0) AS BIGINT)
             AS n_customers_at_risk
    FROM qi GROUP BY c_nationkey
    """,
)
def etl_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier set — the governance
    check a training corpus carrying user-derived records needs before
    release: any (nation, segment, balance-bucket) combination matching
    fewer than k=5 individuals re-identifies them by linkage. Reports,
    per nation, the group count, population, smallest group, and how many
    groups/customers fall under k — the inputs to a suppress-or-coarsen
    decision (drop violating rows, or widen bal_bucket until min ≥ k).

    Two stacked aggregations: QI groupBy (one shuffle, uniform keys) then
    a ≤25-group rollup. At 100 TB the QI aggregate is partial/final
    map-combined like any count — anonymity auditing is not harder than
    counting. Bucket floor is integer-exact on both engines."""
    c = load_tables(spark, sf_dir).customer
    qi = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("bal_bucket"),
    ).agg(F.count("*").alias("grp_n"))
    return qi.groupBy("c_nationkey").agg(
        F.count("*").alias("n_qi_groups"),
        F.sum("grp_n").cast("bigint").alias("n_customers"),
        F.min("grp_n").cast("bigint").alias("min_group_size"),
        F.count(F.when(F.col("grp_n") < 5, 1)).alias("n_violating_groups"),
        F.coalesce(
            F.sum(F.when(F.col("grp_n") < 5, F.col("grp_n"))), F.lit(0)
        )
        .cast("bigint")
        .alias("n_customers_at_risk"),
    )


@query(
    "etl_dataset_fingerprint",
    oracle="""
    WITH o AS (
      SELECT CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
               CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
               o_orderstatus,
               CAST(CAST(sign(o_totalprice) * floor(abs(o_totalprice) * 100.0
                    + 0.5) AS BIGINT) AS VARCHAR),
               CAST(epoch_us(o_orderdate) AS VARCHAR))), 1, 12))
             AS BIGINT) % 1000000007) AS BIGINT) % 1000000007 AS fp,
             CAST(count(*) AS BIGINT) AS n FROM orders
    ),
    c AS (
      SELECT CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
               CAST(c_custkey AS VARCHAR), c_name, c_mktsegment,
               CAST(c_nationkey AS VARCHAR))), 1, 12))
             AS BIGINT) % 1000000007) AS BIGINT) % 1000000007 AS fp,
             CAST(count(*) AS BIGINT) AS n FROM customer
    ),
    d AS (
      SELECT CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
               CAST(doc_id AS VARCHAR), lang, source, md5(text))), 1, 12))
             AS BIGINT) % 1000000007) AS BIGINT) % 1000000007 AS fp,
             CAST(count(*) AS BIGINT) AS n FROM documents
    )
    SELECT 'orders' AS table_name, n AS n_rows, fp AS fingerprint FROM o
    UNION ALL
    SELECT 'customer', n, fp FROM c
    UNION ALL
    SELECT 'documents', n, fp FROM d
    """,
)
def etl_dataset_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed dataset fingerprints — the reproducibility
    manifest a training run should record: an ORDER-FREE, PARTITION-FREE
    hash of each input table's canonical content, so "did the data
    change since the last run" is one manifest diff, not a row-level
    reconciliation. Any row edit, insert, or delete moves the
    fingerprint; re-partitioning, re-ordering, or rewriting files does
    not (summing per-row hashes is commutative — exactly what file-level
    checksums can't give you on a distributed rewrite).

    Per row: md5 over a '|'-joined CANONICAL projection (floats through
    the fxp cent grid, timestamps as epoch-µs integers — raw
    double/timestamp string casts differ across engines), 12 hex chars
    → 48-bit int, reduced mod 1e9+7 per row, then a TWO-LEVEL modular
    sum (4096 hash-groups, partials reduced before the final fold) so no
    intermediate exceeds bigint below ~3.7e13 rows per group. Two stacked
    partial/final aggregates per table — fingerprinting costs one narrow
    scan."""
    t = load_tables(spark, sf_dir)
    P = F.lit(1000000007)

    def fp_of(df: DataFrame, name: str, cols: list) -> DataFrame:
        row_h = (
            F.conv(F.substring(F.md5(F.concat_ws("|", *cols)), 1, 12), 16, 10)
            .cast("bigint")
            % P
        )
        # two-level mod: a single sum of ~1e9-sized terms overflows
        # bigint past ~9.2e9 rows (Spark wraps, DuckDB widens — they
        # would diverge). 4096 sub-sums keep each partial < 2^63 up to
        # ~3.7e13 rows/group; modular arithmetic makes the nesting exact.
        sub = df.select(
            row_h.alias("h"),
            F.pmod(F.xxhash64(F.md5(F.concat_ws("|", *cols))), F.lit(4096)).alias("g"),
        ).groupBy("g").agg(
            (F.sum("h") % P).alias("hsub"), F.count("*").alias("nsub")
        )
        return sub.agg(
            F.lit(name).alias("table_name"),
            F.sum("nsub").cast("bigint").alias("n_rows"),
            (F.sum("hsub") % P).cast("bigint").alias("fingerprint"),
        ).select("table_name", "n_rows", "fingerprint")

    o = fp_of(
        t.orders,
        "orders",
        [
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            fxp(F.col("o_totalprice"), 100).cast("string"),
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).cast(
                "string"
            ),
        ],
    )
    c = fp_of(
        t.customer,
        "customer",
        [
            F.col("c_custkey").cast("string"),
            F.col("c_name"),
            F.col("c_mktsegment"),
            F.col("c_nationkey").cast("string"),
        ],
    )
    d = fp_of(
        t.documents,
        "documents",
        [
            F.col("doc_id").cast("string"),
            F.col("lang"),
            F.col("source"),
            F.md5("text"),
        ],
    )
    return o.unionByName(c).unionByName(d)


@query(
    "etl_forget_propagation",
    oracle="""
    WITH forget AS (
      SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
    ),
    o_del AS (
      SELECT o_orderkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM forget)
    )
    SELECT 'customer' AS table_name,
           CAST((SELECT count(*) FROM forget) AS BIGINT) AS n_delete,
           CAST((SELECT count(*) FROM customer) -
                (SELECT count(*) FROM forget) AS BIGINT) AS n_remaining
    UNION ALL
    SELECT 'orders',
           CAST((SELECT count(*) FROM o_del) AS BIGINT),
           CAST((SELECT count(*) FROM orders) -
                (SELECT count(*) FROM o_del) AS BIGINT)
    UNION ALL
    SELECT 'lineitem',
           CAST((SELECT count(*) FROM lineitem
                 WHERE l_orderkey IN (SELECT o_orderkey FROM o_del))
                AS BIGINT),
           CAST((SELECT count(*) FROM lineitem) -
                (SELECT count(*) FROM lineitem
                 WHERE l_orderkey IN (SELECT o_orderkey FROM o_del))
                AS BIGINT)
    """,
)
def etl_forget_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade audit: given a deletion-request key
    set (deterministic fixture stand-in: custkey % 97 = 0), count what a
    compliant purge removes at every FK hop — customers, their orders,
    those orders' lineitems — and what remains. Running the AUDIT before
    the purge is the operational pattern: the counts are the review
    artifact, and the same semi-/anti-join frames then drive the
    rewrite (delete = anti-join rewrite of each table, partition-scoped
    at 100 TB via dynamic partition overwrite, exactly the
    sink_parquet_partitioned layout).

    Plan: the forget SET (deletion requests over a dim table) is small
    and broadcasts; the CASCADED order-key set scales with the fact
    table, so that hop is a plain semi-join — broadcast while it fits,
    shuffle beyond (no forced hint). Each hop is pinned before its count
    so the cascade computes once, not once per downstream action."""
    t = load_tables(spark, sf_dir)
    forget = t.customer.filter(F.col("c_custkey") % 97 == 0).select(
        "c_custkey"
    )
    # pin each hop: every count below (and each next hop) reuses the
    # prior frame — unpinned, the lineitem hop would replay the whole
    # cascade (the pipeline_curation_full per-stage-count pattern)
    forget = forget.persist()
    o_del = t.orders.join(
        F.broadcast(forget),
        F.col("o_custkey") == F.col("c_custkey"),
        "left_semi",
    ).select("o_orderkey").persist()
    # NO forced broadcast here: o_del scales with the fact table (~1% of
    # all orders) — Catalyst/AQE picks broadcast while it fits and falls
    # back to a shuffle semi-join beyond, instead of OOMing the driver
    li_del = t.lineitem.join(
        o_del,
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )

    def row(name: str, full: DataFrame, dele: DataFrame) -> DataFrame:
        n_full = full.count()
        n_del = dele.count()
        return spark.createDataFrame(
            [(name, n_del, n_full - n_del)],
            "table_name string, n_delete long, n_remaining long",
        )

    out = (
        row("customer", t.customer, forget)
        .unionByName(row("orders", t.orders, o_del))
        .unionByName(row("lineitem", t.lineitem, li_del))
    )
    forget.unpersist()
    o_del.unpersist()
    return out


@query(
    "etl_incremental_join_view",
    oracle=f"""
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_lines,
           {R("CAST(sum(" + FXP("l_extendedprice * (1 - l_discount)", 10**4) + ") AS DOUBLE) / 10000.0", 2)} AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_custkey
    """,
)
def etl_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN-aggregate view via delta
    algebra: for V(O) = γ(O ⋈ L), joins distribute over union —
    V(O_old ∪ ΔO) = V(O_old) ⊕ V(ΔO) — so arrival of the delta batch
    (here: the 10% of orders with ``o_orderkey % 10 == 0``) requires
    joining ONLY the delta against lineitem and merging keyed partial
    states, never rescanning the old fact join. The merge ⊕ re-sums the
    merge-closed (count, fixed-point-sum) states per customer — the
    join-view counterpart of etl_incremental_agg's aggregate-only IVM,
    and the batch shape of every streaming join materialization.

    Tier-A proof: the maintained view hash-matches the from-scratch
    oracle (full orders ⋈ lineitem GROUP BY) because the per-line cents
    are exact integers — state+delta merge order cannot perturb a sum.
    The "materialized" old state is pinned with an eager localCheckpoint
    so the old join physically runs once, as it would in production
    (state on disk), not re-derived by Catalyst into the full join.

    At 100 TB: the old-view state is customer-cardinality (small vs the
    fact), the delta join shuffles only the delta partition — cost is
    O(|Δ|) + O(|state|) per refresh. Bucketing orders+lineitem on
    orderkey (plans/layout.py) removes even the delta-side shuffle."""
    t = load_tables(spark, sf_dir)
    rev_c = fxp(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10**4
    ).alias("rev_c")
    li = t.lineitem.select("l_orderkey", rev_c)

    def view_of(orders: DataFrame) -> DataFrame:
        return (
            orders.select("o_orderkey", "o_custkey")
            .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum("rev_c").alias("rev_c"),
            )
        )

    is_delta = F.col("o_orderkey") % 10 == 0
    state = view_of(t.orders.filter(~is_delta)).localCheckpoint(eager=True)
    delta_view = view_of(t.orders.filter(is_delta))
    return (
        state.unionAll(delta_view)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_lines").alias("n_lines"),
            F.sum("rev_c").alias("rev_c"),
        )
        .select(
            "o_custkey",
            "n_lines",
            rnd(F.col("rev_c").cast("double") / F.lit(10000.0), 2).alias(
                "revenue"
            ),
        )
    )
