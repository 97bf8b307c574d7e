"""Window functions (SURVEY.md §2.5, all Tier A).

Every query uses a total ordering (unique tiebreak column) so results are
hash-stable across engines (SURVEY §5.3). Physically each window is one hash
exchange on the partition keys + in-partition sort; at 100 TB the partition
key choice (customer, user) bounds per-task memory, and no frame here needs
more than a running buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyetl_spark.parity import FXP, R, fxp, rnd
from pyetl_spark.registry import query
from pyetl_spark.tables import load_tables


@query(
    "win_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice AS price,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (SURVEY §2.5 `win_topk_per_group`).
    row_number + unique o_orderkey tiebreak → deterministic."""
    o = load_tables(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_rank_dense",
    oracle="""
    SELECT p_brand, p_partkey, p_size,
           rank()       OVER (PARTITION BY p_brand ORDER BY p_size)       AS rnk,
           dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size)      AS drnk,
           row_number() OVER (PARTITION BY p_brand
                              ORDER BY p_size, p_partkey)                AS rn
    FROM part
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank with real ties on p_size (SURVEY §2.5
    `win_rank_dense`); row_number carries the unique tiebreak."""
    p = load_tables(spark, sf_dir).part
    w_ties = Window.partitionBy("p_brand").orderBy("p_size")
    w_total = Window.partitionBy("p_brand").orderBy("p_size", "p_partkey")
    return p.select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
        F.row_number().over(w_total).alias("rn"),
    )


@query(
    "win_ntile_pct",
    oracle=f"""
    SELECT c_custkey,
           ntile(4) OVER w AS quartile,
           {R('percent_rank() OVER w', 4)} AS pct_rank,
           {R('cume_dist() OVER w', 4)} AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
)
def win_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over a global total order
    (SURVEY §2.5 `win_ntile_pct`)."""
    c = load_tables(spark, sf_dir).customer
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        rnd(F.percent_rank().over(w), 4).alias("pct_rank"),
        rnd(F.cume_dist().over(w), 4).alias("cume"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           value - lag(value) OVER w AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user previous/next event value + delta (SURVEY §2.5
    `win_lag_lead`); event_id tiebreak pins equal timestamps."""
    ev = load_tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@query(
    "win_running_sum",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           {R('''sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )''', 2)} AS running_spend
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per customer by date (SURVEY §2.5
    `win_running_sum`)."""
    o = load_tables(spark, sf_dir).orders
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        rnd(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "win_moving_avg",
    oracle=f"""
    SELECT user_id, event_id,
           {R('''avg(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
           )''', 4)} AS moving_avg
    FROM events
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-row moving average per user (SURVEY §2.5 `win_moving_avg`)."""
    ev = load_tables(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        rnd(F.avg("value").over(w), 4).alias("moving_avg"),
    )


@query(
    "win_range_frame",
    oracle=f"""
    SELECT event_id, user_id, epoch_s,
           count(*) OVER (
             PARTITION BY user_id ORDER BY epoch_s
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS n_last_hour,
           {R('''sum(value) OVER (
             PARTITION BY user_id ORDER BY epoch_s
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           )''', 2)} AS sum_last_hour
    FROM (SELECT event_id, user_id, value,
                 CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
          FROM events)
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range frame over epoch seconds — events within the trailing
    hour (SURVEY §2.5 `win_range_frame`). Numeric RANGE, not interval, for
    cross-engine parity."""
    ev = load_tables(spark, sf_dir).events
    base = ev.select(
        "event_id",
        "user_id",
        "value",
        F.unix_timestamp("ts").alias("epoch_s"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return base.select(
        "event_id",
        "user_id",
        "epoch_s",
        F.count("*").over(w).alias("n_last_hour"),
        rnd(F.sum("value").over(w), 2).alias("sum_last_hour"),
    )


@query(
    "win_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS last_order,
           nth_value(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value with the full frame pinned explicitly —
    last_value's default frame (ends at CURRENT ROW) is the classic trap
    (SURVEY §2.5 `win_first_last`)."""
    o = load_tables(spark, sf_dir).orders
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@query(
    "win_nth_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           nth_value(o_orderkey, 2) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_best_order
    FROM orders
    WHERE o_custkey < 300
    """,
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over a pinned full frame: each order row sees its
    customer's 2nd-priciest order key (NULL for single-order customers).
    Same default-frame trap as last_value (win_first_last) — the full
    frame is spelled out on both engines."""
    o = load_tables(spark, sf_dir).orders
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.filter(F.col("o_custkey") < 300).select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_orderkey", 2).over(w).alias("second_best_order"),
    )


@query(
    "win_moving_median",
    oracle="""
    SELECT o_custkey, o_orderkey,
           {R} AS mov_median
    FROM (
      SELECT o_custkey, o_orderkey,
             quantile_cont({CENTS}, 0.5) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
             ) / 100.0 AS mm
      FROM orders
    )
    """.replace("{CENTS}", FXP("o_totalprice", 100)).replace(
        "{R}", R("mm", 2)
    ),
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving MEDIAN over a 5-row frame per customer — the robust twin of
    win_moving_avg (a median shrugs off one outlier order; a mean does
    not). Spark has no percentile-over-window, so the frame's values are
    collected (bounded: ≤5 per row) and the median computed from the
    sorted array; the DuckDB oracle is native quantile_cont OVER. Float
    discipline (parity.py): values go through exact integer CENTS first —
    the interpolated midpoint of two cent-integers is exactly x.0/x.5, so
    both engines descale and round identical bits (raw-double
    interpolation differed by 1 ulp on 12/1500 rows at sf0.01, flipping
    half-cent rounding ties). Even-count branch mirrors DuckDB's
    lower + (upper-lower)*0.5 op order. One shuffle on o_custkey; frame
    buffer is O(5), scale-safe."""
    o = load_tables(spark, sf_dir).orders
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, 0)
    )
    s = F.array_sort(F.collect_list(fxp(F.col("o_totalprice"), 100)).over(w))
    n = F.size(s)
    lo = F.element_at(s, F.floor((n + F.lit(1)) / F.lit(2)).cast("int")).cast(
        "double"
    )
    hi = F.element_at(s, (F.floor(n / F.lit(2)) + F.lit(1)).cast("int")).cast(
        "double"
    )
    m_cents = F.when(n % 2 == 1, lo).otherwise(lo + (hi - lo) * F.lit(0.5))
    return o.select(
        "o_custkey",
        "o_orderkey",
        rnd(m_cents / F.lit(100.0), 2).alias("mov_median"),
    )


@query(
    "win_running_distinct",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(sum(first_seen) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS distinct_types_so_far
    FROM (
      SELECT event_id, user_id, event_type, ts,
             CASE WHEN row_number() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) = 1 THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    """,
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) per user over event time — not directly
    expressible as a window aggregate in either engine (count distinct
    over a frame is unsupported), so it is rewritten as the classic
    first-occurrence flag (row_number()=1 inside user×type) + running sum
    of flags. Two window shuffles, both keyed on user_id (the second
    reuses the first's partitioning minus the type key); state per task
    is a running counter — scale-safe at any cardinality."""
    e = load_tables(spark, sf_dir).events
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    first_seen = F.when(
        F.row_number().over(w_first) == 1, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        e.withColumn("first_seen", first_seen)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.sum("first_seen").over(w_run).alias("distinct_types_so_far"),
        )
    )


@query(
    "win_ewma",
    oracle="""
    WITH RECURSIVE base AS MATERIALIZED (
      SELECT user_id, event_id, CAST(value AS DOUBLE) AS x,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ),
    walk AS (
      SELECT user_id, event_id, rn, x AS y FROM base WHERE rn = 1
      UNION ALL
      SELECT b.user_id, b.event_id, b.rn,
             (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE)) * w.y
               + CAST(0.3 AS DOUBLE) * b.x
      FROM walk w JOIN base b
        ON b.user_id = w.user_id AND b.rn = w.rn + 1
    )
    SELECT user_id, event_id,
           (sign(y) * floor(abs(y) * 1000000.0 + 0.5) / 1000000.0) AS ewma
    FROM walk
    """,
)
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of event values in
    event-time order (operators/ewma.py, applyInPandas). The recursive
    y_t = αx_t + (1−α)y_{t−1} depends on the unbounded past through a
    recurrence — not expressible as any SQL window FRAME, so the oracle
    replays it as a DuckDB recursive CTE advancing one row per user per
    step (depth = max events/user, 99 on these fixtures at every SF).

    Tier A (r7 conversion): the operator's recurrence is an explicit
    fixed-order loop (om·y + α·x, see operators/ewma.py) and the CTE
    computes the literal same expression — the constants 1.0−0.3 and 0.3
    are bit-identical doubles on both engines (probed), so the hash
    matches without tolerance. pytest additionally pins the closed form,
    ordering, and determinism. One shuffle on user_id.

    Scale: per-key history fits a task for user keys at any SF; a
    mega-key (one sensor, 10⁹ rows) rides ``ewma_chunked`` (same
    module) — sequential time-slices with exact state carry,
    BIT-IDENTICAL output, task memory bounded by one slice
    (tests/test_ewma.py pins the equality) — so this key has no
    group-must-fit-in-task-memory caveat left."""
    from pyetl_spark.operators.ewma import ewma

    e = load_tables(spark, sf_dir).events
    out = ewma(
        e, key="user_id", ts_col="ts", value_col="value",
        alpha=0.3, tiebreak="event_id",
    )
    return out.select(
        "user_id", "event_id", rnd(F.col("ewma"), 6).alias("ewma")
    )


@query(
    "win_rolling_argmax",
    oracle="""
    SELECT event_id, user_id,
           m['v'] AS peak_value,
           m['k'] AS peak_event_id
    FROM (
      SELECT event_id, user_id,
             max(struct_pack(v := value, k := event_id)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
             ) AS m
      FROM events
    )
    """,
)
def win_rolling_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling ARGmax: for each event, the peak value in the user's
    trailing 5-event frame AND which event set it — max_by has no window
    form in either engine, so both use the struct-lexicographic idiom
    (max over (value, event_id) pairs; ties go to the later event_id on
    both sides — same total order, deterministic). Passthrough doubles,
    no arithmetic → bit-identical without rounding. Same one-exchange
    window shape as win_moving_avg."""
    e = load_tables(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    m = F.max(
        F.struct(F.col("value").alias("v"), F.col("event_id").alias("k"))
    ).over(w)
    return e.select(
        "event_id",
        "user_id",
        m.getField("v").alias("peak_value"),
        m.getField("k").alias("peak_event_id"),
    )


@query(
    "win_since_last_error",
    oracle="""
    SELECT event_id, user_id,
           rn - coalesce(last_err_rn, 0) AS events_since_error
    FROM (
      SELECT event_id, user_id,
             row_number() OVER w AS rn,
             last_value(err_rn IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS last_err_rn
      FROM (
        SELECT event_id, user_id, ts,
               CASE WHEN event_type = 'error'
                    THEN row_number() OVER w END AS err_rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      )
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    """,
)
def win_since_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational freshness counter: for every event, how many events
    the user has emitted since their last 'error' (counting from stream
    start when none precedes) — the "N since incident" gauge behind
    alert-fatigue and health dashboards. Carry-forward of the error's
    row_number via last_value(IGNORE NULLS) over the 1-PRECEDING frame,
    all integers. Both windows share ONE (user, time) ordering — one
    exchange + one sort serve everything."""
    e = load_tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_prior = w.rowsBetween(Window.unboundedPreceding, -1)
    rn = F.row_number().over(w)
    err_rn = F.when(F.col("event_type") == "error", rn)
    last_err = F.last(err_rn, ignorenulls=True).over(w_prior)
    return e.select(
        "event_id",
        "user_id",
        (rn - F.coalesce(last_err, F.lit(0))).alias("events_since_error"),
    )


@query(
    "win_drawdown",
    oracle="""
    WITH daily AS (
      SELECT o_custkey AS c_custkey,
             CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CASE WHEN o_orderstatus = 'F'
                      THEN CAST(sign(o_totalprice) *
                           floor(abs(o_totalprice) * 100.0 + 0.5) AS BIGINT)
                      ELSE -CAST(sign(o_totalprice) *
                           floor(abs(o_totalprice) * 100.0 + 0.5) AS BIGINT)
                      END) AS BIGINT) AS delta_c
      FROM orders GROUP BY c_custkey, CAST(o_orderdate AS DATE)
    ),
    bal AS (
      SELECT c_custkey, day,
             CAST(sum(delta_c) OVER (PARTITION BY c_custkey ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS bal_c
      FROM daily
    ),
    cum AS (
      SELECT c_custkey, day, bal_c,
             CAST(max(bal_c) OVER (PARTITION BY c_custkey ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS peak_c
      FROM bal
    )
    SELECT c_custkey,
           CAST(max(peak_c - bal_c) AS BIGINT) AS max_drawdown_cents,
           CAST(max(peak_c) AS BIGINT) AS peak_cents,
           CAST(count(*) AS BIGINT) AS n_days
    FROM cum
    GROUP BY c_custkey
    HAVING max(peak_c - bal_c) > 0
    """,
)
def win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per account — the risk metric for any cumulative
    series (finished orders credit the balance, others debit it, as a
    deterministic fixture stand-in for deposits/withdrawals): largest
    peak-to-trough drop of the running balance, computed as
    max(running-peak − running-sum). Three stacked windows on ONE
    (custkey, day) ordering — running sum, running max OVER that sum,
    and a final per-key aggregate — all exact integer cents, so the
    hash is partition-order-free. One shuffle on custkey; frames are
    running (O(1) state per row). The same plan computes portfolio /
    inventory / quota drawdowns at 100 TB — the series key just
    changes."""
    o = load_tables(spark, sf_dir).orders
    signed = F.when(
        F.col("o_orderstatus") == "F", fxp(F.col("o_totalprice"), 100)
    ).otherwise(-fxp(F.col("o_totalprice"), 100))
    daily = o.groupBy(
        F.col("o_custkey").alias("c_custkey"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(F.sum(signed).cast("bigint").alias("delta_c"))
    w = (
        Window.partitionBy("c_custkey")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        "c_custkey",
        "day",
        F.sum("delta_c").over(w).cast("bigint").alias("bal_c"),
    ).withColumn("peak_c", F.max("bal_c").over(w).cast("bigint"))
    return (
        cum.groupBy("c_custkey")
        .agg(
            F.max(F.col("peak_c") - F.col("bal_c"))
            .cast("bigint")
            .alias("max_drawdown_cents"),
            F.max("peak_c").cast("bigint").alias("peak_cents"),
            F.count("*").cast("bigint").alias("n_days"),
        )
        .filter(F.col("max_drawdown_cents") > 0)
    )


@query(
    "win_cume_dist",
    oracle=f"""
    SELECT o_orderkey, o_orderpriority,
           {R("cume_dist() OVER (PARTITION BY o_orderpriority"
              " ORDER BY o_totalprice)", 6)} AS cd
    FROM orders WHERE o_orderkey % 5 = 0
    """,
)
def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist per priority group — the last member of the SQL ranking
    -function surface (rank/dense/row_number/ntile/percent_rank are
    declared elsewhere): fraction of the group with value ≤ current,
    TIES SHARE a cume_dist so no tiebreak key is needed (unlike
    row_number forms). Partitioned window (5 groups), one exchange; the
    %5 slice keeps fixture output bounded. For a GLOBAL cume_dist at
    scale use `win_pct_rank_twophase`'s rank machinery with rank/n."""
    o = load_tables(spark, sf_dir).orders.filter(
        F.col("o_orderkey") % 5 == 0
    )
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        rnd(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "win_gaps_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), isl AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY d) AS INT) AS grp
      FROM days
    ), runs AS (
      SELECT user_id, grp, CAST(count(*) AS BIGINT) AS run_len,
             min(d) AS run_start
      FROM isl GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(sum(run_len) AS BIGINT) AS active_days,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(max(run_len) AS BIGINT) AS longest_run,
           min(run_start) AS first_day
    FROM runs GROUP BY user_id
    """,
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, maximal runs of CONSECUTIVE active
    days, via the classic tabibitosan trick — date minus row_number() is
    constant within a consecutive run, so the run id falls out of one
    window pass instead of a self-join or an iterative fixpoint. Distinct
    from `stream_session` (gap-threshold sessionization on raw event
    timestamps): islands are calendar-aligned and the run id is an exact
    date, so every derived column is integer/date-exact — no FP parity
    surface at all.

    Scale: one distinct (user, day) partial/final agg, one window
    exchange partitioned by user_id (per-task state = one run counter),
    two more partial/final aggs on (user, grp) then user — every stage
    keyed by user, so AQE can reuse the exchange; nothing global."""
    ev = load_tables(spark, sf_dir).events
    days = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.select(
        "user_id",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("grp"),
    )
    runs = isl.groupBy("user_id", "grp").agg(
        F.count("*").alias("run_len"), F.min("d").alias("run_start")
    )
    return runs.groupBy("user_id").agg(
        F.sum("run_len").alias("active_days"),
        F.count("*").alias("n_islands"),
        F.max("run_len").alias("longest_run"),
        F.min("run_start").alias("first_day"),
    )
