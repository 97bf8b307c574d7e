"""Batch analogs of the streaming window operators (SURVEY.md §2.9 Tier A).

The reference is fundamentally a streaming consumer; these queries pin the
*aggregation semantics* of each stateful shape against the DuckDB oracle on
the static events table, while the true Structured Streaming versions (same
logic, incremental state) live in pyetl_spark/streaming/ with Tier-C pytest
coverage (tests/test_streaming.py).

Window-boundary math happens on integer epoch microseconds on both engines —
never on interval arithmetic, whose dialects differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyetl_spark.parity import FXP, MSUM, R, fxp, msum, rnd
from pyetl_spark.registry import query
from pyetl_spark.tables import load_tables

_US_15MIN = 15 * 60 * 1_000_000
_US_30MIN = 30 * 60 * 1_000_000


@query(
    "stream_tumbling_1h",
    oracle=f"""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
           event_type,
           count(*) AS n_events,
           {MSUM('value', 100)} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling count+sum per event_type (SURVEY §2.9
    `stream_tumbling_1h`). Streaming twin: groupBy(window(ts, '1 hour'))
    with a watermark — see pyetl_spark/streaming/windows.py."""
    ev = load_tables(spark, sf_dir).events
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        msum(F.col("value"), 100).alias("total_value"),
    )


@query(
    "stream_sliding",
    oracle=f"""
    SELECT ws AS window_start, event_type,
           count(*) AS n_events,
           {MSUM('value', 100)} AS total_value
    FROM (
      SELECT event_type, value,
             unnest([
               make_timestamp((epoch_us(ts) // {_US_15MIN}) * {_US_15MIN}),
               make_timestamp((epoch_us(ts) // {_US_15MIN} - 1) * {_US_15MIN})
             ]) AS ws
      FROM events
    )
    GROUP BY ws, event_type
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min windows sliding every 15 min — every event lands in exactly 2
    windows (SURVEY §2.9 `stream_sliding`). Spark's window() generates the
    window set; the oracle reconstructs it by exploding the two aligned
    starts per event on integer-µs arithmetic."""
    ev = load_tables(spark, sf_dir).events
    return (
        ev.groupBy(
            F.window("ts", "30 minutes", "15 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            msum(F.col("value"), 100).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "stream_session",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_US_30MIN}
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT *, CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS session_seq
      FROM flagged
    )
    SELECT user_id, session_seq,
           min(ts) AS session_start,
           max(ts) AS session_end,
           count(*) AS n_events,
           {MSUM('value', 100)} AS total_value
    FROM numbered
    GROUP BY user_id, session_seq
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user, 30-min inactivity gap (SURVEY §2.9
    `stream_session`), as classic gaps-and-islands: lag → new-session flag →
    running sum = session id. Streaming twin uses session_window(ts, '30
    minutes'). Gap math on integer epoch-µs, identical on both engines."""
    ev = load_tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > _US_30MIN),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        msum(F.col("value"), 100).alias("total_value"),
    )


@query(
    "events_gapfill_spine",
    oracle="""
    WITH RECURSIVE spine(d) AS (
      SELECT DATE '2024-01-01'
      UNION ALL
      SELECT CAST(d + INTERVAL 1 DAY AS DATE)
      FROM spine WHERE d < DATE '2024-02-10'
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS d, count(*) AS n
      FROM events GROUP BY 1
    )
    SELECT spine.d AS day, coalesce(daily.n, 0) AS n_events,
           (daily.n IS NULL) AS is_gap
    FROM spine LEFT JOIN daily ON spine.d = daily.d
    """,
)
def events_gapfill_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily time series via a RECURSIVE CTE date spine
    (Spark 4 finally has WITH RECURSIVE): generate every calendar day
    across (and past) the event range, left-join daily counts, zero-fill
    gaps. The spine is driver-trivial (rows = days); the daily aggregate
    is the only real shuffle — gap-filling at 100 TB costs the same as
    the aggregate alone. The same recursion pattern powers hierarchy
    walks and the DuckDB-side closure oracle of dedup_components."""
    t = load_tables(spark, sf_dir)
    t.register_views()
    return spark.sql(
        """
        WITH RECURSIVE spine(d) AS (
          SELECT DATE '2024-01-01'
          UNION ALL
          SELECT CAST(d + INTERVAL 1 DAY AS DATE)
          FROM spine WHERE d < DATE '2024-02-10'
        ),
        daily AS (
          SELECT CAST(ts AS DATE) AS d, count(*) AS n
          FROM events GROUP BY 1
        )
        SELECT spine.d AS day, coalesce(daily.n, 0) AS n_events,
               (daily.n IS NULL) AS is_gap
        FROM spine LEFT JOIN daily ON spine.d = daily.d
        """
    )


@query(
    "win_time_weighted_avg",
    oracle=f"""
    WITH spans AS (
      SELECT user_id, value,
             CAST(date_diff('second', ts,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               AS BIGINT) AS dur_s
      FROM events
    )
    SELECT user_id,
           {R('''CAST(sum({fxp} * dur_s) AS DOUBLE)
                 / (100.0 * sum(dur_s))''', 4)} AS twa_value,
           CAST(sum(dur_s) AS BIGINT) AS total_s
    FROM spans
    WHERE dur_s IS NOT NULL AND dur_s > 0
    GROUP BY user_id
    """.replace("{fxp}", FXP("value", 100)),
)
def win_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user — each reading weighted by how long
    it was 'current' (until the next event): the correct mean for
    irregularly-sampled series where arithmetic mean over-weights bursts.
    Weights are integer seconds × integer cents (value is a 2dp grid), so
    the weighted sum is EXACT on both engines — no float summation-order
    hazard. One window (lead) + one aggregate, same key."""
    ev = load_tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur_s = (
        F.unix_timestamp(F.lead("ts").over(w))
        - F.unix_timestamp(F.col("ts"))
    ).cast("long")
    spans = ev.select(
        "user_id", "value", dur_s.alias("dur_s")
    ).filter(F.col("dur_s").isNotNull() & (F.col("dur_s") > 0))
    wsum = F.sum(fxp(F.col("value"), 100) * F.col("dur_s"))
    return spans.groupBy("user_id").agg(
        rnd(
            wsum.cast("double") / (100.0 * F.sum("dur_s")), 4
        ).alias("twa_value"),
        F.sum("dur_s").alias("total_s"),
    )


@query(
    "win_streak",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    grouped AS (
      SELECT user_id, d,
             CAST(d - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY d) AS INTEGER) AS DATE)
               AS anchor
      FROM days
    )
    SELECT user_id,
           max(len) AS longest_streak_days,
           count(*) AS n_streaks
    FROM (
      SELECT user_id, anchor, count(*) AS len
      FROM grouped GROUP BY user_id, anchor
    )
    GROUP BY user_id
    """,
)
def win_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user: the
    date-minus-row_number gaps-and-islands trick (consecutive days share
    one anchor date), then a count per island and a max per user. Two
    same-key shuffles; the pattern generalizes to any 'consecutive
    integers' run-length question."""
    ev = load_tables(spark, sf_dir).events
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grouped = days.withColumn(
        "anchor",
        F.date_sub(F.col("d"), F.row_number().over(w)),
    )
    islands = grouped.groupBy("user_id", "anchor").agg(
        F.count("*").alias("len")
    )
    return islands.groupBy("user_id").agg(
        F.max("len").alias("longest_streak_days"),
        F.count("*").alias("n_streaks"),
    )


@query(
    "events_session_conversion",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN date_diff('second',
                    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    ts) > 1800
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    sess AS (
      SELECT user_id, event_type,
             sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM flagged
    )
    SELECT user_id,
           count(DISTINCT session_id) AS n_sessions,
           count(DISTINCT CASE WHEN event_type = 'purchase'
                               THEN session_id END) AS n_converted
    FROM sess
    GROUP BY user_id
    """,
)
def events_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level conversion: sessionize with the 30-min
    gaps-and-islands pattern (stream_session's batch analog), then count
    per user how many sessions contained a purchase. Composite of two
    same-key windows + one aggregate — all shuffles on user_id."""
    ev = load_tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap = F.unix_timestamp("ts") - F.unix_timestamp(prev)
    new_sess = F.when(
        prev.isNull() | (gap > 1800), 1
    ).otherwise(0)
    sess_id = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = ev.select(
        "user_id", "event_type", sess_id.alias("session_id")
    )
    converted = F.when(
        F.col("event_type") == "purchase", F.col("session_id")
    )
    return sess.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.countDistinct(converted).alias("n_converted"),
    )


@query(
    "events_sliding_distinct_users",
    oracle="""
    WITH RECURSIVE starts(s) AS (
      SELECT TIMESTAMP '2024-01-01 00:00:00'
      UNION ALL
      SELECT s + INTERVAL 1 HOUR FROM starts
      WHERE s < TIMESTAMP '2024-01-31 00:00:00'
    )
    SELECT starts.s AS window_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM starts JOIN events
      ON events.ts >= starts.s
     AND events.ts < starts.s + INTERVAL 6 HOUR
    GROUP BY 1
    """,
)
def events_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per sliding 6-hour window, hopping hourly — the
    rolling-reach metric. Spark's window() generator assigns each event
    to its ≤6 overlapping hops (one Expand node — rows × 6, no join),
    then one partial/final aggregate per hop; the oracle spells the same
    thing as a spine×events range join. distinct-per-window is the
    non-mergeable part — at extreme cardinality swap count_distinct for
    the bitmap (agg_bitmap_distinct) or HLL forms, which partial-combine.
    Windows outside the fixture's event range simply don't appear (inner
    join semantics on both sides)."""
    ev = load_tables(spark, sf_dir).events
    hopped = ev.select(
        F.window("ts", "6 hours", "1 hour").alias("w"), "user_id"
    )
    return (
        hopped.groupBy(F.col("w.start").alias("window_start"))
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .filter(
            (F.col("window_start") >= F.lit("2024-01-01 00:00:00"))
            & (F.col("window_start") <= F.lit("2024-01-31 00:00:00"))
        )
    )
