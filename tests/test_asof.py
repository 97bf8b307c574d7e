"""Property tests for the as-of join operator against DuckDB's native ASOF
JOIN (SURVEY.md §7: "join_asof rewrite correctness — property-test against
DuckDB's ASOF JOIN"). The backward-inclusive case is already the Tier-A
`join_asof` oracle; this adds strict and forward variants + edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyetl_spark.operators.asof import asof_join
from pyetl_spark.tables import load_tables
from tests.conftest import SF_ORACLE


def _frames(spark):
    ev = load_tables(spark, SF_ORACLE).events
    left = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    return left, right


def _duck_asof(duck, op: str, agg: str):
    """Reference result via DuckDB scalar-subquery formulation (works for
    all four direction/strictness combos)."""
    return {
        r[0]: r[1]
        for r in duck.execute(
            f"""
            SELECT e.event_id,
                   (SELECT {agg}(p.ts) FROM events p
                    WHERE p.event_type = 'purchase'
                      AND p.user_id = e.user_id AND e.ts {op} p.ts)
            FROM events e WHERE e.event_type = 'error'
            """
        ).fetchall()
    }


def _collect(df):
    return {
        r["event_id"]: (
            r["p_ts"].replace(tzinfo=None) if r["p_ts"] else None
        )
        for r in df.collect()
    }


def test_backward_inclusive_matches_duckdb(spark, duck):
    left, right = _frames(spark)
    got = _collect(
        asof_join(left, right, on="user_id", left_time="ts", right_time="p_ts")
    )
    want = _duck_asof(duck, ">=", "max")
    assert got == want


def test_backward_strict_matches_duckdb(spark, duck):
    left, right = _frames(spark)
    got = _collect(
        asof_join(
            left, right, on="user_id", left_time="ts", right_time="p_ts",
            allow_exact_match=False,
        )
    )
    want = _duck_asof(duck, ">", "max")
    assert got == want


def test_forward_inclusive_matches_duckdb(spark, duck):
    left, right = _frames(spark)
    got = _collect(
        asof_join(
            left, right, on="user_id", left_time="ts", right_time="p_ts",
            direction="forward",
        )
    )
    want = _duck_asof(duck, "<=", "min")
    assert got == want


def test_forward_strict_matches_duckdb(spark, duck):
    left, right = _frames(spark)
    got = _collect(
        asof_join(
            left, right, on="user_id", left_time="ts", right_time="p_ts",
            direction="forward", allow_exact_match=False,
        )
    )
    want = _duck_asof(duck, "<", "min")
    assert got == want


def test_no_match_yields_nulls(spark):
    """Left keys with no right rows at all keep null payloads."""
    left = spark.createDataFrame(
        [(1, 99999, 10)], "event_id long, user_id long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 5, 1.0)], "user_id long, p_ts long, p_value double"
    )
    out = asof_join(
        left, right, on="user_id", left_time="ts", right_time="p_ts"
    ).collect()
    assert len(out) == 1
    assert out[0]["p_ts"] is None


def test_column_collision_rejected(spark):
    left = spark.createDataFrame([(1, 1, 10)], "id long, k long, ts long")
    right = spark.createDataFrame([(1, 5, 2.0)], "k long, ts long, v double")
    try:
        asof_join(left, right, on="k", left_time="ts", right_time="ts")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "alias" in str(e)


def test_multi_key_asof(spark, duck):
    """Composite join keys: as-of per (user_id, event bucket)."""
    from pyetl_spark.tables import load_tables

    ev = load_tables(spark, SF_ORACLE).events
    left = ev.filter(F.col("event_type") == "error").select(
        "event_id",
        "user_id",
        (F.col("event_id") % 2).alias("bucket"),
        "ts",
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        (F.col("event_id") % 2).alias("bucket"),
        F.col("ts").alias("p_ts"),
    )
    got = {
        r["event_id"]: (r["p_ts"].replace(tzinfo=None) if r["p_ts"] else None)
        for r in asof_join(
            left,
            right,
            on=["user_id", "bucket"],
            left_time="ts",
            right_time="p_ts",
        ).collect()
    }
    want = {
        r[0]: r[1]
        for r in duck.execute(
            """
            SELECT e.event_id,
                   (SELECT max(p.ts) FROM events p
                    WHERE p.event_type = 'purchase'
                      AND p.user_id = e.user_id
                      AND p.event_id % 2 = e.event_id % 2
                      AND e.ts >= p.ts)
            FROM events e WHERE e.event_type = 'error'
            """
        ).fetchall()
    }
    assert got == want


def test_tolerance_nulls_stale_matches(spark):
    """tolerance_secs: a match farther back than the bound is nulled;
    within-bound matches are untouched."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "a"), (2, "2024-01-01 10:00:00", "b")],
        "user_id long, ts string, tag string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "tag")
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", 5.0), (2, "2024-01-01 02:00:00", 7.0)],
        "user_id long, r_ts string, val double",
    ).select(
        "user_id", F.col("r_ts").cast("timestamp").alias("r_ts"), "val"
    )
    out = {
        r["user_id"]: r
        for r in asof_join(
            left, right, on="user_id", left_time="ts", right_time="r_ts",
            tolerance_secs=3600,
        ).collect()
    }
    assert out[1]["val"] == 5.0 and out[1]["r_ts"] is not None
    assert out[2]["val"] is None and out[2]["r_ts"] is None
