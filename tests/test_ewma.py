"""EWMA operator: recurrence correctness, determinism, ordering."""

from __future__ import annotations

import pytest

from pyetl_spark.operators.ewma import ewma


def _df(spark, rows):
    return spark.createDataFrame(rows, ["k", "ts", "eid", "v"])


def test_matches_closed_form(spark):
    alpha = 0.5
    xs = [10.0, 20.0, 30.0, 40.0]
    rows = [(1, t, t, x) for t, x in enumerate(xs)]
    out = (
        ewma(_df(spark, rows), "k", "ts", "v", alpha=alpha, tiebreak="eid")
        .orderBy("ts")
        .collect()
    )
    y = xs[0]
    want = [y]
    for x in xs[1:]:
        y = alpha * x + (1 - alpha) * y
        want.append(y)
    got = [r["ewma"] for r in out]
    assert got == pytest.approx(want, abs=1e-12)


def test_keys_independent_and_deterministic(spark):
    rows = [(k, t, t, float(k * 100 + t)) for k in (1, 2, 3) for t in range(20)]
    df = _df(spark, rows)
    r1 = {(r["k"], r["ts"]): r["ewma"] for r in ewma(df, "k", "ts", "v", tiebreak="eid").collect()}
    r2 = {(r["k"], r["ts"]): r["ewma"] for r in ewma(df, "k", "ts", "v", tiebreak="eid").collect()}
    assert r1 == r2
    # first value of each key is the raw value (y0 = x0)
    for k in (1, 2, 3):
        assert r1[(k, 0)] == pytest.approx(k * 100.0)


def test_out_of_order_input_sorted_by_ts(spark):
    """Input arrives shuffled; the operator must sort by event time."""
    alpha = 0.3
    rows = [(1, 2, 2, 30.0), (1, 0, 0, 10.0), (1, 1, 1, 20.0)]
    out = ewma(_df(spark, rows), "k", "ts", "v", alpha=alpha, tiebreak="eid")
    got = {r["ts"]: r["ewma"] for r in out.collect()}
    y0 = 10.0
    y1 = alpha * 20.0 + (1 - alpha) * y0
    y2 = alpha * 30.0 + (1 - alpha) * y1
    assert got[0] == pytest.approx(y0)
    assert got[1] == pytest.approx(y1)
    assert got[2] == pytest.approx(y2)


def test_smoothing_bounds(spark):
    """EWMA stays inside [min(x), max(x)] — convex combinations only."""
    rows = [(1, t, t, float(v)) for t, v in enumerate([5, 50, 5, 50, 5, 50])]
    out = ewma(_df(spark, rows), "k", "ts", "v", alpha=0.2, tiebreak="eid")
    for r in out.collect():
        assert 5.0 <= r["ewma"] <= 50.0


def test_chunked_bit_identical_to_whole_group(spark):
    """ewma_chunked's scale contract: sequential time-slices with exact
    state carry reproduce the whole-group recurrence BIT-for-bit (no
    ulp drift — the per-row IEEE op order is unchanged), for any slice
    count, including keys that first appear mid-timeline."""
    from pyetl_spark.operators.ewma import ewma_chunked

    rows = [
        (k, t, t, float(((k * 37 + t * 13) % 91) - 45) / 7.0)
        for k in (1, 2, 3)
        for t in range(60)
    ]
    # key 4 first appears at t=35 — must anchor y0 = x0 in a LATER slice
    rows += [(4, t, t, float(t)) for t in range(35, 60)]
    df = _df(spark, rows)
    base = {
        (r["k"], r["ts"]): r["ewma"]
        for r in ewma(df, "k", "ts", "v", tiebreak="eid").collect()
    }
    for n_slices in (1, 3, 7):
        got = {
            (r["k"], r["ts"]): r["ewma"]
            for r in ewma_chunked(
                df, "k", "ts", "v", tiebreak="eid", n_slices=n_slices
            ).collect()
        }
        assert got == base, f"n_slices={n_slices}: not bit-identical"


def test_chunked_on_events_fixture(spark):
    """Fixture smoke: chunked vs whole-group on real event timestamps
    (timestamp-typed ts, duplicate-day tiebreaks) — bit-identical."""
    from pyetl_spark.operators.ewma import ewma_chunked
    from pyetl_spark.tables import load_tables
    from tests.conftest import SF_ORACLE

    ev = load_tables(spark, SF_ORACLE).events.select(
        "user_id", "ts", "event_id", "value"
    )
    base = {
        (r["user_id"], r["event_id"]): r["ewma"]
        for r in ewma(
            ev, "user_id", "ts", "value", tiebreak="event_id"
        ).collect()
    }
    got = {
        (r["user_id"], r["event_id"]): r["ewma"]
        for r in ewma_chunked(
            ev, "user_id", "ts", "value", tiebreak="event_id", n_slices=3
        ).collect()
    }
    assert got == base


def test_chunked_keeps_null_ts_rows(spark):
    """Rows with NULL timestamps must not vanish: the base path sorts
    them last (pandas NaT) and smooths them; chunked routes them to the
    last slice — outputs stay bit-identical and row-complete."""
    from pyetl_spark.operators.ewma import ewma_chunked

    rows = [(1, t, t, float(t * 3 % 7)) for t in range(10)]
    df = _df(spark, rows).unionByName(
        spark.createDataFrame(
            [(1, None, 100, 5.0), (1, None, 101, 2.0)],
            "k bigint, ts bigint, eid bigint, v double",
        )
    )
    base = {
        (r["k"], r["eid"]): r["ewma"]
        for r in ewma(df, "k", "ts", "v", tiebreak="eid").collect()
    }
    got = {
        (r["k"], r["eid"]): r["ewma"]
        for r in ewma_chunked(
            df, "k", "ts", "v", tiebreak="eid", n_slices=3
        ).collect()
    }
    assert len(got) == 12 and got == base
