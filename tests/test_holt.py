"""Holt double-exponential smoothing: recursion correctness, distributed
parity with the local reference, and trend-recovery sanity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pyetl_spark.operators.holt import holt_fit_forecast, holt_forecast


def test_holt_recovers_pure_linear_trend():
    """On an exactly linear series, level+trend lock on and forecasts
    extrapolate the line exactly (smoothing of a perfect trend is the
    trend)."""
    xs = [3.0 + 2.0 * i for i in range(20)]
    level, trend, fcs = holt_fit_forecast(xs, alpha=0.5, beta=0.3, horizon=3)
    assert math.isclose(trend, 2.0, rel_tol=1e-6)
    assert math.isclose(level, xs[-1], rel_tol=1e-6)
    for h, f in enumerate(fcs, 1):
        assert math.isclose(f, xs[-1] + 2.0 * h, rel_tol=1e-6)


def test_holt_distributed_matches_reference(spark):
    rows = [
        (1, d, 10.0 + 3.0 * d + (1.0 if d % 2 else -1.0)) for d in range(12)
    ] + [(2, d, 50.0 - 2.0 * d) for d in range(8)] + [(3, 0, 5.0)]
    df = spark.createDataFrame(rows, "user_id long, day int, x double")
    out = holt_forecast(
        df, order_col="day", alpha=0.5, beta=0.3, horizon=3
    ).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["user_id"], []).append(r)
    assert set(by_key) == {1, 2}  # single-point series dropped
    for uid, recs in by_key.items():
        xs = sorted(
            [(d, x) for (u, d, x) in rows if u == uid], key=lambda t: t[0]
        )
        level, trend, fcs = holt_fit_forecast(
            [x for _, x in xs], alpha=0.5, beta=0.3, horizon=3
        )
        recs.sort(key=lambda r: r["h"])
        for h, r in enumerate(recs, 1):
            assert r["forecast"] == fcs[h - 1]
            assert r["level"] == level and r["trend"] == trend


def test_holt_declared_query_runs(spark):
    from pyetl_spark import registry
    from tests.conftest import SF_ORACLE

    registry.load_all()
    out = registry.QUERIES["ts_forecast_holt"](spark, SF_ORACLE)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["h"] in (1, 2, 3) for r in rows)
    # every user with >= 2 observed days gets exactly 3 forecast rows
    n_users = len({r["user_id"] for r in rows})
    assert len(rows) == 3 * n_users
