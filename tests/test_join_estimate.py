"""Coordinated-sample join-cardinality estimator gates."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyetl_spark import registry
from pyetl_spark.tables import load_tables

registry.load_all()
SF = "/root/testdata/sf0.01"


def test_estimate_within_error_bound(spark):
    """Deterministic estimate lands within 25% of the true join size at
    sf0.01 (true size ~60k rows; 1/64 key sample ≈ 230 sampled keys →
    1/sqrt(230) ≈ 6.6% sigma; 25% is ~4 sigma)."""
    t = load_tables(spark, SF)
    truth = t.orders.join(
        t.lineitem, F.col("o_orderkey") == F.col("l_orderkey")
    ).count()
    est = registry.QUERIES["join_cardinality_estimate"](spark, SF).collect()[
        0
    ]
    assert est["sampled_matched_keys"] > 50
    assert abs(est["est_join_rows"] / truth - 1.0) < 0.25


def test_estimate_never_runs_the_join(spark):
    """The plan joins only the sampled key-count aggregates: both scans
    carry the hash-threshold filter BEFORE any join, and the join input
    is the per-key aggregate, not fact rows."""
    df = registry.QUERIES["join_cardinality_estimate"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the coordinated-sample filter (portable md5-prefix hash since the
    # Tier-A conversion) must sit below the join on both scans
    assert "md5" in plan
    # two pre-join aggregates (partial+final pairs) feed the join
    assert plan.count("HashAggregate") >= 4
