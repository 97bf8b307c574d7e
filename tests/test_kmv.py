"""KMV bottom-k sketch gates (operators/kmv.py).

The sketch itself must be EXACT (it is the true bottom-k of the hash
values — all approximation lives in the estimator), unions must be
lossless, and the estimators must hit their published error bounds on
planted cardinalities. Deterministic throughout: xxhash64 is a fixed
function, so every assertion is exact-repeatable.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyetl_spark.operators.kmv import (
    kmv_estimate,
    kmv_intersect_estimate,
    kmv_jaccard,
    kmv_sketch,
    kmv_union,
)

K = 256


def _planted(spark, lo: int, hi: int, tag: str):
    """Distinct values lo..hi-1 (each twice, to exercise distinctness)."""
    return (
        spark.range(lo, hi)
        .withColumn("g", F.lit(tag))
        .unionAll(spark.range(lo, hi).withColumn("g", F.lit(tag)))
        .select("g", F.col("id").alias("v"))
    )


def _sketch_map(spark, df, k=K):
    rows = kmv_sketch(df, ["g"], "v", k=k).collect()
    return {r["g"]: list(r["kmv"]) for r in rows}


def test_sketch_is_exact_bottom_k(spark):
    """Two-pass bounded build == brute-force bottom-k of all hashes."""
    df = _planted(spark, 0, 20_000, "a")
    got = _sketch_map(spark, df)["a"]
    brute = [
        r[0]
        for r in df.select(F.xxhash64("v").alias("h"))
        .distinct()
        .orderBy("h")
        .limit(K)
        .collect()
    ]
    assert got == brute


def test_sketch_exact_bottom_k_moderate_cardinality(spark):
    """The empty-bucket guard branch: D between k and ~4k ln k, where a
    naive max-of-minima threshold could undercut the true k-th minimum."""
    for d in (255, 256, 257, 300, 700, 2_000):
        df = _planted(spark, 0, d, "a")
        got = _sketch_map(spark, df)["a"]
        brute = [
            r[0]
            for r in df.select(F.xxhash64("v").alias("h"))
            .distinct()
            .orderBy("h")
            .limit(K)
            .collect()
        ]
        assert got == brute, f"D={d}"


def test_unsaturated_estimate_is_exact(spark):
    df = _planted(spark, 0, 100, "a")
    row = (
        kmv_sketch(df, ["g"], "v", k=K)
        .select(kmv_estimate(F.col("kmv"), K).alias("est"))
        .collect()[0]
    )
    assert row["est"] == 100.0


@pytest.mark.parametrize("d", [5_000, 50_000])
def test_estimate_relative_error(spark, d):
    """(k-1)/u_k relative error ~ 1/sqrt(k-2) ≈ 6.3%; gate at 4 sigma."""
    df = _planted(spark, 0, d, "a")
    row = (
        kmv_sketch(df, ["g"], "v", k=K)
        .select(kmv_estimate(F.col("kmv"), K).alias("est"))
        .collect()[0]
    )
    assert abs(row["est"] / d - 1.0) < 4 / (K - 2) ** 0.5


def test_union_is_lossless(spark):
    """bottom-k(A∪B) == merge(bottom-k(A), bottom-k(B)) exactly."""
    a = _planted(spark, 0, 30_000, "a")
    b = _planted(spark, 20_000, 50_000, "b")
    sk = _sketch_map(spark, a.unionAll(b))
    merged_row = (
        spark.createDataFrame(
            [(sk["a"], sk["b"])], "kmv_a array<long>, kmv_b array<long>"
        )
        .select(kmv_union(F.col("kmv_a"), F.col("kmv_b"), K).alias("u"))
        .collect()[0]
    )
    u_direct = _sketch_map(
        spark,
        a.unionAll(b).withColumn("g", F.lit("u")),
    )["u"]
    assert list(merged_row["u"]) == u_direct


def test_jaccard_and_intersection_estimates(spark):
    """Planted overlap: |A|=30k, |B|=30k, |A∩B|=10k, J=0.2, |A∪B|=50k."""
    a = _planted(spark, 0, 30_000, "a")
    b = _planted(spark, 20_000, 50_000, "b")
    sk = _sketch_map(spark, a.unionAll(b))
    row = (
        spark.createDataFrame(
            [(sk["a"], sk["b"])], "kmv_a array<long>, kmv_b array<long>"
        )
        .select(
            kmv_jaccard(F.col("kmv_a"), F.col("kmv_b"), K).alias("j"),
            kmv_intersect_estimate(F.col("kmv_a"), F.col("kmv_b"), K).alias(
                "i"
            ),
        )
        .collect()[0]
    )
    # Jaccard sigma ~ sqrt(J(1-J)/k) ≈ 0.025; gate at 4 sigma.
    assert abs(row["j"] - 0.2) < 0.1
    assert abs(row["i"] / 10_000 - 1.0) < 0.5


def test_registered_queries_smoke(spark):
    from pyetl_spark import registry

    registry.load_all()
    d = registry.QUERIES["agg_kmv_distinct"](spark, "/root/testdata/sf0.001")
    rows = {r["event_type"]: r for r in d.collect()}
    assert set(rows) == {"click", "error", "purchase", "signup", "view"}
    o = registry.QUERIES["agg_kmv_overlap"](spark, "/root/testdata/sf0.001")
    orows = o.collect()
    assert len(orows) == 10  # C(5,2) pairs
    for r in orows:
        assert r["approx_union"] > 0
        assert 0.0 <= r["approx_jaccard"] <= 1.0


def test_no_python_eval_in_plan(spark):
    df = _planted(spark, 0, 10_000, "a")
    plan = kmv_sketch(df, ["g"], "v", k=K)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
