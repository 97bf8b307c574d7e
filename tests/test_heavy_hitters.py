"""Misra-Gries heavy hitters: exactness vs brute force, memory bound,
no-false-negative guarantee at adversarial slack."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyetl_spark.operators.heavy_hitters import heavy_hitters
from pyetl_spark.tables import load_tables
from tests.conftest import SF_ORACLE


def _exact(df, col, phi):
    counted = df.groupBy(col).agg(F.count("*").alias("c"))
    n = df.count()
    return {
        (r[col], r["c"])
        for r in counted.filter(F.col("c") > phi * n).collect()
    }


def test_matches_exact_on_skewed_stream(spark):
    """Zipf-ish stream: items hit in proportion 1/i; result must equal
    the brute-force groupBy filter exactly (values AND counts)."""
    rows = []
    for i in range(1, 40):
        rows += [(f"item{i}",)] * (2000 // i)
    df = spark.createDataFrame(rows, ["w"]).repartition(8)
    got = {(r["w"], r["c"]) for r in heavy_hitters(df, "w", phi=0.05).collect()}
    assert got == _exact(df, "w", 0.05)
    assert got  # non-trivial


def test_no_false_negatives_with_minimal_slack(spark):
    """slack=1 (tightest counter budget 1/phi): the MG guarantee still
    holds — every true heavy hitter survives the candidate pass."""
    rows = [("hot",)] * 500 + [(f"c{i}",) for i in range(3000)]
    df = spark.createDataFrame(rows, ["w"]).repartition(16)
    got = {r["w"] for r in heavy_hitters(df, "w", phi=0.1, slack=1).collect()}
    assert got == {"hot"}


def test_share_is_true_global_share(spark):
    """Counts and shares are the true global values, and the phi
    threshold is strict: a=60% and b=20% pass phi=0.15, the hundred
    singletons (0.2% each) do not."""
    rows = [("a",)] * 300 + [("b",)] * 100 + [(f"z{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, ["w"]).repartition(4)
    out = {r["w"]: r for r in heavy_hitters(df, "w", phi=0.15).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["c"] == 300
    assert out["a"]["share"] == pytest.approx(300 / 500)
    assert out["b"]["share"] == pytest.approx(100 / 500)


def test_agrees_with_declared_query_on_fixture(spark):
    """On the documents fixture the operator at phi=0.02 (the declared
    queries' threshold — lowered from 3.4% in r5 so the hitter set stays
    non-empty as shares dilute with corpus growth) returns the same term
    set as the exact Tier-A text_heavy_hitters query."""
    from pyetl_spark import registry

    registry.load_all()
    d = load_tables(spark, SF_ORACLE).documents
    toks = d.select(F.explode(F.split("text", " ")).alias("term"))
    got = {
        r["term"]: r["c"]
        for r in heavy_hitters(toks, "term", phi=0.02).collect()
    }
    want = {
        r["term"]: r["c"]
        for r in registry.QUERIES["text_heavy_hitters"](
            spark, SF_ORACLE
        ).collect()
    }
    assert got == want
