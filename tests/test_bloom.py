"""Bloom-filter semi-join prefilter (operators/bloom.py) — semantics,
false-positive bounds, and result-identity with the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyetl_spark.operators.bloom import (
    bloom_build,
    bloom_fill_ratio,
    bloom_might_contain,
)
from pyetl_spark.tables import load_tables
from tests.conftest import SF_ORACLE


def _dim_and_fact(spark):
    t = load_tables(spark, SF_ORACLE)
    dim = t.customer.filter(F.col("c_mktsegment") == "MACHINERY").select(
        "c_custkey"
    )
    fact = t.orders.filter(F.col("o_totalprice") > 100000)
    return dim, fact


def test_no_false_negatives(spark):
    """Every inserted key passes the membership test — the property that
    makes the prefiltered join result IDENTICAL to the plain join."""
    dim, _ = _dim_and_fact(spark)
    words = bloom_build(dim, "c_custkey")
    missed = dim.filter(
        ~bloom_might_contain(F.col("c_custkey"), words)
    ).count()
    assert missed == 0


def test_false_positive_rate_bounded(spark):
    """Non-member pass rate stays near the analytic (1-e^{-kn/m})^k; the
    prefilter must remove the bulk of non-matching fact rows or it is not
    doing its shuffle-reduction job."""
    dim, fact = _dim_and_fact(spark)
    words = bloom_build(dim, "c_custkey")
    kept = fact.filter(bloom_might_contain(F.col("o_custkey"), words)).count()
    true = fact.join(
        dim, F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    ).count()
    total = fact.count()
    assert kept >= true  # superset of matches
    non_members = total - true
    fp = (kept - true) / non_members if non_members else 0.0
    assert fp < 0.05, f"false-positive rate {fp:.4f} too high"


def test_prefiltered_join_equals_plain_join(spark):
    dim, fact = _dim_and_fact(spark)
    words = bloom_build(dim, "c_custkey")
    pre = fact.filter(bloom_might_contain(F.col("o_custkey"), words)).join(
        dim, F.col("o_custkey") == F.col("c_custkey")
    )
    plain = fact.join(dim, F.col("o_custkey") == F.col("c_custkey"))
    assert pre.exceptAll(plain).count() == 0
    assert plain.exceptAll(pre).count() == 0


def test_fill_ratio_sane(spark):
    dim, _ = _dim_and_fact(spark)
    words = bloom_build(dim, "c_custkey")
    fill = bloom_fill_ratio(words)
    # defaults: k=4 hashes, m auto-sized to 8 bits/key (next pow2) —
    # sparse at fixture scale, and never empty (≥1 key sets bits)
    assert 0.0 < fill < 0.5


def test_membership_is_jvm_expression(spark):
    """The predicate must stay codegen-side: no Python UDF node, no
    exchange introduced by the filter itself."""
    import contextlib
    import io

    dim, fact = _dim_and_fact(spark)
    words = bloom_build(dim, "c_custkey")
    df = fact.filter(bloom_might_contain(F.col("o_custkey"), words))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # pure map-side prefilter
