"""Tests: observe()-based quality metrics and small-files compaction."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from pyetl_spark.etl_metrics import assert_quality, observe_quality
from pyetl_spark.plans.layout import compact
from pyetl_spark.tables import load_tables
from tests.conftest import SF_ORACLE


def test_observe_collects_metrics_in_one_pass(spark):
    t = load_tables(spark, SF_ORACLE)
    customer, orders = t.customer, t.orders
    joined = customer.join(
        orders,
        (customer.c_custkey == orders.o_custkey)
        & (orders.o_totalprice > 450000),
        "left",
    ).select("c_custkey", "o_orderkey")
    instrumented, obs = observe_quality(
        joined, not_null_cols=["o_orderkey"]
    )
    n = instrumented.count()  # the one action; metrics ride along
    got = assert_quality(obs, min_rows=1, max_null_fraction=1.0)
    assert got["n_rows"] == n
    assert got["null_o_orderkey"] > 0  # unmatched customers exist


def test_quality_gate_raises_on_breach(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "a long, b string")
    instrumented, obs = observe_quality(df, not_null_cols=["b"])
    instrumented.count()
    with pytest.raises(ValueError):
        assert_quality(obs, max_null_fraction=0.5)


def test_compact_reduces_file_count(spark, tmp_path):
    path = os.path.join(str(tmp_path), "frag")
    ev = load_tables(spark, SF_ORACLE).events.select("event_id", "value")
    ev.repartition(24).write.parquet(path)
    before = len(glob.glob(os.path.join(path, "*.parquet")))
    assert before >= 24
    n_before = spark.read.parquet(path).count()
    compact(spark, path, target_files=2)
    after = len(glob.glob(os.path.join(path, "*.parquet")))
    assert after <= 3
    assert spark.read.parquet(path).count() == n_before
