"""Schema-evolution + union-by-name engine tests (ETL parity: the
reference's dynamic JSON fields mean table schemas drift over time)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_parquet_merge_schema_reads_drifted_files(spark, tmp_path):
    """Two parquet drops with drifted schemas read as one table under
    mergeSchema; missing columns become nulls."""
    p = str(tmp_path)
    old = spark.createDataFrame(
        [(1, "click"), (2, "view")], "event_id long, event_type string"
    )
    new = spark.createDataFrame(
        [(3, "click", 1.5)], "event_id long, event_type string, value double"
    )
    old.write.parquet(os.path.join(p, "day=1"))
    new.write.parquet(os.path.join(p, "day=2"))
    merged = spark.read.option("mergeSchema", True).parquet(p)
    assert set(merged.columns) >= {"event_id", "event_type", "value"}
    assert merged.count() == 3
    nulls = merged.filter(F.col("value").isNull()).count()
    assert nulls == 2


def test_union_by_name_with_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], "id long, a string")
    b = spark.createDataFrame([(2, 9.5)], "id long, b double")
    u = a.unionByName(b, allowMissingColumns=True)
    assert set(u.columns) == {"id", "a", "b"}
    assert u.count() == 2
    assert u.filter(F.col("a").isNull()).count() == 1
