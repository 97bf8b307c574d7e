"""Engine-side Spark 4 VARIANT tests (SURVEY.md §1.2: VARIANT is the
engine-side home for dynamic JSON). Oracle-checked VARIANT coverage now
ALSO exists — `source_json_variant` / `sink_parquet_variant` hash-match
DuckDB by synthesizing deterministic payloads on both engines; these tests
keep the semantics that oracles can't express (heterogeneous shapes,
variant dtype surfacing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyetl_spark.tables import load_tables
from tests.conftest import SF_ORACLE


def test_parse_json_to_variant_and_extract(spark):
    ev = load_tables(spark, SF_ORACLE).events.limit(200)
    v = ev.select(
        "event_id", F.parse_json(F.col("props")).alias("var")
    )
    assert dict(v.dtypes)["var"] == "variant"
    out = v.select(
        "event_id",
        F.try_variant_get(F.col("var"), "$.k", "int").alias("k"),
    )
    rows = out.collect()
    assert all(r["k"] is not None for r in rows)
    # agrees with the string-path extraction
    expect = {
        r["event_id"]: int(r["k"])
        for r in ev.select(
            "event_id", F.get_json_object("props", "$.k").alias("k")
        ).collect()
    }
    for r in rows:
        assert expect[r["event_id"]] == r["k"]


def test_variant_handles_heterogeneous_payloads(spark):
    """Schema-on-read: one VARIANT column absorbs differently-shaped JSON
    objects — the reference's dynamic-fields model without a declared
    schema (SURVEY §1.1)."""
    df = spark.createDataFrame(
        [
            (1, '{"k": 1}'),
            (2, '{"k": {"nested": true}}'),
            (3, '[1, 2, 3]'),
            (4, '"plain string"'),
        ],
        "id long, payload string",
    )
    v = df.select("id", F.parse_json("payload").alias("var"))
    kinds = {
        r["id"]: r["t"]
        for r in v.select(
            "id", F.expr("schema_of_variant(var)").alias("t")
        ).collect()
    }
    assert kinds[1].startswith("OBJECT") or "BIGINT" in kinds[1]
    assert kinds[3].startswith("ARRAY")
