"""Scans / sources (SURVEY.md §2.1 Tier A rows).

The reference's core capability is "read JSON records, enrich, write to
multiple destinations" (SURVEY §0, driver characterization). Batch scans are
plain vectorized parquet reads; `source_json_parse` rebases the JSON-ingest
path onto the `events.props` payload column. Sinks live in sinks.py (Tier B);
the streaming file source is Tier C (tests/test_streaming.py).

Scale note: `.select` right after `spark.read.parquet` prunes columns at the
reader (ReadSchema), and comparison predicates reach the parquet row-group
stats as PushedFilters — both verified via .explain in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyetl_spark.registry import query
from pyetl_spark.tables import load_tables


@query(
    "scan_parquet_project",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
    """,
)
def scan_parquet_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection-only scan (SURVEY §2.1 `scan_parquet_project`): ReadSchema
    carries exactly three columns; the other three never leave the file."""
    o = load_tables(spark, sf_dir).orders
    return o.select("o_orderkey", "o_custkey", "o_orderstatus")


@query(
    "scan_pushdown_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2001-06-01 00:00:00' AND l_quantity >= 49
    """,
)
def scan_pushdown_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective predicate scan (SURVEY §2.1 `scan_pushdown_filter`): both
    conjuncts appear as PushedFilters → row-group min/max skipping, the
    mechanism that matters at 100 TB."""
    li = load_tables(spark, sf_dir).lineitem
    return li.filter(
        (F.col("l_shipdate") >= F.lit("2001-06-01").cast("timestamp"))
        & (F.col("l_quantity") >= 49)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


@query(
    "source_json_parse",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract(props, '$.k') AS INT) AS k,
           CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INT) IS NOT NULL
    """,
)
def source_json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload ingestion (SURVEY §2.1 `source_json_parse`) — the
    reference's "parse each JSON record into typed fields" step as a typed
    `from_json` over the props column. JVM-side JSON parser, no Python."""
    ev = load_tables(spark, sf_dir).events
    parsed = ev.withColumn(
        "_p", F.from_json("props", T.StructType([T.StructField("k", T.IntegerType())]))
    )
    return (
        parsed.select(
            "event_id",
            "event_type",
            F.col("_p.k").alias("k"),
            F.pmod(F.col("_p.k"), F.lit(10)).cast("int").alias("k_bucket"),
        )
        .filter(F.col("k").isNotNull())
    )
