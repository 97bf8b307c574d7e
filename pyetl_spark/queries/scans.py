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


@query(
    "source_json_corrupt_records",
    oracle="""
    WITH fed AS (
      SELECT event_type,
             CASE WHEN event_id % 13 = 0 THEN '{' || props
                  WHEN event_id % 17 = 0 THEN 'not-json'
                  ELSE props END AS payload
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (WHERE NOT json_valid(payload)) AS BIGINT)
             AS n_quarantined,
           CAST(count(*) FILTER (WHERE json_valid(payload)) AS BIGINT)
             AS n_parsed,
           CAST(sum(CASE WHEN json_valid(payload)
                    THEN CAST(json_extract(payload, '$.k') AS INT) END)
                AS BIGINT) AS sum_k
    FROM fed GROUP BY event_type
    """,
)
def source_json_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-JSON ingestion with dead-lettering — the reference's consumer
    loop meets real feeds: records that fail to parse must be counted and
    quarantined, never dropped silently or allowed to kill the job.

    The fixture's props are all valid, so malformedness is injected
    deterministically (event_id % 13 → truncated-brace prefix, % 17 →
    non-JSON text; both engines corrupt identically, so the oracle is
    exact). Spark-side validity is `get_json_object(payload, '$.k') IS
    NOT NULL` — the JVM parser returns NULL on malformed input, and every
    genuine fixture payload carries `k`, so null ⇔ quarantine (DuckDB
    spells the same split with json_valid; its json_extract ERRORS on
    malformed input rather than returning NULL, hence the CASE guard
    there). The full pipeline form would route `n_quarantined` rows to a
    dead-letter sink (sink_multi's second leg) with the raw payload
    preserved for replay; at 100 TB this classification is a pure
    map-side expression — no shuffle beyond the final aggregate."""
    ev = load_tables(spark, sf_dir).events
    payload = (
        F.when(F.col("event_id") % 13 == 0, F.concat(F.lit("{"), F.col("props")))
        .when(F.col("event_id") % 17 == 0, F.lit("not-json"))
        .otherwise(F.col("props"))
    )
    k = F.get_json_object(payload, "$.k").cast("int")
    fed = ev.select("event_type", k.alias("k"))
    return fed.groupBy("event_type").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(F.col("k").isNull(), 1)).alias("n_quarantined"),
        F.count(F.when(F.col("k").isNotNull(), 1)).alias("n_parsed"),
        F.sum("k").cast("bigint").alias("sum_k"),
    )


@query(
    "source_csv_roundtrip_typed",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 3 = 0
    """,
)
def source_csv_roundtrip_typed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Typed CSV SOURCE fidelity (the reference's flat-file ingest path):
    write an orders slice to CSV, read it back with an EXPLICIT schema +
    pinned timestamp format, and hash-match against the original rows —
    the oracle is the identity query, so the hash equality IS the
    roundtrip-fidelity proof (doubles survive via shortest-repr
    round-tripping; timestamps via the pinned format; strings via
    quoting). Schema inference is deliberately NOT used: inferSchema
    costs an extra full scan and can demote types on dirty data — an
    explicit DDL schema is the production contract.

    Scale: CSV write/read parallelize per partition like any source; the
    roundtrip here is fixture-sized scratch. The lesson that matters at
    100 TB is the pinned schema + format options, not the medium."""
    import os

    from pyetl_spark.queries.sinks import _scratch

    path = _scratch("csv_roundtrip")
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    # fixture timestamps are TIMESTAMP_NTZ — the NTZ format option is the
    # one that applies (timestampFormat alone is silently ignored for NTZ
    # columns: the write falls back to ISO-8601 and the typed read then
    # nulls every value — caught by the identity oracle on first run)
    ts_fmt = "yyyy-MM-dd HH:mm:ss"
    src = (
        load_tables(spark, sf_dir)
        .orders.filter(F.col("o_orderkey") % 3 == 0)
        .select(cols)
    )
    (
        src.write.mode("overwrite")
        .option("header", True)
        .option("timestampNTZFormat", ts_fmt)
        .csv(path)
    )
    schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, "
        "o_orderpriority string"
    )
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("timestampNTZFormat", ts_fmt)
        .csv(path)
        .select(cols)
    )
