"""Robust JSON ingestion (SURVEY.md §2.1 `source_json_parse` hardened; the
reference's core read path with explicit dirty-data policy).

Spark's JSON reader has three malformed-record modes; an ETL engine must
expose all three deliberately, not default silently:

- PERMISSIVE + columnNameOfCorruptRecord: bad lines survive as NULL-typed
  rows with the raw text captured — the quarantine pattern (the reference's
  analog: log-and-continue on json.loads failure).
- DROPMALFORMED: bad lines vanish (lossy; only for exploratory reads).
- FAILFAST: first bad line kills the job (for contracts that must hold).

At 100 TB: always pin the schema (schema inference is a full extra pass of
the corpus) and quarantine rather than drop — reprocessing a quarantine
table is cheap, re-scanning 100 TB to find what vanished is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_field(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_json_with_corrupt_capture(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """PERMISSIVE read: malformed lines become rows whose typed columns are
    NULL and whose raw text lands in `_corrupt_record`."""
    return (
        spark.read.schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_json_dropping_malformed(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """DROPMALFORMED read: bad lines silently removed."""
    return (
        spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
    )


def read_json_failfast(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """FAILFAST read: any malformed line raises on action."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def split_clean_and_quarantine(
    df: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Split a corrupt-captured frame into (clean, quarantine).

    Quarantine keeps only the raw text + ingest metadata — the minimal
    replayable record (re-parse later with a fixed schema/parser).

    The frame is cached first: Spark refuses queries that reference only
    the corrupt-record column of a raw JSON scan (the documented
    workaround is to materialize the parse once).
    """
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw"),
        F.current_timestamp().alias("quarantined_at"),
    )
    return clean, quarantine
