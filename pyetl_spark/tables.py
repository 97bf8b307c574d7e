"""Table loader — the single choke point for fixture schemas (SURVEY §7 Stage 0).

Loads the ten parquet tables the engine is tested against and absorbs the one
schema landmine centrally: ``events.ts`` has shipped as Parquet
TIMESTAMP(NANOS) (read under ``nanosAsLong=true`` as bigint epoch-nanos →
converted with integer ns→µs division; float division would lose precision at
1.7e18) and as TIMESTAMP(MICROS, isAdjustedToUTC=false) (read by Spark 4 as
TIMESTAMP_NTZ → cast to TIMESTAMP, exact because the session tz is UTC).
Either way DuckDB sees the same microsecond values natively, so oracle hashes
are unaffected by the fixture's storage type.

At 100 TB the loader is where partition discovery, ANALYZE stats, and bucketed
table registration would live; for the fixtures it stays a thin wrapper so
every query compiles to a plain vectorized parquet scan with pushdown intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyetl_spark.session import tune

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, normalizing schema quirks."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # ns epoch → µs timestamp; integer division matches DuckDB exactly.
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        elif ts_type == "timestamp_ntz":
            # Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) → Spark 4 infers
            # TIMESTAMP_NTZ, which unix_micros/window() reject. The session tz
            # is pinned UTC (session.py), so this cast is bit-preserving and
            # lands on the exact micros DuckDB reads natively.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


class Tables:
    """Lazy named access to the fixture tables of one scale-factor dir.

    ``t.lineitem`` etc. return DataFrames; each access builds a fresh scan
    (cheap — plan node only, no data moves) so callers can't accidentally
    share cached plans across queries.
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        tune(spark)  # driver-provided sessions need the confs too
        self._spark = spark
        self._sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLE_NAMES:
            return load_table(self._spark, self._sf_dir, name)
        raise AttributeError(name)

    def register_views(self) -> None:
        """Register every table as a temp view (for spark.sql entry points)."""
        for name in TABLE_NAMES:
            load_table(self._spark, self._sf_dir, name).createOrReplaceTempView(
                name
            )


def load_tables(spark: SparkSession, sf_dir: str) -> Tables:
    return Tables(spark, sf_dir)
