"""Table loader — the single choke point for fixture schemas (SURVEY §7 Stage 0).

Loads the ten parquet tables the engine is tested against and absorbs the one
schema landmine centrally: ``events.ts`` is Parquet TIMESTAMP(NANOS), which
Spark reads (under ``nanosAsLong=true``) as a bigint of epoch *nanoseconds*.
DuckDB reads the very same column natively as a microsecond TIMESTAMP, so the
loader converts with **integer** division ns→us (``ts DIV 1000``) — floating
division would lose precision at 1.7e18 ns (double has a 53-bit mantissa) and
could flip the microsecond, breaking oracle hashes.

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
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns epoch → µs timestamp; integer division matches DuckDB exactly.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
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
