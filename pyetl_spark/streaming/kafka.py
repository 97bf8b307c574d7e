"""Kafka source builder (SURVEY.md §2.9 `stream_source_files` note: the
reference consumes Kafka/MapR-Streams topics; this environment has no
broker and no spark-sql-kafka package, so the builder is availability-gated
— the FILE source in pipeline.py is the tested stand-in, and this module
pins the exact production swap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyetl_spark.streaming.pipeline import EVENTS_STREAM_SCHEMA


def kafka_available(spark: SparkSession) -> bool:
    """True if the spark-sql-kafka connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


#: The fixed schema spark-sql-kafka emits for every topic — any stand-in
#: source used in tests must produce exactly this shape so the parse stage
#: is exercised against the real wire contract.
KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def parse_kafka_values(raw: DataFrame) -> DataFrame:
    """Kafka wire records → typed events (the stage after ``.load()``).

    Factored out of ``read_events_kafka`` so the parse contract is
    testable WITHOUT a broker: feed any DataFrame with
    ``KAFKA_WIRE_SCHEMA`` (tests build one from the events fixture) and
    the downstream is byte-for-byte what a real topic would produce. The
    value payload is the JSON record; ``from_json`` types it JVM-side —
    no Python boundary, scales as a narrow map."""
    return raw.select(
        F.from_json(
            F.col("value").cast("string"), EVENTS_STREAM_SCHEMA
        ).alias("r")
    ).select("r.*")


def read_events_kafka(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka topic → parsed events stream (the reference's native source).

    Same downstream contract as ``read_events_stream`` (file source): every
    window/dedup/state operator in pipeline.py composes unchanged.
    """
    if not kafka_available(spark):
        raise NotImplementedError(
            "spark-sql-kafka connector not on the classpath in this "
            "environment; use read_events_stream (file source) — the "
            "operator pipeline is identical downstream"
        )
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option(
            "maxOffsetsPerTrigger", max_offsets_per_trigger
        )
    return parse_kafka_values(reader.load())
