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


def read_events_kafka(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka topic → parsed events stream (the reference's native source).

    Same downstream contract as ``read_events_stream`` (file source): every
    window/dedup/state operator in pipeline.py composes unchanged. The
    value payload is the JSON record; ``from_json`` types it JVM-side.
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
    raw = reader.load()
    return raw.select(
        F.from_json(
            F.col("value").cast("string"), EVENTS_STREAM_SCHEMA
        ).alias("r")
    ).select("r.*")
