"""Offline inspection of Structured Streaming state (Spark 4 state data
source) — the observability half of the stateful operators in pipeline.py.

The reference's long-running consumers accumulate per-key state; when one
misbehaves in production the operational question is always "what is the
state RIGHT NOW for key X?". Spark 4 answers it without touching the running
query: the checkpoint's state store is directly readable as a DataFrame via
the `statestore` format (per-key rows) and the `state-metadata` format
(which operators exist, their partition counts and batch range). Both are
plain batch reads — joinable, filterable, writable to a debug sink.

Scale posture: the state read fans out one task per state-store partition
(the same `numPartitions` the query ran with), so inspecting a 10k-partition
production checkpoint parallelizes like any other scan; predicate pushdown
on `partition_id` limits the read to the suspect partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Operator-level map of a checkpoint: operatorId/operatorName,
    stateStoreName, numPartitions, [minBatchId, maxBatchId]."""
    return spark.read.format("state-metadata").load(checkpoint)


def state_rows(
    spark: SparkSession,
    checkpoint: str,
    *,
    operator_id: int = 0,
    store_name: str | None = None,
    batch_id: int | None = None,
) -> DataFrame:
    """Per-key state rows (`key` struct, `value` struct, `partition_id`)
    for one stateful operator; `batch_id` time-travels to the state AS OF
    that micro-batch (default: latest committed)."""
    r = (
        spark.read.format("statestore")
        .option("path", checkpoint)
        .option("operatorId", operator_id)
    )
    if store_name is not None:
        r = r.option("storeName", store_name)
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    return r.load()
