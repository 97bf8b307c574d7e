"""Structured Streaming operators (SURVEY.md §2.9 Tier C).

The reference is a poll-loop Kafka/MapR-Streams consumer (SURVEY §3.1):
poll → json.loads → enrich → buffer → atomic-rename file land → offset
commit. Structured Streaming replaces every one of those hand-rolled pieces
with engine-managed equivalents: offset WAL (exactly-once source ledger),
incremental plans, executor-local state stores with watermark GC, and
idempotent sink commit logs.

A file-arrival JSON source stands in for the Kafka topic in this
environment (no broker); swapping `format("json")` for `format("kafka")` +
`from_json(value, schema)` is the only change a production deployment needs
(SURVEY §2.1 `stream_source_files`).

Batch analogs of every aggregation here are Tier-A oracle-checked in
pyetl_spark/queries/events_windows.py; these streaming versions are
pytest-verified with deterministic file-fed micro-batches
(tests/test_streaming.py) — never wall-clock triggers.
"""

from pyetl_spark.streaming.pipeline import (
    EVENTS_STREAM_SCHEMA,
    dedup_within_watermark,
    foreach_batch_multi_sink,
    read_events_stream,
    session_agg,
    sliding_agg,
    stateful_anomaly_counter,
    stream_scd2_enrich,
    stream_static_enrich,
    stream_stream_interval_join,
    stream_stream_interval_join_outer,
    tumbling_agg,
)
from pyetl_spark.streaming.state_inspect import state_metadata, state_rows

__all__ = [
    "EVENTS_STREAM_SCHEMA",
    "read_events_stream",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "dedup_within_watermark",
    "stateful_anomaly_counter",
    "stream_static_enrich",
    "stream_scd2_enrich",
    "foreach_batch_multi_sink",
    "stream_stream_interval_join",
    "stream_stream_interval_join_outer",
    "state_metadata",
    "state_rows",
]
