"""Source connectors (SURVEY.md §2.1; reference capability core).

The reference consumes JSON records from streaming topics and tolerates
dirty payloads (SURVEY §3.1 — a poll-loop ETL tool lives or dies on bad
input). json_ingest provides the batch + streaming readers with explicit
malformed-record policies; parquet scanning lives in tables.py (fixture
loader) since it's schema-pinned.
"""

from pyetl_spark.sources.json_ingest import (
    read_json_dropping_malformed,
    read_json_failfast,
    read_json_with_corrupt_capture,
    split_clean_and_quarantine,
)

__all__ = [
    "read_json_with_corrupt_capture",
    "read_json_dropping_malformed",
    "read_json_failfast",
    "split_clean_and_quarantine",
]
