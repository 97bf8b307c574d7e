"""Dirty-JSON ingestion tests (SURVEY.md §2.1; the reference's core read
path must tolerate malformed records deliberately, not accidentally)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from pyetl_spark.sources import (
    read_json_dropping_malformed,
    read_json_failfast,
    read_json_with_corrupt_capture,
    split_clean_and_quarantine,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

GOOD = ['{"event_id": 1, "event_type": "click", "value": 1.5}',
        '{"event_id": 2, "event_type": "view", "value": 2.0}']
BAD = ['{"event_id": 3, "event_type": "click", "value": ',  # truncated
       'not json at all']


@pytest.fixture
def dirty_file(tmp_path):
    p = os.path.join(str(tmp_path), "dirty.json")
    with open(p, "w") as f:
        f.write("\n".join(GOOD + BAD) + "\n")
    return p


def test_permissive_captures_corrupt_records(spark, dirty_file):
    df = read_json_with_corrupt_capture(spark, dirty_file, SCHEMA)
    clean, quarantine = split_clean_and_quarantine(df)
    assert clean.count() == 2
    assert quarantine.count() == 2
    raws = [r["raw"] for r in quarantine.collect()]
    assert "not json at all" in raws
    # clean side parses fully typed
    ids = sorted(r["event_id"] for r in clean.collect())
    assert ids == [1, 2]


def test_dropmalformed_silently_removes(spark, dirty_file):
    df = read_json_dropping_malformed(spark, dirty_file, SCHEMA)
    assert df.count() == 2


def test_failfast_raises(spark, dirty_file):
    with pytest.raises(Exception) as exc:
        read_json_failfast(spark, dirty_file, SCHEMA).collect()
    assert "Malformed" in str(exc.value) or "FAILFAST" in str(exc.value)
