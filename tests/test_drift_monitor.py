"""Streaming PSI drift monitor (pyetl_spark/streaming/drift.py, Tier C):
stable traffic scores low, shifted traffic trips the alert, replay is
idempotent, and the PSI math matches a hand fold."""

from __future__ import annotations

import json
import math
import os
import shutil

import pytest

from pyetl_spark.streaming.drift import (
    PSI_ALERT,
    psi,
    psi_foreach_batch,
    reference_histogram,
    start_drift_monitor,
)
from pyetl_spark.streaming.pipeline import read_events_stream


@pytest.fixture
def scratch(tmp_path):
    yield str(tmp_path)
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def _rows(vals, start_id=0):
    return [
        {
            "event_id": start_id + i,
            "ts": "2024-01-01T00:00:%02d.000Z" % (i % 60),
            "user_id": i % 7,
            "event_type": "view",
            "value": float(v),
        }
        for i, v in enumerate(vals)
    ]


def _write_batch(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_psi_hand_fold():
    ref = [10, 20, 30, 40]
    same = [100, 200, 300, 400]  # same shape, 10x volume → ~0
    assert abs(psi(ref, same)) < 0.01
    shifted = [40, 30, 20, 10]
    rt, ct = sum(ref) + 4, sum(shifted) + 4
    want = sum(
        ((c + 1) / ct - (r + 1) / rt)
        * math.log(((c + 1) / ct) / ((r + 1) / rt))
        for r, c in zip(ref, shifted)
    )
    assert psi(ref, shifted) == pytest.approx(want)
    assert psi(ref, shifted) > PSI_ALERT


def test_psi_misaligned_buckets_rejected():
    with pytest.raises(ValueError):
        psi([1, 2], [1, 2, 3])


def test_reference_histogram_buckets_and_overflow(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in [-5.0, 0.0, 5.0, 50.0, 99.9, 100.0, 200.0]],
        "value double",
    )
    counts = reference_histogram(df, "value", 0.0, 100.0, n_buckets=10)
    assert len(counts) == 12
    assert counts[0] == 1          # -5 underflows
    assert counts[11] == 2         # 100.0 and 200.0 overflow
    assert sum(counts) == 7


def test_drift_monitor_alerts_on_shift_not_on_stable(spark, scratch):
    """Reference ~ Uniform[0,100); batch 1 the same → low PSI; batch 2
    shifted mass → alert. availableNow drains each wave separately."""
    src = os.path.join(scratch, "src")
    ledger = os.path.join(scratch, "ledger")
    ck = os.path.join(scratch, "ck")

    ref_vals = [(i * 37 % 1000) / 10.0 for i in range(1000)]  # ~uniform
    ref_df = spark.createDataFrame([(float(v),) for v in ref_vals],
                                   "value double")
    ref = reference_histogram(ref_df, "value", 0.0, 100.0)

    # wave 1: same generator, disjoint ids → stable
    _write_batch(src, "w1.json", _rows([(i * 53 % 1000) / 10.0
                                        for i in range(1000)]))
    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    q = start_drift_monitor(
        stream, "value", 0.0, 100.0, ref, ledger, ck
    )
    q.awaitTermination(120)

    # wave 2: values squeezed into [80, 100) → mass crosses edges
    _write_batch(src, "w2.json",
                 _rows([80.0 + (i % 200) / 10.0 for i in range(1000)],
                       start_id=10_000))
    stream2 = read_events_stream(spark, src, max_files_per_trigger=1)
    q2 = (
        stream2.writeStream.foreachBatch(
            psi_foreach_batch("value", 0.0, 100.0, ref, ledger)
        )
        .option("checkpointLocation", os.path.join(ck, "psi"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    rows = {
        r["batch_id"]: r
        for r in spark.read.parquet(ledger).collect()
    }
    assert len(rows) >= 2
    first = rows[min(rows)]
    last = rows[max(rows)]
    assert first["n_rows"] == 1000
    assert first["psi"] < 0.1, first["psi"]          # stable
    assert not first["drift_alert"]
    assert last["psi"] > PSI_ALERT, last["psi"]      # shifted
    assert last["drift_alert"]


def test_drift_ledger_replay_idempotent(spark, scratch):
    """Re-running a batch_id overwrites its partition — the ledger never
    double-counts a replayed micro-batch (corpus.py discipline)."""
    ledger = os.path.join(scratch, "ledger")
    ref = [10] * 22
    fn = psi_foreach_batch("value", 0.0, 100.0, ref, ledger)
    df = spark.createDataFrame([(float(i),) for i in range(100)],
                               "value double")
    fn(df, 7)
    fn(df, 7)  # replay same batch id
    rows = spark.read.parquet(ledger).collect()
    assert len(rows) == 1
    assert rows[0]["batch_id"] == 7
