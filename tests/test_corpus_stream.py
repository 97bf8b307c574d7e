"""Streaming corpus-ingest tests (streaming twin of the batch flagship
pipeline_training_corpus): quality gate parity with the batch scorer,
within-watermark content dedup, accept/quarantine multi-sink."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from pyetl_spark.operators import text as TX
from pyetl_spark.streaming.corpus import (
    read_docs_stream,
    run_corpus_ingest,
    score_and_gate,
)

TS = "2024-03-01T{h:02d}:{m:02d}:00.000Z"

GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "to find some interesting data in the big forest near the old river"
)
JUNK = "x x x x x"


def _doc(i, h=9, m=0, text=GOOD, lang="en", source="web"):
    return {
        "doc_id": i,
        "ingest_ts": TS.format(h=h, m=m),
        "text": text,
        "lang": lang,
        "source": source,
    }


def _write(dirpath, name, docs):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as fh:
        for d in docs:
            fh.write(json.dumps(d) + "\n")


def test_gate_matches_batch_scorer(spark, tmp_path):
    """Streaming quality == batch quality on identical text (same JVM
    expression, two execution modes)."""
    src = os.path.join(str(tmp_path), "src")
    docs = [_doc(1), _doc(2, text=JUNK), _doc(3, lang="zz")]
    _write(src, "b.json", docs)
    scored = score_and_gate(read_docs_stream(spark, src))
    q = (
        scored.writeStream.format("memory")
        .queryName("gate_out")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r for r in spark.sql("SELECT * FROM gate_out").collect()}
    assert got[1]["reject_reason"] is None
    assert got[2]["reject_reason"] == "low_quality"
    assert got[3]["reject_reason"] == "lang_not_allowed"
    batch = spark.createDataFrame([(GOOD,)], "text string").select(
        TX.quality_score(F.col("text"), F.split("text", " ")).alias("q")
    )
    assert abs(got[1]["quality"] - batch.collect()[0]["q"]) < 1e-12


def test_ingest_dedups_and_splits_sinks(spark, tmp_path):
    base = str(tmp_path)
    src = os.path.join(base, "src")
    corpus = os.path.join(base, "corpus")
    quarantine = os.path.join(base, "quarantine")
    # doc 2 repeats doc 1's content inside the watermark → deduped;
    # doc 4 is junk → quarantined with reason
    docs = [
        _doc(1, m=0),
        _doc(2, m=5),                      # same text as 1 → dropped
        _doc(3, m=10, text=GOOD + " extra tokens here"),
        _doc(4, m=15, text=JUNK),
    ]
    _write(src, "b1.json", docs)
    q = run_corpus_ingest(
        spark, src, corpus, quarantine, os.path.join(base, "ck")
    )
    q.awaitTermination(120)

    kept = spark.read.parquet(corpus)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3]
    # lang partitioning survives the sink
    assert kept.select("lang").distinct().collect()[0]["lang"] == "en"

    quar = spark.read.parquet(quarantine)
    rows = {r["doc_id"]: r["reject_reason"] for r in quar.collect()}
    assert rows == {4: "low_quality"}


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch's delivery contract is at-least-once: after a crash
    between the checkpoint commit and the sink writes, the SAME batch_id
    is re-run. The per-batch dynamic partition overwrite must make that
    replay a no-op — same rows, not doubled rows."""
    from pyetl_spark.streaming.corpus import write_corpus_batch

    base = str(tmp_path)
    corpus = os.path.join(base, "corpus")
    quarantine = os.path.join(base, "quarantine")
    batch = spark.createDataFrame(
        [
            (1, GOOD, "en", "web", 0.9, None),
            (2, JUNK, "en", "web", 0.1, "low_quality"),
        ],
        "doc_id long, text string, lang string, source string, "
        "quality double, reject_reason string",
    )
    for _ in range(3):  # crash-replay the same epoch three times
        write_corpus_batch(batch, 7, corpus, quarantine)
    kept = spark.read.parquet(corpus)
    assert [r["doc_id"] for r in kept.collect()] == [1]
    assert kept.collect()[0]["batch_id"] == 7
    quar = spark.read.parquet(quarantine).collect()
    assert [r["doc_id"] for r in quar] == [2]


def test_restart_resumes_without_duplicates(spark, tmp_path):
    """Kill/restart contract: stop the ingest after part 1, restart the
    SAME checkpoint with part 2 present — the accept sink must contain
    each doc exactly once (no re-processing of part 1, no holes)."""
    base = str(tmp_path)
    src = os.path.join(base, "src")
    corpus = os.path.join(base, "corpus")
    quarantine = os.path.join(base, "quarantine")
    ck = os.path.join(base, "ck")

    _write(src, "part1.json", [_doc(1, m=0), _doc(2, m=5, text=GOOD + " v2")])
    q = run_corpus_ingest(spark, src, corpus, quarantine, ck)
    q.awaitTermination(120)
    q.stop()  # simulated shutdown (availableNow already drained part 1)

    _write(src, "part2.json", [_doc(3, m=10, text=GOOD + " v3"),
                               _doc(4, m=15, text=GOOD + " v2")])  # dup of 2
    q2 = run_corpus_ingest(spark, src, corpus, quarantine, ck)
    q2.awaitTermination(120)

    kept = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    # 1,2 from run 1; 3 from run 2; 4 dropped — its content already
    # admitted within the watermark state persisted in the checkpoint
    assert kept == [1, 2, 3]


def test_latest_codes_parameterized_columns(spark):
    """latest_codes id_col/batch_col parameters (r14, r13 ADVICE): a
    projected/renamed ingest table resolves newest-generation rows
    through the caller's names, and the defaults stay what
    encode_vectors_batch writes."""
    from pyspark.sql import functions as F

    from pyetl_spark.streaming.corpus import latest_codes

    renamed = spark.createDataFrame(
        [(1, 0, 10), (1, 0, 11), (1, 1, 12), (2, 0, 13)],
        "vid long, gen long, code long",
    )
    out = latest_codes(renamed, id_col="vid", batch_col="gen")
    assert sorted((r["vid"], r["code"]) for r in out.collect()) == [
        (1, 12),
        (2, 13),
    ]
    assert "gen" not in out.columns
    # defaults unchanged: the written schema's (id, batch_id)
    default_named = renamed.select(
        F.col("vid").alias("id"),
        F.col("gen").alias("batch_id"),
        "code",
    )
    assert latest_codes(default_named).count() == 2
