#!/usr/bin/env python3
"""Streaming-ingest throughput bench — the number the reference actually
competes on. The reference is a single-process JSON consumer (poll →
json.loads → enrich → buffered file write); its ceiling is one Python
core parsing JSON row-at-a-time, i.e. order 10-50k rows/s. This measures
our streaming twin end-to-end on the same machine: JSON-lines files →
quality gate → within-watermark content dedup → accept/quarantine
idempotent multi-sink (streaming/corpus.py), JVM-parallel all the way.

Prints one JSON line:
  {"metric": "stream_ingest_rows_per_sec", "value": N, ...}

Usage: python scripts/bench_stream.py [--rows 200000] [--files 32]
Derives its corpus from $SPARK_GRAFT_SF_DIR (default sf0.1) documents,
replicated with fresh doc_ids/timestamps to the requested row count so
dedup state sees realistic text, and measures wall time of the
availableNow run (micro-batched by maxFilesPerTrigger to exercise
multi-batch state, not one giant batch).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--files", type=int, default=32)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pyetl_spark.session import get_session
    from pyetl_spark.streaming.corpus import run_corpus_ingest
    from pyetl_spark.tables import load_table

    spark = get_session("bench-stream")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = tempfile.mkdtemp(prefix="bench_stream_")
    src = os.path.join(base, "src")

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    copies = max(1, args.rows // n_docs)
    # replicate with distinct doc_ids, a synthetic ingest-time ramp, AND
    # per-copy distinct text (gen_sf1.py's replication pattern): without
    # the text prefix every copy shares one content hash and the dedup
    # stage drops (copies-1)/copies of the feed — the bench would then
    # measure the drop path, not an ingest that lands data. The fixture's
    # own intra-corpus dup rate still flows through unchanged.
    feed = (
        docs.crossJoin(
            spark.range(copies).withColumnRenamed("id", "copy")
        )
        .select(
            (F.col("doc_id") + F.col("copy") * F.lit(n_docs)).alias("doc_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + F.col("doc_id") + F.col("copy")
            ).alias("ingest_ts"),
            F.concat(
                F.lit("r"), F.col("copy").cast("string"), F.lit("_"),
                F.col("text"),
            ).alias("text"),
            "lang",
            "source",
        )
    )
    n_rows = n_docs * copies
    feed.repartition(args.files).write.mode("overwrite").json(src)

    results = []
    for run in range(args.runs):
        corpus = os.path.join(base, f"corpus_{run}")
        quarantine = os.path.join(base, f"quarantine_{run}")
        ckpt = os.path.join(base, f"ckpt_{run}")
        t0 = time.time()
        q = run_corpus_ingest(
            spark, src, corpus, quarantine, ckpt,
            max_files_per_trigger=max(1, args.files // 4),
        )
        q.awaitTermination()
        wall = time.time() - t0
        landed = spark.read.parquet(corpus).count()
        quarantined = spark.read.parquet(quarantine).count()
        results.append((wall, landed, quarantined))

    best = min(results, key=lambda r: r[0])
    wall, landed, quarantined = best
    shutil.rmtree(base, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "stream_ingest_rows_per_sec",
                "value": round(n_rows / wall, 1),
                "unit": "rows/sec",
                "rows_in": n_rows,
                "files": args.files,
                "wall_sec": round(wall, 2),
                "accepted": landed,
                "quarantined": quarantined,
                "runs": args.runs,
                "reference_posture": (
                    "single-process row-at-a-time JSON consumer; "
                    "this path is JVM-parallel with bounded dedup state"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
