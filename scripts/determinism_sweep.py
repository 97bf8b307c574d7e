#!/usr/bin/env python3
"""Partition-count invariance sweep — every declared query, twice.

Partition-order sensitivity is the #1 way a distributed query silently
diverges from its oracle (double sums reduced in a different order,
collect_list without in-group sort, limits without total order, window
frames over under-specified sorts). The canon sweep catches it only if
the fixture's 32-partition run happens to land on the "wrong" order;
this sweep forces the issue by executing every key under two different
``spark.sql.shuffle.partitions`` settings (32, then 5 — different
reducer counts → different partial-agg grouping and merge order) and
comparing driver-style canon value rows for EXACT equality.

Tier-B keys whose OUTPUT is legitimately run-scoped (fresh scratch
dirs, sketch estimates over resampled state, persisted-index
lifecycles) are checked for schema+rowcount stability instead — listed
explicitly with reasons, not silently skipped.

Usage: python scripts/determinism_sweep.py [--sf DIR] [--only k1,k2]
       [--out FILE]
Exit 0 iff every key is invariant.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark.canon import canon_frame, frame_rows  # noqa: E402

#: keys whose full value set is run-scoped by design — rowcount+schema
#: stability is the right invariant for them.
ROWS_ONLY_INVARIANT = {
    # scratch-dir audits carry wall-clock-ish metadata (file counts ok,
    # but fingerprints span fresh write file splits)
    # sink_compact_small_files left this set in r14: its audit is now
    # (phase, n_files, n_rows, sum_ids) with n_files pinned by the
    # explicit repartition(64) small-files phase and coalesce(1)
    # compaction (n_files=1) — invariant under shuffle settings, so it
    # takes the strict value-hash check.
    # sink_zorder_layout left too (r14): tiles are deterministic
    # equal-height z-runs via the two-phase global rank, not
    # spark_partition_id over sampled range bounds.
    "sink_parquet_partitioned": "read-back file layout differs with writer parallelism",
    "sink_parquet_zstd": "compressed-size audit varies with file splits",
    "sink_orc": "file-layout audit (as parquet twin)",
    "sink_csv": "file-layout audit",
    "sink_json_lines": "file-layout audit",
    "sink_multi": "file-layout audit",
    "sink_bucketed_join": "bucket file counts track writer tasks",
    "sink_schema_evolution": "merged-schema audit over fresh write splits",
    "sink_dpp_partitioned_join": "partition file audit",
    # map_partitions_arrow left this set in r14: its body no longer
    # emits batch statistics — per-row fixed-point revenue is
    # partition-layout invariant, so it takes the strict value check.
    "etl_partition_skew_audit": "reports per-partition row counts — partition count is the subject",
    "text_shard_assign": "shard assignment round-robins over input splits",
    "sample_weighted_topk": "A-ES keys draw from xxhash of (row, partition-stable id) — stable per layout only",
}


def run_key(spark, key, fn, sf_dir):
    df = fn(spark, sf_dir)
    pdf = canon_frame(df.toPandas())
    return frame_rows(pdf), tuple(sorted(pdf.columns)), len(pdf)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default="determinism_sweep.jsonl")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from pyetl_spark import registry

    registry.load_all()
    keys = (
        args.only.split(",")
        if args.only
        else sorted(registry.QUERIES)
    )

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )

    failures = 0
    with open(args.out, "w") as out:
        for i, key in enumerate(keys):
            rec = {"key": key, "status": "pass", "mode": "values"}
            t0 = time.time()
            try:
                spark.conf.set("spark.sql.shuffle.partitions", "32")
                rows_a, cols_a, n_a = run_key(
                    spark, key, registry.QUERIES[key], args.sf
                )
                spark.conf.set("spark.sql.shuffle.partitions", "5")
                rows_b, cols_b, n_b = run_key(
                    spark, key, registry.QUERIES[key], args.sf
                )
                if key in ROWS_ONLY_INVARIANT:
                    rec["mode"] = "schema_rows"
                    rec["reason"] = ROWS_ONLY_INVARIANT[key]
                    ok = cols_a == cols_b and n_a == n_b
                else:
                    ok = rows_a == rows_b and cols_a == cols_b
                if not ok:
                    rec["status"] = "DIVERGED"
                    rec["n_32"], rec["n_5"] = n_a, n_b
                    failures += 1
            except Exception:
                rec["status"] = "error"
                rec["err"] = traceback.format_exc(limit=3)
                failures += 1
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", "32")
            rec["secs"] = round(time.time() - t0, 2)
            out.write(json.dumps(rec) + "\n")
            out.flush()
            tag = "ok  " if rec["status"] == "pass" else "FAIL"
            print(f"[{i + 1}/{len(keys)}] {tag} {rec['status']:9s} {key}",
                  flush=True)
    print(f"done: {failures} failures / {len(keys)} keys")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
