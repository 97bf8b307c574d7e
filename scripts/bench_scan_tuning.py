"""Scan-parallelism experiment: `spark.sql.files.maxPartitionBytes` vs
wall time on a scan-dominated aggregate (Q1 pricing-summary shape) at sf1.

What the measurement actually showed (and the docstring now records,
because the naive story was WRONG): Spark's split size is
max(openCostInBytes, min(maxPartitionBytes, totalBytes/defaultParallelism))
— the bytesPerCore term means a single 73 MB file is ALREADY split into
~18 tasks on a 32-core box under the 128 MB default; no knob needed for
small-input parallelism. Measured: 18 scan tasks at 128 MB, 16 MB and
4 MB alike, wall time flat within run noise (0.35/0.32/0.29 s). The
knob's real job at 100 TB is the opposite end: CAPPING per-task input so
a task's columnar batches + shuffle write fit executor memory; the floor
(openCostInBytes) keeps tiny-file fan-out from degenerating into
per-file tasks. Conclusion recorded in SCALE.md: leave the default
unless tasks spill — parallelism on small inputs is automatic.

Prints one JSON line; numbers land in SCALE.md.
Run: python scripts/bench_scan_tuning.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pyetl_spark.parity import fxp


def q1_shape(spark: SparkSession, sf_dir: str):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(fxp(F.col("l_extendedprice"), 100)).alias("sum_base_cents"),
            F.count("*").alias("n"),
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for label, nbytes in [
        ("128MB_default", 128 * 1024 * 1024),
        ("16MB", 16 * 1024 * 1024),
        ("4MB", 4 * 1024 * 1024),
    ]:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(nbytes))
        df = q1_shape(spark, sf_dir)
        post_agg_tasks = df.rdd.getNumPartitions()
        scan_tasks = spark.read.parquet(
            f"{sf_dir}/lineitem.parquet"
        ).rdd.getNumPartitions()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            q1_shape(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        results[label] = {
            "scan_tasks": scan_tasks,
            "post_agg_tasks": post_agg_tasks,
            "best_secs": round(best, 3),
        }
    base = results["128MB_default"]["best_secs"]
    for v in results.values():
        v["speedup_vs_default"] = round(base / v["best_secs"], 2)
    print(json.dumps({"experiment": "maxPartitionBytes", "sf_dir": sf_dir,
                      "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
