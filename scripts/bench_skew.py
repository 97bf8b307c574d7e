"""Skew experiment: plain shuffle join vs salted_join on a hot key.

Builds a synthetic skewed fact (N rows, `frac_hot` of them on ONE key)
joined to a small dim, with broadcast disabled so the join must shuffle
(the regime where skew actually hurts — a broadcast join is skew-immune
and is always the first choice when the dim fits).

Three runs: plain join with AQE skew-split ON, plain with AQE OFF, and
plans.salted_join (AQE on). Prints one JSON line; numbers land in
SCALE.md. Run: python scripts/bench_skew.py [rows] [frac_hot]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    frac_hot = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_keys = 1000
    # deterministic skew: first frac_hot of ids → key 0, rest spread
    fact = spark.range(rows).select(
        F.when(F.col("id") < int(rows * frac_hot), F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
        .cast("long")
        .alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    fact.write.mode("overwrite").parquet("/tmp/skew_fact")
    dim.write.mode("overwrite").parquet("/tmp/skew_dim")
    fact = spark.read.parquet("/tmp/skew_fact")
    dim = spark.read.parquet("/tmp/skew_dim")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def timed(fn):
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t0)
        return round(best, 2)

    def plain():
        fact.join(dim, "k").agg(F.sum("v")).collect()

    def salted():
        from pyetl_spark.plans import salted_join

        salted_join(fact, dim, key="k", salt_buckets=32).agg(
            F.sum("v")
        ).collect()

    out = {}
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    out["plain_aqe_on"] = timed(plain)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    out["plain_aqe_off"] = timed(plain)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    out["salted_aqe_on"] = timed(salted)
    out["rows"] = rows
    out["frac_hot"] = frac_hot
    print(json.dumps(out))


def minhash_skew() -> None:
    """Adversarial-skew scaling probe for minhash_dedup_assign: a corpus
    that is 90% ONE near-identical cluster, at two sizes. If the edge
    construction is linear (star + salted chain, never the in-bucket
    clique or a whole-bucket window sort), doubling n should roughly
    double wall time and the edge count stays ≤ ~2·bands·n.

    Run: python scripts/bench_skew.py --minhash [n1] [n2]
    """
    n1 = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    n2 = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyetl_spark.operators.minhash import (
        _banded,
        _candidate_edges,
        minhash_dedup_assign,
    )

    bands = 8
    out = {"bands": bands, "frac_hot": 0.9}
    for tag, n in (("n1", n1), ("n2", n2)):
        base = [f"w{j}" for j in range(50)]
        rows = [
            (i, base + [f"u{i}"])
            if i < int(n * 0.9)
            else (i, [f"d{i}_{j}" for j in range(30)])
            for i in range(n)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, tokens array<string>"
        ).repartition(32)
        edges = _candidate_edges(
            _banded(docs, "doc_id", "tokens", 32, bands, 42)
        ).count()
        t0 = time.monotonic()
        minhash_dedup_assign(
            docs, threshold=0.8, num_hashes=32, bands=bands
        ).count()
        out[tag] = {
            "n": n,
            "edges": edges,
            "edge_bound": 2 * bands * n,
            "secs": round(time.monotonic() - t0, 2),
        }
    out["time_ratio"] = round(out["n2"]["secs"] / out["n1"]["secs"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--minhash":
        minhash_skew()
    else:
        main()
