#!/usr/bin/env python3
"""Quickstart: the engine as a LIBRARY (not through the query registry).

Five minutes of the surfaces a user coming from the reference actually
wires together: session, declarative pipeline, as-of join, near-dup
clustering, distinct sketches, and a streaming ingest. Runs end-to-end
on the sf0.001 fixtures:

    python examples/quickstart.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from pyetl_spark.session import get_session
from pyetl_spark.tables import load_tables

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_session("quickstart")
    t = load_tables(spark, SF)

    # 1 — plain DataFrame analytics (everything Catalyst can see stays JVM)
    top = (
        t.orders.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("rev"))
        .orderBy(F.desc("rev"))
    )
    print("orders by priority:")
    top.show(truncate=False)

    # 2 — as-of join: each event matched to the latest prior event of
    # the same user (feature lookup without equality on time)
    from pyetl_spark.operators.asof import asof_join

    ev = t.events.select("user_id", "ts", "event_type", "value")
    priced = asof_join(
        ev.select("user_id", "ts", "event_type"),
        ev.select("user_id", F.col("ts").alias("prev_ts"), "value"),
        on="user_id",
        left_time="ts",
        right_time="prev_ts",
        allow_exact_match=False,
        direction="backward",
    )
    print("as-of rows:", priced.count())

    # 3 — MinHash near-dup clusters on documents
    from pyetl_spark.operators.minhash import minhash_dedup_assign

    clusters = minhash_dedup_assign(
        t.documents.select(
            "doc_id", F.split("text", " ").alias("tokens")
        ),
        id_col="doc_id",
        tokens_col="tokens",
    )
    n_docs = t.documents.count()
    n_keep = clusters.select(clusters.columns[-1]).distinct().count()
    print(f"near-dup: {n_docs} docs -> {n_keep} cluster keepers")

    # 4 — KMV distinct sketches with set ops
    from pyetl_spark.operators.kmv import kmv_estimate, kmv_sketch

    sk = kmv_sketch(t.events, ["event_type"], "user_id", k=64)
    sk.select(
        "event_type", kmv_estimate(F.col("kmv"), 64).alias("approx_users")
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()
