#!/usr/bin/env python3
"""Generate an sf1-scale dataset (10× sf0.1) under the REPO (testdata is
read-only) so the bench can measure one real 10× scaling point instead of
arguing scaling curves rhetorically (VERDICT r2 item 3).

Method: replicate sf0.1 ten times with deterministic key remapping so the
join graph stays intact and key cardinalities scale like the data:

- fact/dim keys shift by replica * (max_key + 1): customers, suppliers,
  parts, orders, lineitems, events, documents, embeddings;
- foreign keys shift with their parents (l_orderkey with orders, etc.);
- region/nation stay fixed (they are fixed-size in TPC-H at every SF);
- document TEXT gets a per-replica token prefix (r<i>_) so replicas are
  NOT trivial exact/near dups of each other — the dup structure WITHIN a
  replica is preserved, so dedup workloads scale linearly instead of
  collapsing 10:1;
- timestamps are left as-is: the date distribution per SF is what the
  windowed/agg queries care about, and 10× rows per day is exactly what
  a bigger SF looks like.

Written with DuckDB (fast, single pass per table) as plain parquet.
Run: python scripts/gen_sf1.py [outdir] [replicas]
     (defaults: testdata_sf1/, 10 — pass e.g. 30 for an sf3-scale set,
     which adds a third point to the scaling curve)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_sf1",
    )
    global REPLICAS
    if len(sys.argv) > 2:
        REPLICAS = int(sys.argv[2])
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SRC}/{t}.parquet')"
        )
    # key strides: one per shiftable key family
    strides = {
        "cust": con.sql("SELECT max(c_custkey)+1 FROM customer").fetchone()[0],
        "supp": con.sql("SELECT max(s_suppkey)+1 FROM supplier").fetchone()[0],
        "part": con.sql("SELECT max(p_partkey)+1 FROM part").fetchone()[0],
        "ord": con.sql("SELECT max(o_orderkey)+1 FROM orders").fetchone()[0],
        "evt": con.sql("SELECT max(event_id)+1 FROM events").fetchone()[0],
        "user": con.sql("SELECT max(user_id)+1 FROM events").fetchone()[0],
        "doc": con.sql("SELECT max(doc_id)+1 FROM documents").fetchone()[0],
        "vec": con.sql("SELECT max(vec_id)+1 FROM embeddings").fetchone()[0],
    }
    con.execute("CREATE TABLE reps(i BIGINT)")
    con.executemany(
        "INSERT INTO reps VALUES (?)", [(i,) for i in range(REPLICAS)]
    )

    def write(name: str, select_sql: str) -> None:
        con.execute(
            f"COPY ({select_sql}) TO '{out}/{name}.parquet' "
            "(FORMAT PARQUET, COMPRESSION ZSTD)"
        )
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{out}/{name}.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    # fixed-size dims: copy through
    write("region", "SELECT * FROM region")
    write("nation", "SELECT * FROM nation")
    s = strides
    write("customer", f"""
        SELECT c_custkey + i*{s['cust']} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM customer, reps""")
    write("supplier", f"""
        SELECT s_suppkey + i*{s['supp']} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM supplier, reps""")
    write("part", f"""
        SELECT p_partkey + i*{s['part']} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM part, reps""")
    write("orders", f"""
        SELECT o_orderkey + i*{s['ord']} AS o_orderkey,
               o_custkey + i*{s['cust']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM orders, reps""")
    write("lineitem", f"""
        SELECT l_orderkey + i*{s['ord']} AS l_orderkey,
               l_partkey + i*{s['part']} AS l_partkey,
               l_suppkey + i*{s['supp']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM lineitem, reps""")
    write("events", f"""
        SELECT event_id + i*{s['evt']} AS event_id, ts,
               user_id + i*{s['user']} AS user_id,
               event_type, value, props
        FROM events, reps""")
    write("documents", f"""
        SELECT doc_id + i*{s['doc']} AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)', 'r' || i || '_\\1', 'g')
               END AS text,
               lang, source, n_chars
        FROM documents, reps""")
    write("embeddings", f"""
        SELECT vec_id + i*{s['vec']} AS vec_id, embedding, label
        FROM embeddings, reps""")


if __name__ == "__main__":
    main()
