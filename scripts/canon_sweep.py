#!/usr/bin/env python3
"""Driver-faithful canonicalization sweep over every declared oracle key.

Replicates the driver's CORRECTNESS gate *mechanics* (reconstructed from
r1 failure tracebacks) so Arrow/pandas traps surface locally BEFORE the
driver runs:

  1. ``sdf.toPandas()`` with Arrow enabled  — catches out-of-ns-bounds
     timestamps (the r1 ``etl_scd2_intervals`` failure).
  2. sort columns by name, then ``pdf.sort_values(by=all_columns)`` —
     catches unhashable cells: numpy arrays / dicts (the r1
     ``agg_collect_sorted`` failure).
  3. exact value compare vs the DuckDB oracle after the same canon —
     catches float ties / representation drift (the r1
     ``etl_incremental_agg`` hash mismatch).

Usage:  python scripts/canon_sweep.py [--sf /root/testdata/sf0.01] \
            [--only key1,key2] [--out canon_sweep.jsonl]
Exit code 0 iff every key passes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark.canon import canon_frame as _canon_pandas  # noqa: E402
from pyetl_spark.canon import frame_rows as _rows  # noqa: E402


def check_key(spark, duck, key, queries, oracles, sf_dir):
    t0 = time.time()
    rec = {"key": key, "status": "pass", "rows": None, "err": None, "secs": None}
    try:
        sdf = queries[key](spark, sf_dir)
        pdf_s = sdf.toPandas()  # step 1: Arrow conversion
    except Exception:
        rec.update(status="spark_error", err=traceback.format_exc(limit=3))
        rec["secs"] = round(time.time() - t0, 2)
        return rec
    rec["rows"] = len(pdf_s)  # vacuity evidence: scripts/empty_result_lint.py
    try:
        pdf_s = _canon_pandas(pdf_s)  # step 2: driver sort_values
    except Exception:
        rec.update(status="canon_error", err=traceback.format_exc(limit=2))
        rec["secs"] = round(time.time() - t0, 2)
        return rec
    if key not in oracles:
        rec["status"] = "no_oracle"
        rec["secs"] = round(time.time() - t0, 2)
        return rec
    try:
        pdf_d = duck.execute(oracles[key]).df()
        pdf_d = _canon_pandas(pdf_d)
    except Exception:
        rec.update(status="oracle_error", err=traceback.format_exc(limit=3))
        rec["secs"] = round(time.time() - t0, 2)
        return rec
    if list(pdf_s.columns) != list(pdf_d.columns):
        rec.update(
            status="schema_mismatch",
            err=f"spark={list(pdf_s.columns)} duck={list(pdf_d.columns)}",
        )
    elif len(pdf_s) != len(pdf_d):
        rec.update(
            status="rows_mismatch", err=f"spark={len(pdf_s)} duck={len(pdf_d)}"
        )
    else:
        rs, rd = _rows(pdf_s), _rows(pdf_d)
        bad = [
            (i, a, b) for i, (a, b) in enumerate(zip(rs, rd)) if a != b
        ][:3]
        if bad:
            rec.update(
                status="value_mismatch",
                err=json.dumps(bad, default=str)[:2000],
            )
        elif not rs:
            # both engines agree on NOTHING — visible inline so a vacuous
            # Tier-A key (the subq_scalar/join_anti/set_except class)
            # can't hide behind a green row; empty_result_lint.py
            # adjudicates across SFs.
            rec["status"] = "pass_empty"
    rec["secs"] = round(time.time() - t0, 2)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default="canon_sweep.jsonl")
    args = ap.parse_args()

    import duckdb

    from pyetl_spark import registry
    from pyetl_spark.session import get_session
    from pyetl_spark.tables import TABLE_NAMES

    registry.load_all()
    spark = get_session("canon-sweep")
    duck = duckdb.connect()
    for name in TABLE_NAMES:
        duck.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{name}.parquet')"
        )

    keys = list(registry.QUERIES)
    if args.only:
        keys = [k for k in args.only.split(",") if k in registry.QUERIES]

    fails = 0
    with open(args.out, "w") as fh:
        for i, key in enumerate(keys):
            rec = check_key(
                spark, duck, key, registry.QUERIES, registry.ORACLE, args.sf
            )
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            mark = (
                "ok"
                if rec["status"] in ("pass", "pass_empty", "no_oracle")
                else "FAIL"
            )
            if mark == "FAIL":
                fails += 1
            print(f"[{i + 1}/{len(keys)}] {mark:4s} {rec['status']:16s} {key}",
                  flush=True)
    print(f"done: {fails} failures / {len(keys)} keys")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
