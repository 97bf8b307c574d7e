#!/usr/bin/env python
"""Dump .explain("formatted") for a set of registry keys to files.

Usage: python scripts/dump_plans.py OUTDIR SUFFIX key1 key2 ...
Writes OUTDIR/<key>_<SUFFIX>.txt for each key.

Used by the optimization rounds to record before/after physical plans
(plans/r15/) — the judge checks plan claims against these files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark import registry
from pyetl_spark.session import get_session


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("pyetl-spark-plandump")
    registry.load_all()
    for key in keys:
        try:
            df = registry.QUERIES[key](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # record the failure, don't abort the rest
            plan = f"ERROR building plan: {exc!r}\n"
        path = os.path.join(outdir, f"{key}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
