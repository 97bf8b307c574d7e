#!/usr/bin/env python3
"""Three-point scaling curve: the heavy-family probes at sf0.1 → sf1 → sf3.

The sf1 block in bench.py gives ONE measured 10× point per shape; a
second 3× step (sf1 → sf3, 30 replicas of sf0.1 via gen_sf1.py) turns
the linearity claim into a curve — if wall time grows ~linearly on BOTH
steps, the shape has no hidden superlinear term the single point could
be hiding (e.g. a band-bucket or cluster-window whose size distribution
degrades with corpus growth).

Usage: python scripts/bench_scaling_curve.py [--out FILE]
Writes one JSON line per (query, sf) with secs and the step ratios.
Expects testdata_sf1/ and testdata_sf3/ to exist (scripts/gen_sf1.py,
second arg 10 / 30).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: The shapes whose scaling is argued hardest in SCALE.md: partial/final
#: agg, fact-fact shuffle join, MinHash banding + components, the full
#: corpus pipeline, two-phase global rank, Bloom prefilter, 3-round
#: label propagation, k-means semantic dedup, and the new gaps-islands
#: window chain.
PROBES = [
    "agg_groupby_pricing",
    "join_multi_3way",
    "dedup_minhash_lsh",
    "pipeline_training_corpus_neardup",
    "text_global_shuffle",
    "join_bloom_prefilter",
    "graph_label_propagation",
    "text_semdedup",
    "win_gaps_islands",
    # r5 session 4: simhash — signature build is linear, but the pair
    # LISTING grows with cluster sizes; the curve makes that visible
    # (assignment via dedup_components is the linear-output route)
    "dedup_simhash",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_scaling_curve.jsonl")
    ap.add_argument("--probes", default=None)
    ap.add_argument(
        "--sf01-dir",
        default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        ),
        help="sf0.1 fixture dir (same convention as bench.py: "
        "$SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1)",
    )
    args = ap.parse_args()

    from pyetl_spark import registry
    from pyetl_spark.session import get_session

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dirs = {
        0.1: args.sf01_dir,
        1.0: os.path.join(here, "testdata_sf1"),
        3.0: os.path.join(here, "testdata_sf3"),
    }
    for sf, d in dirs.items():
        if not os.path.exists(os.path.join(d, "lineitem.parquet")):
            sys.exit(f"missing fixture dir for sf{sf}: {d} (run gen_sf1.py)")

    registry.load_all()
    spark = get_session("scaling-curve")
    spark.sparkContext.setLogLevel("ERROR")
    probes = args.probes.split(",") if args.probes else PROBES

    # warm-up (codegen/classloader)
    registry.QUERIES["agg_groupby_pricing"](spark, dirs[0.1]).limit(1).count()

    rows = []
    with open(args.out, "w") as fh:
        for key in probes:
            secs = {}
            for sf, d in dirs.items():
                t0 = time.perf_counter()
                registry.QUERIES[key](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                secs[sf] = round(time.perf_counter() - t0, 3)
            rec = {
                "key": key,
                "secs": {str(k): v for k, v in secs.items()},
                # data grows 10× then 3×; at-or-below these ratios = linear
                "ratio_10x": round(secs[1.0] / secs[0.1], 2),
                "ratio_3x": round(secs[3.0] / secs[1.0], 2),
            }
            rows.append(rec)
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            print(json.dumps(rec), flush=True)
    worst = max(rows, key=lambda r: r["ratio_3x"])
    print(f"worst 3x step: {worst['key']} {worst['ratio_3x']}x")
    spark.stop()


if __name__ == "__main__":
    main()
