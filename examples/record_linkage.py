#!/usr/bin/env python3
"""End-to-end entity-resolution walkthrough: the four-stage linkage
stack this engine ships, run as a pipeline on the sf0.001 fixtures.

    1. BLOCK    — er_blocking_quality grades a candidate-generation
                  scheme (reduction ratio vs pair completeness).
    2. LEARN    — er_em_mu_estimate fits the Fellegi-Sunter m/u/p
                  parameters by EM, unsupervised, from the unlabeled
                  blocked pairs.
    3. SCORE    — er_fellegi_sunter turns agreement patterns into
                  match / possible / non-match decisions.
    4. CLUSTER  — dedup_components (connected components) merges the
                  matched pairs into entities; dedup_minhash_recall_eval
                  shows the same grade-your-scheme posture for the
                  content-dedup side.

Run:  python examples/record_linkage.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    from pyetl_spark import registry
    from pyetl_spark.session import get_session

    registry.load_all()
    spark = get_session("record-linkage-demo")
    q = registry.QUERIES

    print("== 1. blocking scheme quality (Christen reduction/completeness)")
    q["er_blocking_quality"](spark, SF).show(truncate=False)

    print("== 2. EM-fitted Fellegi-Sunter parameters (unsupervised)")
    q["er_em_mu_estimate"](spark, SF).show(truncate=False)

    print("== 3. pattern table scored with the decision model")
    q["er_fellegi_sunter"](spark, SF).show(truncate=False)

    print("== 4a. entity clusters via connected components (top 10)")
    q["dedup_components"](spark, SF).show(10, truncate=False)

    print("== 4b. content-dedup index quality (MinHash-LSH vs exact truth)")
    q["dedup_minhash_recall_eval"](spark, SF).show(truncate=False)


if __name__ == "__main__":
    main()
