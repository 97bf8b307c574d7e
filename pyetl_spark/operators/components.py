"""Distributed connected components — the finisher of every near-dup
dedup pipeline: MinHash/Jaccard emits DUPLICATE PAIRS, but retention
decisions need CLUSTERS (keep one canonical doc per component, drop the
rest). North-star dedup scope (SURVEY §2.10) — no Spark built-in.

Algorithm: min-label propagation with pointer jumping (hash-to-min
family). Each round does
  1. neighbor step  — label(n) ← min(label(n), min label over neighbors)
  2. jump step      — label(n) ← label(label(n))   (labels are node ids)
The jump halves label-tree height every round, so convergence is
O(log(max component diameter)) rounds, not O(diameter) — a path graph of
10^6 nodes converges in ~20 rounds instead of 10^6. Each round is two
equi-joins + one groupBy-min on node id: same shuffle key throughout, so
at 100 TB the exchanges reuse one hash partitioning; localCheckpoint()
breaks the O(rounds) lineage growth that would otherwise blow up the
replan (iterative DataFrame loops are the one place lineage truncation is
mandatory).

Convergence is checked (count of label changes == 0), not assumed —
max_iters is a backstop, and exceeding it raises rather than silently
returning half-merged clusters (a wrong dedup would DELETE data
downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    max_iters: int = 25,
) -> DataFrame:
    """DataFrame(node, component) — component = min node id reachable.

    ``edges`` is an undirected edge list (each pair once is enough; both
    orientations are derived internally). Isolated nodes don't appear —
    callers union them back with component = own id if needed.
    """
    # Checkpoint ONE orientation, then derive the other from the
    # checkpointed blocks: a union of two selects over an unpinned
    # `edges` executes the caller's whole upstream chain (banding +
    # verify in the dedup pipelines) once PER BRANCH inside the first
    # job — the r10 profile showed the verify chain running twice here.
    one = edges.select(
        F.col(src).alias("n"), F.col(dst).alias("m")
    ).localCheckpoint(eager=True)
    both = one.unionAll(
        one.select(F.col("m").alias("n"), F.col("n").alias("m"))
    )

    # least(min neighbor, self) seeds one neighbor-step for free
    labels = (
        both.groupBy("n")
        .agg(F.min("m").alias("mn"))
        .select("n", F.least("n", "mn").alias("lbl"))
    )

    for _ in range(max_iters):
        # 1. neighbor step: pull the smallest label in the 1-hop ring
        e, l = both.alias("e"), labels.alias("l")
        nbr = (
            e.join(l, F.col("e.m") == F.col("l.n"), "inner")
            .select(F.col("e.n").alias("n"), F.col("l.lbl").alias("lbl"))
            .groupBy("n")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        # carry the round-START label through both steps so convergence
        # is a filter over the checkpointed frame, not an extra join+job
        stepped = (
            labels.join(nbr, "n", "left")
            .select(
                "n",
                F.least(
                    "lbl", F.coalesce("nbr_lbl", F.col("lbl"))
                ).alias("lbl"),
                F.col("lbl").alias("old_lbl"),
            )
        )
        # 2. jump step: follow the label one hop (label(label(n)))
        s, p = stepped.alias("s"), stepped.alias("p")
        jumped = s.join(p, F.col("s.lbl") == F.col("p.n"), "left").select(
            F.col("s.n").alias("n"),
            F.least(
                F.col("s.lbl"),
                F.coalesce(F.col("p.lbl"), F.col("s.lbl")),
            ).alias("lbl"),
            F.col("s.old_lbl").alias("old_lbl"),
        )
        # converged ⟺ NO label moved across the WHOLE round — compare to
        # the round-START labels (comparing only across the jump step
        # misses rounds where the neighbor step alone made progress and
        # stops early with half-merged components). The change count
        # rides the checkpoint job itself as an observed metric — one
        # action per round, not checkpoint + count.
        obs = Observation()
        new_labels = jumped.observe(
            obs,
            F.sum(
                (F.col("lbl") != F.col("old_lbl")).cast("long")
            ).alias("changed"),
        ).localCheckpoint(eager=True)
        changed = obs.get["changed"] or 0
        labels = new_labels.select("n", "lbl")
        if changed == 0:
            return labels.select(
                F.col("n").alias("node"), F.col("lbl").alias("component")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds"
    )
