"""PageRank via power iteration — the second iterative graph operator
next to components.py (connected components), demonstrating numeric
fixpoint loops as pure DataFrame algebra. North-star relevance: rank
documents inside a link/citation/duplication graph to pick canonical or
high-authority representatives during corpus curation.

Per iteration: contributions = rank/out_degree shipped along edges (one
equi-join on src), summed per dst (one groupBy), damped. All shuffles key
on node id — one hash partitioning serves the join AND the aggregate of
every round; localCheckpoint truncates the iterative lineage exactly like
components.py. Dangling nodes (no out-edges) leak rank by design here —
callers who need strict conservation add a dangling-mass redistribution
term; the convergence/ordering tests pin the implemented semantics.

Convergence is measured (L1 delta between successive rank vectors — one
small join + agg per round), not assumed; the loop stops early when the
delta undershoots ``tol``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    damping: float = 0.85,
    max_iters: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """DataFrame(node, rank) over the directed edge list.

    Deterministic: uniform initial ranks, fixed damping, fixed iteration
    order — no sampling anywhere. Ranks are plain doubles; summation
    order may vary across partitionings, so tests compare with
    tolerances, never hashes (SURVEY §5.3 keeps this out of Tier A).
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    out_deg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count("*").alias("deg")
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = F.lit((1.0 - damping) / n)

    for _ in range(max_iters):
        contrib = (
            edges.join(ranks, edges[src] == ranks.node)
            .join(out_deg, ranks.node == out_deg.node)
            .select(
                F.col(dst).alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("in_rank"))
        new_ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    base + F.lit(damping) * F.coalesce("in_rank", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        delta = (
            new_ranks.alias("a")
            .join(ranks.alias("b"), "node")
            .agg(F.sum(F.abs(F.col("a.rank") - F.col("b.rank"))).alias("d"))
            .collect()[0]["d"]
        )
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    return ranks
