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


#: PageRank parameters — the SINGLE definition both the engine (below)
#: and the DuckDB oracle generator (queries/llm_text._pagerank_oracle)
#: read, so changing damping/iterations/resolution in one place cannot
#: silently desynchronize engine and oracle.
DAMPING_NUM = 85
DAMPING_DEN = 100
PR_ITERS = 10
PR_SCALE = 10**12


def pagerank_exact(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    damping_num: int = DAMPING_NUM,
    damping_den: int = DAMPING_DEN,
    iters: int = PR_ITERS,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Oracle-replayable PageRank: ranks held as INTEGER fixed-point at
    ``scale`` (1e-12 resolution) so every per-iteration sum is exact and
    order-free under any partitioning — the float form's
    summation-order caveat disappears and a SQL oracle replays the loop
    verbatim (r7, same family as ivf.kmeans_fit_exact).

    Per iteration (all integer ops): contribution = rank DIV out_degree,
    damped = base + (damping_num·Σcontrib) DIV damping_den, with
    base = ((scale·(den−num)) DIV den) DIV n. Floor divisions leak
    O(n/scale) total mass per round — 1e-12-sized, far below the float
    form's own dangling-node leak, and deterministic. Fixed ``iters``
    (no float-delta early stop — the stop test itself would be
    order-sensitive). Returns DataFrame(node, rank double = q/scale)."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    init_q = scale // n
    base_q = ((scale * (damping_den - damping_num)) // damping_den) // n
    out_deg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count("*").alias("deg")
    )
    # out-degree is loop-invariant: attach it to the edge list ONCE and
    # pin the result, so each iteration runs one join (edges⋈ranks), not
    # two — on an iteration-constant-bound graph this cuts a third of
    # the per-round stages with identical integer math
    deg_edges = (
        edges.join(out_deg, edges[src] == out_deg.node)
        .select(F.col(src).alias("_src"), F.col(dst).alias("_dst"), "deg")
        .localCheckpoint(eager=True)
    )
    # r15 loop shape: `ranks` holds only nodes WITH in-edges — a node
    # that is never a _dst has rq = base_q at every iteration ≥ 1 (and
    # init_q at iteration 0), a CONSTANT, so carrying it through the
    # loop via the old per-iteration nodes-left-join bought nothing and
    # cost one extra join + a full-node checkpoint per round. Instead
    # the constant is supplied where it is read: as the left-join
    # default when edges pull their source's rank (iteration 1 needs no
    # join at all — every source holds init_q), and as the final
    # coalesce when the full node set is restored. Integer arithmetic
    # is unchanged (base_q + (num·0) DIV den == base_q), so ranks are
    # bit-identical to the old form; per iteration this is 1 join
    # instead of 2 and the checkpointed frame shrinks to the in-edge
    # node set.
    # r15: checkpoint every SECOND iteration (and the last), not every
    # one. The checkpoint exists only to truncate the iterative lineage
    # (§5 of the optimization guide) — the integer arithmetic is
    # untouched by its placement, so ranks stay bit-identical — and each
    # eager checkpoint is a full Spark job, so 10 fixed iterations cost
    # 10 scheduled jobs. Letting the plan carry two join+agg rounds
    # between pins halves the job count; two rounds of lineage is far
    # below any replanning hazard.
    ranks = None
    for i in range(iters):
        if ranks is None:
            contrib = deg_edges.select(
                F.col("_dst").alias("node"),
                F.expr(f"CAST({init_q} AS BIGINT) DIV deg").alias("cq"),
            )
        else:
            contrib = deg_edges.join(
                ranks, deg_edges["_src"] == ranks.node, "left"
            ).select(
                F.col("_dst").alias("node"),
                F.expr(
                    f"coalesce(rq, CAST({base_q} AS BIGINT)) DIV deg"
                ).alias("cq"),
            )
        summed = contrib.groupBy("node").agg(F.sum("cq").alias("inq"))
        ranks = summed.select(
            "node",
            F.expr(
                f"CAST({base_q} AS BIGINT) + "
                f"({damping_num} * inq) DIV {damping_den}"
            ).alias("rq"),
        )
        if i % 2 == 1 or i == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    if ranks is None:  # iters == 0: every node still holds init_q
        return nodes.select(
            "node",
            (F.lit(init_q).cast("double") / F.lit(float(scale))).alias(
                "rank"
            ),
        )
    return nodes.join(ranks, "node", "left").select(
        "node",
        (
            F.coalesce(F.col("rq"), F.lit(base_q).cast("long")).cast(
                "double"
            )
            / F.lit(float(scale))
        ).alias("rank"),
    )
