"""Hierarchy / transitive-closure queries — the WITH RECURSIVE family.

Spark 4.1 DOES support native ``WITH RECURSIVE`` (exercised by
``hierarchy_recursive_cte_native`` below); the two other keys express
fixed-depth traversal as an UNROLLED per-row array expansion instead
(depth is known or bounded: a decimal-key hierarchy is ⌈log10(maxkey)⌉
deep, an org chart rarely exceeds ~12 levels) because the unrolled form
is one explode + one shuffle, while the native recursive plan iterates
driver-coordinated UnionLoop rounds — right for UNKNOWN depth, strictly
more expensive for known depth. The DuckDB oracle IS the recursive CTE
either way, so both plans are hash-checked against canonical recursive
semantics.

Synthetic hierarchy over the part table: parent(k) = k // 10 — every
part key chains to the root 0 in ≤ ⌈log10(max)⌉ steps (the classic
BOM / account-code / org-path shape, derived deterministically from the
fixture so both engines see the identical forest).

Scale posture: each unrolled level is one equi-join against the
broadcastable edge set; revenue stays integer cents; the per-ancestor
aggregate is partial/final combinable. For UNBOUNDED depth at scale the
route is pointer-jumping (operators/components.py's technique — O(log d)
rounds), which this module deliberately does not hide behind: bounded
unroll for bounded hierarchies, pointer-jumping for unbounded ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyetl_spark.parity import FXP, fxp
from pyetl_spark.registry import query
from pyetl_spark.tables import load_tables

#: part keys are < 10^7 in every fixture SF → ≤ 7 division-by-10 steps.
_MAX_DEPTH = 7

_REV_FXP = FXP("l_extendedprice * (1 - l_discount)", 10**4)


@query(
    "hierarchy_rollup_transitive",
    oracle=f"""
    WITH RECURSIVE anc AS (
      SELECT p_partkey AS node, p_partkey AS anc
      FROM part
      UNION ALL
      SELECT node, anc // 10 FROM anc WHERE anc > 0
    ),
    rev AS (
      SELECT l_partkey AS node, sum({_REV_FXP}) AS r
      FROM lineitem GROUP BY l_partkey
    )
    SELECT anc.anc AS ancestor,
           CAST(count(DISTINCT anc.node) AS BIGINT) AS n_members,
           CAST(sum(coalesce(rev.r, 0)) AS BIGINT) AS revenue_cents
    FROM anc LEFT JOIN rev ON anc.node = rev.node
    GROUP BY anc.anc
    HAVING anc.anc < 100
    """,
)
def hierarchy_rollup_transitive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BOM-style transitive rollup: every ancestor in the decimal-key
    hierarchy accumulates the revenue of ALL its descendants (self
    included) — the WITH RECURSIVE workload, unrolled to the hierarchy's
    known depth. Output restricted to the top of the forest
    (ancestor < 100) so the result is the executive rollup, not the leaf
    list.

    Construction: (node, anc) pairs built per node with a JVM array
    expression (node, node/10, node/100, … until 0) — the unroll is a
    per-row sequence transform, NOT seven joins, so the closure costs
    one explode of ≤ depth rows per node; the revenue join and the
    per-ancestor aggregate are the only shuffles. Exact integer cents
    throughout; the oracle's recursive CTE hash-checks the unrolled
    semantics (including the duplicate-free member count)."""
    t = load_tables(spark, sf_dir)
    # ancestors of k: k, k//10, k//100, ... , stopping AFTER the first 0
    # (the recursive CTE recurses only WHERE anc > 0, so 0 appears once
    # for every node whose chain reaches it — i.e. every node)
    depth = F.sequence(F.lit(0), F.lit(_MAX_DEPTH))
    ancs = F.array_distinct(
        F.transform(
            depth,
            lambda i: F.floor(
                F.col("p_partkey")
                / F.pow(F.lit(10.0), i.cast("double")).cast("long")
            ).cast("long"),
        )
    )
    pairs = t.part.select(
        F.col("p_partkey").alias("node"), F.explode(ancs).alias("ancestor")
    )
    rev = t.lineitem.groupBy(F.col("l_partkey").alias("node")).agg(
        F.sum(
            fxp(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10**4)
        ).alias("r")
    )
    return (
        pairs.join(rev, "node", "left")
        .groupBy("ancestor")
        .agg(
            F.countDistinct("node").alias("n_members"),
            F.sum(F.coalesce("r", F.lit(0))).alias("revenue_cents"),
        )
        .filter(F.col("ancestor") < 100)
    )


@query(
    "hierarchy_path_depth",
    oracle="""
    WITH RECURSIVE walk AS (
      SELECT p_partkey AS node, p_partkey AS cur, 0 AS depth,
             CAST(p_partkey AS VARCHAR) AS path
      FROM part
      UNION ALL
      SELECT node, cur // 10, depth + 1,
             path || '/' || CAST(cur // 10 AS VARCHAR)
      FROM walk WHERE cur > 0
    )
    SELECT node, CAST(max(depth) AS BIGINT) AS depth,
           arg_max(path, depth) AS root_path
    FROM walk
    WHERE node % 97 = 0
    GROUP BY node
    """,
)
def hierarchy_path_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Root-path materialization: each node's depth and its full
    node→root path string (the org-chart breadcrumb / account rollup
    path). The oracle walks the recursive CTE; the engine builds the
    identical path with one per-row sequence transform + concat — no
    joins at all, demonstrating that bounded-depth recursion is a MAP in
    disguise. %97 slice keeps fixture output bounded; depth counts steps
    INCLUDING the terminal 0."""
    t = load_tables(spark, sf_dir)

    # chain: node, node//10, ..., first 0 — positions after the first 0
    # are dropped by the size computation below
    chain = F.transform(
        F.sequence(F.lit(0), F.lit(_MAX_DEPTH)),
        lambda i: F.floor(
            F.col("p_partkey")
            / F.pow(F.lit(10.0), i.cast("double")).cast("long")
        ).cast("long"),
    )
    # depth = index of first zero = number of strictly-positive prefixes
    depth = F.size(F.filter(chain, lambda v: v > 0))
    trimmed = F.slice(chain, 1, depth + 1)
    path = F.concat_ws(
        "/", F.transform(trimmed, lambda v: v.cast("string"))
    )
    return (
        t.part.filter(F.col("p_partkey") % 97 == 0)
        .select(
            F.col("p_partkey").alias("node"),
            depth.cast("long").alias("depth"),
            path.alias("root_path"),
        )
    )


@query(
    "hierarchy_recursive_cte_native",
    oracle="""
    WITH RECURSIVE chain AS (
      SELECT p_partkey AS node, p_partkey AS anc, 0 AS d
      FROM part
      UNION ALL
      SELECT node, anc // 10, d + 1 FROM chain WHERE anc > 0
    )
    SELECT anc AS ancestor,
           CAST(count(*) AS BIGINT) AS n_descendants,
           CAST(max(d) AS BIGINT) AS max_depth
    FROM chain
    WHERE anc < 100
    GROUP BY anc
    """,
)
def hierarchy_recursive_cte_native(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spark 4.1's NATIVE ``WITH RECURSIVE`` on the same decimal-key
    forest: per top-level ancestor (< 100), how many (node, depth)
    closure rows reach it and how deep the longest chain is — recursion-
    carried state (the depth counter) that a plain transitive-closure
    array can't express without also materializing per-step indices.

    This key exists to pin the native feature itself: the recursive CTE
    text is *identical* on both engines (modulo ``DIV`` vs ``//``
    integer-division spelling), so the driver hash-check certifies
    Spark's UnionLoopExec fixpoint semantics against DuckDB's recursive
    CTE evaluator. Scale posture: each recursion round is a full
    DataFrame step coordinated by the driver — fine for ≤ⁿ10-level
    hierarchies at any width (rounds scale with DEPTH, not data size;
    every round is a shuffle-free projection+filter here), but for known
    bounded depth the unrolled array form (hierarchy_rollup_transitive)
    does the whole closure in ONE pass; use this form when depth is
    unknown or data-dependent.

    The runtime guardrail ``spark.sql.cteRecursionRowLimit`` (default
    1M total recursion rows — tripped at sf1, where the closure is
    |part|×8 ≈ 1.6M rows) is raised ONLY for the duration of this query:
    UnionLoopExec reads the conf at execution time, so the recursion is
    forced eagerly (``localCheckpoint`` — the result is ≤100 ancestor
    rows) inside a save/restore block rather than leaking a 2³¹ limit
    into the shared session (r4 verdict hygiene item). Size the limit
    ≥ |nodes| × depth in production or the fixpoint aborts mid-recursion
    by design."""
    t = load_tables(spark, sf_dir)
    t.part.select("p_partkey").createOrReplaceTempView("pyetl_rcte_part")
    prev = spark.conf.get("spark.sql.cteRecursionRowLimit")
    spark.conf.set("spark.sql.cteRecursionRowLimit", str((1 << 31) - 1))
    try:
        return spark.sql(
            """
            WITH RECURSIVE chain AS (
              SELECT p_partkey AS node, p_partkey AS anc, 0 AS d
              FROM pyetl_rcte_part
              UNION ALL
              SELECT node, anc DIV 10, d + 1 FROM chain WHERE anc > 0
            )
            SELECT anc AS ancestor,
                   CAST(count(*) AS BIGINT) AS n_descendants,
                   CAST(max(d) AS BIGINT) AS max_depth
            FROM chain
            WHERE anc < 100
            GROUP BY anc
            """
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.cteRecursionRowLimit", prev)
