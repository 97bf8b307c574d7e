"""PageRank operator: convergence, determinism, known-graph ordering."""

from __future__ import annotations

from pyetl_spark.operators.pagerank import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["u", "v"])


def test_star_graph_hub_dominates(spark):
    """Everyone links to node 0 → node 0 must hold the top rank and
    ranks of the symmetric leaves must be equal."""
    e = _edges(spark, [(i, 0) for i in range(1, 6)])
    ranks = {r["node"]: r["rank"] for r in pagerank(e).collect()}
    hub = ranks.pop(0)
    assert hub > max(ranks.values())
    leaves = list(ranks.values())
    assert max(leaves) - min(leaves) < 1e-9


def test_cycle_graph_uniform(spark):
    """A directed cycle is perfectly symmetric → uniform ranks 1/n."""
    n = 6
    e = _edges(spark, [(i, (i + 1) % n) for i in range(n)])
    ranks = [r["rank"] for r in pagerank(e).collect()]
    assert len(ranks) == n
    for r in ranks:
        assert abs(r - 1.0 / n) < 1e-6


def test_deterministic_across_runs(spark):
    e = _edges(
        spark,
        [(1, 2), (2, 3), (3, 1), (4, 1), (5, 1), (4, 5)],
    )
    r1 = {r["node"]: r["rank"] for r in pagerank(e).collect()}
    r2 = {r["node"]: r["rank"] for r in pagerank(e).collect()}
    assert set(r1) == set(r2)
    for k in r1:
        assert abs(r1[k] - r2[k]) < 1e-12


def test_authority_ordering(spark):
    """Node with more in-links from well-linked nodes outranks others:
    classic two-hub example — 1 and 2 both link 3; 3 links back to 1
    only → rank(3) > rank(1) > rank(2)."""
    e = _edges(spark, [(1, 3), (2, 3), (3, 1)])
    ranks = {r["node"]: r["rank"] for r in pagerank(e).collect()}
    assert ranks[3] > ranks[1] > ranks[2]


def test_exact_form_agrees_with_float_form(spark):
    """pagerank_exact (integer fixed-point, oracle tier) must agree with
    the float power iteration to well beyond its 1e-12 quantization on a
    known graph — same damping, same rounds, no early stop on either."""
    from pyetl_spark.operators.pagerank import pagerank, pagerank_exact

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (4, 3), (1, 3)], ["u", "v"]
    )
    f = {r["node"]: r["rank"]
         for r in pagerank(edges, max_iters=10, tol=0.0).collect()}
    q = {r["node"]: r["rank"] for r in pagerank_exact(edges, iters=10).collect()}
    assert set(f) == set(q)
    for node in f:
        assert abs(f[node] - q[node]) < 1e-9, (node, f[node], q[node])
