"""Connected-components operator: convergence shape + dedup invariants."""

from __future__ import annotations

import pytest

from pyetl_spark.operators.components import connected_components


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["u", "v"])


def test_path_graph_converges_logarithmically(spark):
    """Worst case for naive propagation: a 64-node path (diameter 63).
    Pointer jumping must label every node 0 within ~log2(64)+slack
    rounds — max_iters=10 would take 63 rounds without the jump step."""
    path = _edges(spark, [(i, i + 1) for i in range(63)])
    out = connected_components(path, max_iters=10).collect()
    assert len(out) == 64
    assert {r["component"] for r in out} == {0}


def test_two_components_and_canonical_min(spark):
    """Disjoint cliques keep distinct labels = min member id."""
    e = _edges(
        spark,
        [(5, 9), (9, 7), (5, 7), (20, 21), (21, 22)],
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(e).collect()
    }
    assert got == {5: 5, 9: 5, 7: 5, 20: 20, 21: 20, 22: 20}


def test_nonconvergence_raises(spark):
    """max_iters too small must raise, never return partial clusters."""
    path = _edges(spark, [(i, i + 1) for i in range(63)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(path, max_iters=1)


def test_components_partition_pair_graph(spark):
    """Dedup invariant on the declared query: endpoints of every dup pair
    share a component, and component_id is the min doc_id of its members."""
    from pyetl_spark import registry
    from tests.conftest import SF_ORACLE

    registry.load_all()
    cc = {
        r["doc_id"]: r["component_id"]
        for r in registry.QUERIES["dedup_components"](
            spark, SF_ORACLE
        ).collect()
    }
    members: dict[int, list[int]] = {}
    for doc, comp in cc.items():
        members.setdefault(comp, []).append(doc)
    for comp, docs in members.items():
        assert comp == min(docs)


def _union_find_components(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonicalize: component = min member (find gives min because unions
    # always attach the larger root under the smaller)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_random_graphs_match_union_find(spark, seed):
    """Distributed CC == sequential union-find on seeded random graphs
    (mixed topology: sparse edges over a 200-node id space → many small
    components, chains, and a few larger blobs)."""
    import random

    rng = random.Random(seed)
    pairs = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    pairs = [(u, v) for u, v in pairs if u != v]
    expected = _union_find_components(pairs)
    got = {
        r["node"]: r["component"]
        for r in connected_components(_edges(spark, pairs)).collect()
    }
    assert got == expected
