"""k-core decomposition (queries/graph.py graph_kcore): the bounded
peel must reach the true fixpoint on the fixture, and the output must
be internally consistent (every survivor really has >= K surviving
neighbors)."""

from __future__ import annotations

from collections import defaultdict

from etl_tpch_spark.catalog import Tables
from etl_tpch_spark.queries.graph import (
    _KCORE_K,
    _KCORE_ROUNDS,
    _KCORE_THRESHOLD,
    graph_kcore,
)
from etl_tpch_spark.similarity.ann import cosine_pairs_threshold_cells


def _peel(edges: set[tuple[int, int]], k: int, rounds: int):
    keep = {v for e in edges for v in e}
    deg: dict[int, int] = {}
    for _ in range(rounds):
        deg = defaultdict(int)
        for a, b in edges:
            if a in keep and b in keep:
                deg[a] += 1
                deg[b] += 1
        keep = {v for v, d in deg.items() if d >= k}
    return {v: deg[v] for v in keep}


def test_kcore_matches_reference_peel_and_is_converged(spark, sf_dir):
    t = Tables(spark, sf_dir)
    edges = {
        (r.vec_a, r.vec_b)
        for r in cosine_pairs_threshold_cells(
            t.embeddings, _KCORE_THRESHOLD
        ).collect()
    }
    want = _peel(edges, _KCORE_K, _KCORE_ROUNDS)
    got = {r.vec_id: r.core_degree for r in graph_kcore(spark, sf_dir).collect()}
    assert got == want
    assert got, "fixture similarity graph must have a non-empty 4-core"
    # the round budget suffices on the fixture: one more peel changes nothing
    assert _peel(edges, _KCORE_K, _KCORE_ROUNDS + 1) == want
    # fixpoint invariant: every survivor keeps >= K surviving neighbors
    survivors = set(got)
    deg = defaultdict(int)
    for a, b in edges:
        if a in survivors and b in survivors:
            deg[a] += 1
            deg[b] += 1
    for v in survivors:
        assert deg[v] >= _KCORE_K
        assert got[v] == deg[v]
