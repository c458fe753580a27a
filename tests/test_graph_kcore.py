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


# ------------------------------------------------ round 11: pre-flight
# (VERDICT r10 #5: the 256M-edge peel used to OOM opaquely mid-peel at
# the default 8g heap; now the partition width is sized driver-side
# from the stored edge artifact's manifest stats, or the failure is
# actionable BEFORE any job)


def test_preflight_math_against_the_measured_oom_point():
    from etl_tpch_spark.operators.graph import peel_shuffle_partitions

    # small graphs: session default untouched
    assert (
        peel_shuffle_partitions(
            100_000, heap_bytes=8 << 30, cores=32, current_partitions=32
        )
        == 32
    )
    # the r10 OOM shape (256M edges, 8g, 32 cores, 32 partitions):
    # pre-flight widens the peel instead of letting it OOM
    need = peel_shuffle_partitions(
        256_000_000, heap_bytes=8 << 30, cores=32, current_partitions=32
    )
    assert 32 < need <= 4096
    # a bigger pool asks for proportionally fewer partitions and the
    # 48g heap that completed the 100x measurement needs no widening
    # beyond a few hundred
    assert peel_shuffle_partitions(
        256_000_000, heap_bytes=48 << 30, cores=32, current_partitions=128
    ) <= need


def test_preflight_trips_actionably_on_oversized_estimate():
    import pytest

    from etl_tpch_spark.operators.graph import (
        KCoreMemoryError,
        peel_shuffle_partitions,
    )

    with pytest.raises(KCoreMemoryError) as ei:
        peel_shuffle_partitions(
            5_000_000_000,
            heap_bytes=8 << 30,
            cores=32,
            current_partitions=32,
        )
    msg = str(ei.value)
    # the operator knob and the doc pointer, AT the failure site
    assert "SPARK_GRAFT_DRIVER_MEM" in msg
    assert "DEPLOY.md" in msg


def test_preflight_scope_applies_and_restores(spark):
    from etl_tpch_spark.operators.graph import peel_partitions_scope

    before = spark.conf.get("spark.sql.shuffle.partitions")
    with peel_partitions_scope(spark, 123):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "123"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    with peel_partitions_scope(spark, None):  # unarmed: no-op
        assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_converged_peel_result_invariant_to_preflight(spark):
    """Widening the shuffle is value-invariant (integer degree counts
    don't depend on partitioning) — the converged peel returns the
    same core with and without an armed estimate."""
    from etl_tpch_spark.operators.graph import kcore_until_converged

    rows = [(i, i + 1) for i in range(6)] + [(0, 2), (1, 3), (0, 3)]
    edges = spark.createDataFrame(rows, "vec_a long, vec_b long")
    plain, _ = kcore_until_converged(edges, 3)
    armed, _ = kcore_until_converged(
        edges, 3, estimated_edge_rows=10_000_000_000 // 1000
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, armed.collect())
    )
