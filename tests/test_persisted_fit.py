"""Stored-artifact lifecycle for the trained session caches (VERDICT
r6 #2): the k-means fit and the similarity-graph edge list are promoted
from applicationId-keyed session caches to disk TxTables, so a FRESH
session opens the artifact instead of repaying training.  Determinism
(integer Lloyd, fold-ordered cosines) makes the stored artifacts
bit-identical to a fresh run; the marker holds the corpus stamp, so a
regenerated fixture rebuilds.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest

from etl_tpch_spark.similarity import kmeans as km


def _vectors(spark, n=60, seed=3):
    rng = np.random.default_rng(seed)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=8)]) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).coalesce(1)


def _wipe(cache_key: str, k: int, iters: int) -> None:
    shutil.rmtree(km._fit_store(cache_key, k, iters)[0], ignore_errors=True)


def test_fit_cold_session_loads_artifact_without_training(
    spark, monkeypatch
):
    emb = _vectors(spark)
    ck = "/persist/fit|stamp-1"
    _wipe(ck, 4, 1)
    km._FIT_CACHE.clear()
    final, cents = km.kmeans_fit(emb, 4, 1, cache_key=ck)
    warm = sorted(map(tuple, final.collect()))
    assert os.path.exists(
        os.path.join(km._fit_store(ck, 4, 1)[0], "_BUILD_COMPLETE")
    )

    # fresh session: memory cache empty; training must NOT run
    km._FIT_CACHE.clear()

    def boom(*a, **kw):  # pragma: no cover - failure path
        raise AssertionError("cold session retrained instead of loading")

    monkeypatch.setattr(km, "_init_centroids", boom)
    monkeypatch.setattr(km, "_update", boom)
    final2, cents2 = km.kmeans_fit(emb, 4, 1, cache_key=ck)
    assert cents2 == cents
    assert sorted(map(tuple, final2.collect())) == warm
    # and it landed back in the session cache for plan reuse
    assert any(k[1] == ck for k in km._FIT_CACHE)


def test_fit_stale_stamp_retrains_and_replaces(spark):
    emb = _vectors(spark, seed=5)
    old, new = "/persist/fit2|stamp-old", "/persist/fit2|stamp-new"
    _wipe(old, 4, 1)
    km._FIT_CACHE.clear()
    km.kmeans_fit(emb, 4, 1, cache_key=old)
    km._FIT_CACHE.clear()
    # same path, new stamp: marker mismatch → retrain → marker updated
    km.kmeans_fit(emb, 4, 1, cache_key=new)
    marker = os.path.join(km._fit_store(new, 4, 1)[0], "_BUILD_COMPLETE")
    with open(marker) as f:
        assert f.read() == new


@pytest.mark.slow  # r9 tier rebalance (VERDICT r8 #5): ~8 s lifecycle e2e
def test_fit_artifact_distinct_per_k_and_iters(spark):
    emb = _vectors(spark, seed=7)
    ck = "/persist/fit3|stamp-1"
    for k, it in ((2, 1), (4, 1), (4, 2)):
        _wipe(ck, k, it)
    km._FIT_CACHE.clear()
    km.kmeans_fit(emb, 2, 1, cache_key=ck)
    km.kmeans_fit(emb, 4, 2, cache_key=ck)
    d21 = km._fit_store(ck, 2, 1)[0]
    d42 = km._fit_store(ck, 4, 2)[0]
    assert d21 != d42
    assert os.path.exists(os.path.join(d21, "_BUILD_COMPLETE"))
    assert os.path.exists(os.path.join(d42, "_BUILD_COMPLETE"))


def test_edges_cold_session_reads_stored_table(spark, sf_dir, monkeypatch):
    from etl_tpch_spark.queries import graph as g
    from etl_tpch_spark.queries.similarity import PAIR_THRESHOLD, _emb_stamp

    stamp = _emb_stamp(sf_dir)
    root = g._edge_store(stamp, PAIR_THRESHOLD)[0]
    shutil.rmtree(root, ignore_errors=True)
    g._EDGE_CACHE.clear()
    warm = sorted(map(tuple, g._edges(spark, sf_dir).collect()))
    assert os.path.exists(os.path.join(root, "_BUILD_COMPLETE"))

    g._EDGE_CACHE.clear()

    def boom(*a, **kw):  # pragma: no cover - failure path
        raise AssertionError("cold session recomputed the edge kernel")

    monkeypatch.setattr(g, "cosine_pairs_threshold_cells", boom)
    cold = sorted(map(tuple, g._edges(spark, sf_dir).collect()))
    assert cold == warm


def test_edges_stale_stamp_rebuilds(spark, sf_dir, monkeypatch):
    from etl_tpch_spark.queries import graph as g
    from etl_tpch_spark.queries.similarity import PAIR_THRESHOLD, _emb_stamp

    real_stamp = _emb_stamp(sf_dir)
    g._EDGE_CACHE.clear()
    g._edges(spark, sf_dir)  # artifact exists at real_stamp

    # simulate a regenerated fixture: same path, different stamp.
    # wipe the fake stamp's GENERATION first — a previous test session
    # already built it (generational dirs persist by design)
    g._EDGE_CACHE.clear()
    fake_stamp = real_stamp + "-regen"
    shutil.rmtree(
        g._edge_store(fake_stamp, PAIR_THRESHOLD)[0], ignore_errors=True
    )
    monkeypatch.setattr(
        "etl_tpch_spark.queries.similarity._emb_stamp",
        lambda _sf: fake_stamp,
    )
    called = {}
    orig = g.cosine_pairs_threshold_cells

    def spy(*a, **kw):
        called["yes"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(g, "cosine_pairs_threshold_cells", spy)
    g._edges(spark, sf_dir)
    assert called, "stale marker must force a kernel rebuild"
    marker = os.path.join(
        g._edge_store(fake_stamp, PAIR_THRESHOLD)[0], "_BUILD_COMPLETE"
    )
    with open(marker) as f:
        assert f.read() == fake_stamp
    # generational dirs: the REAL stamp's artifact is untouched by the
    # fake rebuild — no cleanup needed (the old aliasing store required
    # one here)
    assert os.path.exists(
        os.path.join(
            g._edge_store(real_stamp, PAIR_THRESHOLD)[0],
            "_BUILD_COMPLETE",
        )
    )


def test_new_stamp_gets_new_generation_dir(spark):
    """Review r7: a rebuild must never rmtree a directory a live lazy
    reader from the previous generation may still reference — new
    stamp ⇒ NEW directory, old generation left intact."""
    emb = _vectors(spark, seed=11)
    old, new = "/persist/gen|stamp-a", "/persist/gen|stamp-b"
    _wipe(old, 4, 1)
    _wipe(new, 4, 1)
    km._FIT_CACHE.clear()
    final_old, _ = km.kmeans_fit(emb, 4, 1, cache_key=old)
    d_old = km._fit_store(old, 4, 1)[0]
    km._FIT_CACHE.clear()
    km.kmeans_fit(emb, 4, 1, cache_key=new)
    d_new = km._fit_store(new, 4, 1)[0]
    assert d_old != d_new
    assert os.path.exists(os.path.join(d_old, "_BUILD_COMPLETE"))
    # the old generation's reader still works after the rebuild
    assert final_old.count() == 60
