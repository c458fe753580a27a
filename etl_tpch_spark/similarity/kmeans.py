"""Deterministic quantized k-means over the embedding corpus — the
iterative-ML-on-Catalyst operator (Lloyd's algorithm as DataFrame
passes; companion to the iterative connected components in
dedup/clusters.py).

Exactness trick (cross-engine oracle-checkable, like the int8 ANN
path): coordinates are offset-shifted positive and quantized to
integers once up front (floor((x+1)·10⁶+0.5) — floor(+0.5) rounding is
identical everywhere).  Every subsequent step is *integer* arithmetic:

- distances: Σ(q_x − q_c)² in BIGINT (≤ 64·10¹² — no overflow, and
  order-independent since integer addition is associative);
- centroid update: per-dimension integer mean ``sum div count`` —
  operands are non-negative, so Spark's truncating ``div`` and
  DuckDB's flooring ``//`` agree.

No float ever enters the loop ⇒ assignments are bit-identical across
engines, partitionings and retries.  (Real k-means on floats has no
such guarantee on ANY distributed engine — reduction order changes
sums; quantized k-means is how you make it reproducible.)

Scale shape per iteration: one broadcast of K centroid vectors, one
map-side distance argmin (no shuffle of the corpus), one shuffle to
re-aggregate centroids (64·K cells).  O(iters) shuffles total,
corpus-sized traffic never moves.
"""

from __future__ import annotations

import os
import threading

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

K_CLUSTERS = 8
N_ITERS = 2
OFFSET = 1.0
SCALE = 1_000_000
EMB_DIM = 64


SPARK_SQL_QUANTIZE = (
    f"transform(embedding, x -> cast(floor((cast(x AS double) + "
    f"{OFFSET!r}D) * {SCALE} + 0.5D) AS bigint))"
)


def spark_sql_d2(a: str, b: str) -> str:
    """Spark-SQL text of the integer squared-L2 fold (round 11: one
    parser round-trip instead of per-node py4j construction)."""
    return (
        f"aggregate(zip_with({a}, {b}, (a, b) -> (a - b) * (a - b)), "
        "cast(0 AS bigint), (acc, x) -> acc + x)"
    )


def quantize(embeddings: DataFrame) -> DataFrame:
    """(vec_id, qv: array<long>) — offset-positive 1e-6-quantized."""
    return embeddings.selectExpr(
        "vec_id", f"{SPARK_SQL_QUANTIZE} AS qv"
    )


def _assign(q: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest centroid per vector (squared-L2 in integer space; ties
    break to the lowest centroid id).  Centroids broadcast — the
    corpus never shuffles."""
    return (
        q.crossJoin(F.broadcast(cent))
        .selectExpr("*", f"{spark_sql_d2('qv', 'cv')} AS d2")
        .selectExpr(
            "*",
            "row_number() OVER (PARTITION BY vec_id "
            "ORDER BY d2, cent_id) AS rn",
        )
        .filter("rn = 1")
        .selectExpr("vec_id", "qv", "cent_id AS cluster", "d2")
    )


def _update(assign: DataFrame) -> DataFrame:
    """Per-cluster integer-mean centroid: explode dims → sum div count
    per (cluster, dim) → reassemble the ordered vector."""
    ex = assign.select(
        "cluster", F.posexplode("qv").alias("dim", "v")
    )
    per_dim = ex.groupBy("cluster", "dim").agg(
        F.expr("sum(v) div count(1)").alias("m")
    )
    return (
        per_dim.groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))),
                lambda s: s.getField("m"),
            ).alias("cv")
        )
        .select(F.col("cluster").alias("cent_id"), "cv")
    )


def _assign_numpy(q: DataFrame, centroids: list[tuple[int, list[int]]]):
    """Vectorized twin of :func:`_assign`: centroids (already collected
    — K rows, the standard Lloyd driver round-trip) are closed over by
    an Arrow-batched UDF computing the argmin in one numpy broadcast.
    Integer arithmetic in int64 is exact and order-independent, so
    cluster AND d2 are bit-identical to the expression form and the
    oracle; ``np.argmin`` takes the first minimum, which with centroids
    sorted by id is exactly the (d2, cent_id) tie-break.  ~10× less
    per-row overhead than K interpreted fold evaluations."""
    cent_sorted = sorted(centroids)
    ids = np.array([c[0] for c in cent_sorted], dtype="int64")
    C = np.array([c[1] for c in cent_sorted], dtype="int64")  # (K, dim)

    @F.pandas_udf("cluster long, d2 long")
    def nearest(qv: pd.Series) -> pd.DataFrame:
        X = np.stack(qv.to_numpy()).astype("int64")  # (batch, dim)
        diff = X[:, None, :] - C[None, :, :]
        d2 = (diff * diff).sum(axis=2)  # (batch, K)
        best = d2.argmin(axis=1)
        return pd.DataFrame(
            {"cluster": ids[best], "d2": d2[np.arange(len(X)), best]}
        )

    return q.withColumn("nn", nearest("qv")).select(
        "vec_id", "qv", F.col("nn.cluster").alias("cluster"),
        F.col("nn.d2").alias("d2"),
    )


def _init_centroids(q: DataFrame, k: int) -> DataFrame:
    """Deterministic duplicate-robust init: the k DISTINCT quantized
    vectors with the lowest owning vec_id.  ``vec_id < k`` (the naive
    init) degenerates on duplicate-heavy corpora — exactly the corpora
    a dedup pipeline processes: if the first k ids are copies of one
    document, every centroid is the same point, all ties break to the
    lowest id, and Lloyd collapses to ONE cell (observed on the 10×
    stress fixture: 20k vectors → 1 cell → the within-cell pair kernel
    inherits the full O(n²)).  Grouping by the vector first guarantees
    k distinct starting points whenever the corpus has k distinct
    vectors, while remaining order-independent and SQL-replicable (the
    oracle's c0 CTE mirrors this GROUP BY)."""
    return (
        q.groupBy("qv")
        .agg(F.min("vec_id").alias("cent_id"))
        .orderBy("cent_id")
        .limit(k)
        .select("cent_id", F.col("qv").alias("cv"))
    )


# (application id, caller cache key, k, iters) → (persisted assignment,
# trained centroids).  Lloyd is deterministic (integer-exact), so a
# cached fit is bit-identical to a fresh one; queries that train cells
# in-query (the unindexed IVF / cell-pair forms) stop paying a full
# training pass per invocation — the same session-cache convention as
# derived_partsupp and the LSH signature cache, and the steady-state
# cost the bench protocol documents.
_FIT_CACHE: dict[
    tuple[str, str, int, int],
    tuple[DataFrame, list[tuple[int, list[int]]]],
] = {}
_FIT_LOCK = threading.Lock()


def _fit_store(cache_key: str, k: int, iters: int) -> tuple[str, bool]:
    """(generation dir, complete) for the persisted fit — the shared
    stamped-artifact recipe (catalog.artifact_store): identity is the
    corpus path + training params, the stamp is the full table_stamp,
    and a regenerated fixture gets a NEW directory (live readers of
    the old generation keep their files)."""
    from ..catalog import artifact_store

    real = cache_key.split("|", 1)[0]
    return artifact_store(
        "kmeans-fit", f"{real}|{k}|{iters}", cache_key
    )


def _load_persisted_fit(
    spark, cache_key: str, k: int, iters: int
) -> tuple[DataFrame, list[tuple[int, list[int]]]] | None:
    """Open a stored fit if its generation is complete for exactly
    ``cache_key`` (same corpus path AND same parquet mtime/size);
    None ⇒ train fresh."""
    from ..pipeline.txlog import TxTable

    root, complete = _fit_store(cache_key, k, iters)
    if not complete:
        return None
    cent_t = TxTable(os.path.join(root, "centroids"))
    assign_t = TxTable(os.path.join(root, "assign"))
    cents = sorted(
        (r.cent_id, list(r.cv)) for r in cent_t.read(spark).collect()
    )
    final = assign_t.read(spark).select("vec_id", "cluster", "d2")
    return final.persist(), cents


def _store_fit(
    spark,
    cache_key: str,
    k: int,
    iters: int,
    final: DataFrame,
    cent_rows: list[tuple[int, list[int]]],
) -> None:
    """Materialize a trained fit as TxTables + stamp marker (the
    IVFIndex build-once/query-many lifecycle, similarity/index.py):
    `centroids` is K rows; `assign` is (vec_id, cluster, d2) — three
    longs per corpus row, the IVF inverted-file shape, NOT the
    embedding vectors.  Marker written LAST so a crashed build is
    simply retrained; an incomplete generation has no validated
    readers, so wiping it is safe."""
    import shutil

    from ..catalog import mark_store_complete
    from ..pipeline.txlog import TxTable

    root, _ = _fit_store(cache_key, k, iters)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    TxTable(os.path.join(root, "centroids")).overwrite(
        spark.createDataFrame(
            cent_rows, "cent_id long, cv array<long>"
        )
    )
    TxTable(os.path.join(root, "assign")).overwrite(final)
    mark_store_complete(root, cache_key)


def kmeans_fit(
    embeddings: DataFrame,
    k: int = K_CLUSTERS,
    iters: int = N_ITERS,
    *,
    materialize: bool = True,
    cache_key: str | None = None,
) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """Train ``iters`` Lloyd rounds from deterministic duplicate-robust
    init (k distinct vectors, lowest owning ids — see _init_centroids)
    and return (final assignment DF (vec_id, cluster, d2), trained
    centroids sorted by id).  Centroids round-trip through the driver
    each round — K·dim longs, the standard Lloyd pattern; the corpus
    never shuffles.  The trained centroids feed the IVF index
    (similarity/ann.py) — training is integer-exact, so even a
    *trained* index stays oracle-checkable.

    The returned assignment is a lazy localCheckpoint of the THREE
    id/label columns only (not the 64-long qv vector — consumers that
    need quantized vectors re-derive them row-wise with ``quantize``,
    which is exactly reproducible): blocks persist on first consumption
    and the ContextCleaner releases them once unreferenced, while the
    cached quantized corpus is dropped here — without that unpersist,
    every IVF / cell-pairs / kmeans invocation in a long-lived session
    pins another corpus copy in executor storage memory.

    ``materialize=False`` skips the checkpoint entirely for callers
    whose downstream plan references the assignment exactly ONCE
    (kmeans_assignments): consumption then recomputes the single
    map-only quantize+argmin pass instead of paying a persist step —
    cheaper for one reference, wrong for self-joining consumers (the
    assignment subtree would compute once per plan branch)."""
    if cache_key is None:
        return _fit_train(embeddings, k, iters, materialize=materialize)
    ck = (
        embeddings.sparkSession.sparkContext.applicationId,
        cache_key,
        k,
        iters,
    )
    hit = _FIT_CACHE.get(ck)
    if hit is not None:
        return hit
    # concurrent planners (e.g. the threaded plan audit) must not race
    # the store/load of one artifact dir: serialize the miss path;
    # late arrivals then hit the memory cache
    with _FIT_LOCK:
        hit = _FIT_CACHE.get(ck)
        if hit is not None:
            return hit
        # a regenerated fixture (same path, new stamp) supersedes the
        # old fit — release its persisted assignment before rebuilding
        from ..catalog import evict_superseded

        real = cache_key.split("|", 1)[0]
        evict_superseded(
            _FIT_CACHE,
            lambda key: key[0] == ck[0]
            and key[2:] == ck[2:]
            and key[1].split("|", 1)[0] == real
            and key[1] != cache_key,
        )
        # cold-session path: a fit trained by ANY earlier session over
        # this exact corpus stamp is a stored artifact — load it
        # instead of retraining (training is integer-exact, so the
        # stored fit is bit-identical to a fresh one; VERDICT r6 #2)
        stored = _load_persisted_fit(
            embeddings.sparkSession, cache_key, k, iters
        )
        if stored is not None:
            _FIT_CACHE[ck] = stored
            return stored
        final, cents = _fit_train(
            embeddings, k, iters, materialize=False, persist_final=True
        )
        out = (final, cents)
        # promote the trained fit to a stored artifact so the NEXT
        # session opens it instead of retraining (build-once/
        # query-many; the memory entry keeps this session's plan
        # reuse).  Storing is an optimization: a failed write
        # (read-only /tmp, disk pressure) must not fail a query whose
        # compute succeeded — marker-last means a partial store is
        # simply ignored.
        try:
            _store_fit(
                embeddings.sparkSession, cache_key, k, iters, final, cents
            )
        except Exception:
            pass
        _FIT_CACHE[ck] = out
        return out


def _fit_train(
    embeddings: DataFrame,
    k: int,
    iters: int,
    *,
    materialize: bool,
    persist_final: bool = False,
) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """The actual Lloyd rounds (see kmeans_fit docstring).
    ``persist_final`` persists the assignment for multi-branch cached
    consumers; ``materialize`` lazily checkpoints it for single-branch
    uncached ones; neither ⇒ the caller recomputes the one map pass."""
    q = quantize(embeddings).cache()
    cent_rows = [
        (r.cent_id, list(r.cv)) for r in _init_centroids(q, k).collect()
    ]
    for _ in range(iters):
        assign = _assign_numpy(q, cent_rows)
        cent_rows = [
            (r.cent_id, list(r.cv)) for r in _update(assign).collect()
        ]
    final = _assign_numpy(q, cent_rows).select("vec_id", "cluster", "d2")
    if persist_final:
        final = final.persist()  # id/label columns only — 3 longs/row
    elif materialize:
        final = final.localCheckpoint(eager=False)
    q.unpersist()
    return final, sorted(cent_rows)


def kmeans_assignments(
    embeddings: DataFrame,
    k: int = K_CLUSTERS,
    iters: int = N_ITERS,
    *,
    use_numpy: bool = True,
    cache_key: str | None = None,
) -> DataFrame:
    """Run ``iters`` Lloyd rounds from the deterministic
    duplicate-robust init (k distinct vectors, lowest owning ids —
    _init_centroids) and return the final assignment
    (vec_id, cluster, d2).

    ``use_numpy=True`` collects the K centroids to the driver each
    round (K·dim longs — trivial) and assigns with the vectorized
    kernel; ``False`` keeps everything as Catalyst expressions
    (broadcast join + fold) — value-identical, kept as the
    cross-implementation check."""
    if use_numpy:
        # single downstream reference → no checkpoint (see kmeans_fit)
        return kmeans_fit(
            embeddings, k, iters, materialize=False, cache_key=cache_key
        )[0].select("vec_id", "cluster", "d2")
    q = quantize(embeddings)
    cent = _init_centroids(q, k)
    for _ in range(iters):
        cent = _update(_assign(q, cent))
    return _assign(q, cent).select("vec_id", "cluster", "d2")
