"""Product quantization (PQ) ANN — the faiss IVF-PQ recipe's
compression half, built on the engine's integer-exact Lloyd
(similarity/kmeans.py) so even a *trained, quantized* index stays
oracle-checkable bit-for-bit.

The idea: split each 64-dim vector into M=8 subspaces of 8 dims,
train a tiny k=16 codebook per subspace, and store each vector as 8
small codes (one byte each at k≤256) — an 8-byte sketch of a 256-byte
vector.  Query scoring is ADC (asymmetric distance computation): per
query, precompute the M×K lookup table of query-subvector ↔ centroid
distances, then every corpus vector's approximate distance is M table
lookups + a sum — no per-pair vector arithmetic at all.

Scale shape: training collects M·K tiny centroid rows per round
(the standard Lloyd driver round-trip); encoding and scoring are ONE
Arrow-batched map pass over the corpus (no shuffle until the final
top-k), and the scored width is |Q| distances per row.  At 100 TB the
codes table is ~32× smaller than the raw embeddings and the scan is
memory-bandwidth-bound on codes, not vectors — the reason PQ is the
billion-vector standard.

Exactness: coordinates quantize once (kmeans.py), every distance is
an int64 sum, codebooks are deterministic (duplicate-robust init,
integer means), and numpy int64 reductions are associative — so
pq_d2 values are bit-identical to the relational oracle that joins
per-subspace assignments to per-subspace query LUTs in SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .kmeans import quantize

M_SUB = 8
SUB_DIM = 8
K_CODES = 16
PQ_ITERS = 1


def _train_codebooks(
    q: DataFrame, m_sub: int, sub_dim: int, k_codes: int, iters: int
) -> list[list[tuple[int, list[int]]]]:
    """One integer-Lloyd codebook per subspace, ALL subspaces trained
    per pass: the init is one aggregation over exploded (subspace,
    subvector) rows, each Lloyd round is one Arrow assignment pass +
    one mean aggregation covering every subspace — 1 + iters Spark
    jobs total, instead of m_sub·(2·iters + 1) per-subspace
    round-trips (measured 6.0 s → ~1.5 s at sf0.1).  Results are
    bit-identical to per-subspace training (the init's per-subspace
    window, the integer means and the argmin tie-break are the same
    functions, just batched), so the unrolled per-subspace SQL oracle
    is unchanged.  Each book is the sorted [(cent_id, centroid)]
    list (ids = owning vec_ids from the deterministic init,
    kmeans.py's convention)."""

    def sub_slices():
        return F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    F.slice("qv", j * sub_dim + 1, sub_dim).alias(
                        "sqv"
                    ),
                )
                for j in range(m_sub)
            ]
        )

    subs = q.select(
        "vec_id", F.explode(sub_slices()).alias("s")
    ).select("vec_id", F.col("s.j").alias("j"), F.col("s.sqv").alias("sqv"))
    init = (
        subs.groupBy("j", "sqv")
        .agg(F.min("vec_id").alias("cent_id"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("j").orderBy("cent_id")
            ),
        )
        .filter(F.col("rn") <= k_codes)
    )
    books: list[list[tuple[int, list[int]]]] = [
        [] for _ in range(m_sub)
    ]
    for r in init.collect():
        books[r["j"]].append((r["cent_id"], list(r["sqv"])))
    books = [sorted(b) for b in books]

    for _ in range(iters):
        mats = [
            np.array([cv for (_c, cv) in b], dtype="int64")
            for b in books
        ]
        ids = [
            np.array([c for (c, _cv) in b], dtype="int64")
            for b in books
        ]

        @F.pandas_udf(T.ArrayType(T.LongType()))
        def codes_of(qv: pd.Series) -> pd.Series:
            X = np.stack(qv.to_numpy()).astype("int64")
            out = np.zeros((len(X), m_sub), dtype="int64")
            for j in range(m_sub):
                sub = X[:, j * sub_dim : (j + 1) * sub_dim]
                diff = sub[:, None, :] - mats[j][None, :, :]
                d2 = (diff * diff).sum(axis=2)
                out[:, j] = ids[j][d2.argmin(axis=1)]
            return pd.Series(list(out))

        assigned = q.withColumn("codes", codes_of("qv")).select(
            "vec_id", "codes", F.explode(sub_slices()).alias("s")
        ).select(
            F.col("s.j").alias("j"),
            F.element_at("codes", F.col("s.j") + 1).alias("cluster"),
            F.posexplode("s.sqv").alias("dim", "v"),
        )
        per_dim = assigned.groupBy("j", "cluster", "dim").agg(
            F.expr("sum(v) div count(1)").alias("m")
        )
        cent = (
            per_dim.groupBy("j", "cluster")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("dim", "m"))
                    ),
                    lambda s: s.getField("m"),
                ).alias("cv")
            )
        )
        books = [[] for _ in range(m_sub)]
        for r in cent.collect():
            books[r["j"]].append((r["cluster"], list(r["cv"])))
        books = [sorted(b) for b in books]
    return books


def pq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int,
    *,
    m_sub: int = M_SUB,
    sub_dim: int = SUB_DIM,
    k_codes: int = K_CODES,
    iters: int = PQ_ITERS,
) -> DataFrame:
    """Top-k nearest corpus vectors per query under the PQ-approximate
    squared-L2 distance (quantized integer space).  Returns
    (query_id, vec_id, pq_d2, rnk) — pq_d2 is the exact integer ADC
    sum, reproducible on any engine."""
    q = quantize(embeddings).persist()  # training collects + LUT
    # collect + final scoring all read it; unpersisted before return
    books = _train_codebooks(q, m_sub, sub_dim, k_codes, iters)
    # per-subspace centroid matrices, sorted by cent_id (the code is
    # the POSITION in this order; the oracle joins on cent_id, which
    # is order-isomorphic)
    cent_mats = [
        np.array([cv for (_cid, cv) in book], dtype="int64")
        for book in books
    ]
    qids = sorted(query_ids)
    qrows = {
        r["vec_id"]: list(r["qv"])
        for r in q.filter(F.col("vec_id").isin(qids)).collect()
    }
    missing = [i for i in qids if i not in qrows]
    if missing:
        raise ValueError(f"query ids not in embeddings: {missing}")
    q.unpersist()  # final scoring recomputes the map-only quantize
    # LUT[qi][j][c] = d2(query qi's subvector j, centroid c of book j)
    luts = np.zeros(
        (len(qids), m_sub, max(len(b) for b in books)), dtype="int64"
    )
    for qi, qid in enumerate(qids):
        qv = np.array(qrows[qid], dtype="int64")
        for j in range(m_sub):
            sub = qv[j * sub_dim : (j + 1) * sub_dim]
            diff = cent_mats[j] - sub[None, :]
            luts[qi, j, : len(books[j])] = (diff * diff).sum(axis=1)

    n_q = len(qids)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def adc(qv: pd.Series) -> pd.Series:
        X = np.stack(qv.to_numpy()).astype("int64")  # (batch, dim)
        scores = np.zeros((len(X), n_q), dtype="int64")
        for j in range(m_sub):
            sub = X[:, j * sub_dim : (j + 1) * sub_dim]
            # encode: argmin over the codebook (first-min ==
            # (d2, cent_id) tie-break, centroids sorted by id)
            diff = sub[:, None, :] - cent_mats[j][None, :, :]
            d2 = (diff * diff).sum(axis=2)  # (batch, K)
            codes = d2.argmin(axis=1)
            scores += luts[:, j, :][:, codes].T  # (batch, n_q)
        return pd.Series(list(scores))

    qid_arr = F.array(*[F.lit(int(i)).cast("long") for i in qids])
    scored = (
        q.withColumn("scores", adc("qv"))
        .select("vec_id", F.posexplode("scores").alias("qi", "pq_d2"))
        .withColumn(
            "query_id", F.element_at(qid_arr, F.col("qi") + 1)
        )
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("pq_d2").asc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "pq_d2", "rnk")
    )


def l2_topk_exact(
    embeddings: DataFrame, query_ids: list[int], k: int
) -> DataFrame:
    """Exact quantized-L2 top-k — the recall reference for pq_topk
    (same integer space, no codebook approximation)."""
    q = quantize(embeddings)
    corpus = q.select(
        F.col("vec_id").alias("c_id"), F.col("qv").alias("cqv")
    )
    queries = q.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qqv")
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("qqv"), F.col("cqv"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    j = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col("query_id") != F.col("c_id"))
        .withColumn("d2", d2)
    )
    w = W.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("c_id"))
    return (
        j.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id", F.col("c_id").alias("vec_id"), "d2", "rnk"
        )
    )


RES_OFFSET = 2_000_000  # shifts residuals (qv - centroid) non-negative


def ivfpq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int,
    *,
    n_cells: int = 16,
    n_probe: int = 4,
    cell_iters: int = 1,
    m_sub: int = M_SUB,
    sub_dim: int = SUB_DIM,
    k_codes: int = K_CODES,
    pq_iters: int = PQ_ITERS,
) -> DataFrame:
    """IVF-PQ — the faiss billion-vector architecture, composed from
    the engine's two trained-and-still-exact parts: integer-Lloyd
    coarse cells (similarity/kmeans.py, the IVF shortlist) and
    product-quantized RESIDUALS (vector − cell centroid — the classic
    refinement: residuals concentrate near zero, so the same 16-code
    books quantize them better than raw vectors).  A query ranks the
    cell centroids, probes ``n_probe`` cells, and ADC-scores ONLY
    rows in probed cells — n_probe/n_cells of the corpus touched, M
    lookups per touched row.

    Residuals are offset by ``RES_OFFSET`` to stay non-negative:
    the codebook update's integer mean uses truncating division,
    and Spark's ``div`` (toward zero) only agrees with DuckDB's
    ``//`` (floor) on non-negative operands — the offset cancels in
    every distance, so results are unchanged and the oracle stays
    bit-exact.

    Scale shape: coarse training = O(cell_iters) broadcast+argmin
    passes; residual computation, PQ training and scoring are each
    ONE Arrow map pass over the corpus (cell + residual + codes
    recomputed in-pass — at 100 TB these would be stored columns,
    see similarity/index.py for the persisted lifecycle); shuffle
    only at the final per-query top-k."""
    from .kmeans import kmeans_fit

    q = quantize(embeddings)
    _, cents = kmeans_fit(
        embeddings, n_cells, cell_iters, materialize=False
    )
    cell_ids = np.array([c for c, _cv in cents], dtype="int64")
    cell_mat = np.array([cv for _c, cv in cents], dtype="int64")

    @F.pandas_udf("cell long, rv array<long>")
    def cell_res(qv: pd.Series) -> pd.DataFrame:
        X = np.stack(qv.to_numpy()).astype("int64")
        diff = X[:, None, :] - cell_mat[None, :, :]
        d2 = (diff * diff).sum(axis=2)
        best = d2.argmin(axis=1)  # first-min == (d2, cent_id)
        rv = X - cell_mat[best] + RES_OFFSET
        return pd.DataFrame(
            {"cell": cell_ids[best], "rv": list(rv)}
        )

    res = q.withColumn("cr", cell_res("qv")).select(
        "vec_id",
        F.col("cr.cell").alias("cell"),
        F.col("cr.rv").alias("qv"),
    ).persist()  # read by the init aggregation + every Lloyd round
    books = _train_codebooks(
        res.select("vec_id", "qv"), m_sub, sub_dim, k_codes, pq_iters
    )
    res.unpersist()  # scoring recomputes cell+residual map-side
    book_mats = [
        np.array([cv for (_c, cv) in b], dtype="int64") for b in books
    ]

    qids = sorted(query_ids)
    qrows = {
        r["vec_id"]: np.array(list(r["qv"]), dtype="int64")
        for r in q.filter(F.col("vec_id").isin(qids)).collect()
    }
    missing = [i for i in qids if i not in qrows]
    if missing:
        raise ValueError(f"query ids not in embeddings: {missing}")
    # probe ranking + per-(query, probed-cell) residual LUTs
    n_q = len(qids)
    kmax = max(len(b) for b in books)
    probe_cells = np.zeros((n_q, n_probe), dtype="int64")
    luts = {}  # (qi, cell_id) -> (m_sub, kmax) int64
    for qi, qid in enumerate(qids):
        qv = qrows[qid]
        diff = cell_mat - qv[None, :]
        d2 = (diff * diff).sum(axis=1)
        order = np.lexsort((cell_ids, d2))[:n_probe]
        probe_cells[qi] = cell_ids[order]
        for ci in order:
            rq = qv - cell_mat[ci] + RES_OFFSET
            lut = np.zeros((m_sub, kmax), dtype="int64")
            for j in range(m_sub):
                sub = rq[j * sub_dim : (j + 1) * sub_dim]
                d = book_mats[j] - sub[None, :]
                lut[j, : len(books[j])] = (d * d).sum(axis=1)
            luts[(qi, int(cell_ids[ci]))] = lut
    probe_sets = [set(map(int, probe_cells[qi])) for qi in range(n_q)]

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def adc(qv: pd.Series) -> pd.Series:
        X = np.stack(qv.to_numpy()).astype("int64")
        diff = X[:, None, :] - cell_mat[None, :, :]
        best = (diff * diff).sum(axis=2).argmin(axis=1)
        cells = cell_ids[best]
        rv = X - cell_mat[best] + RES_OFFSET
        codes = np.zeros((len(X), m_sub), dtype="int64")
        for j in range(m_sub):
            sub = rv[:, j * sub_dim : (j + 1) * sub_dim]
            d = sub[:, None, :] - book_mats[j][None, :, :]
            codes[:, j] = (d * d).sum(axis=2).argmin(axis=1)
        out = np.full((len(X), n_q), -1, dtype="int64")
        sub_idx = np.arange(m_sub)
        for qi in range(n_q):
            for cell in probe_sets[qi]:
                rows = np.nonzero(cells == cell)[0]
                if len(rows):
                    lut = luts[(qi, cell)]
                    out[rows, qi] = lut[
                        sub_idx[None, :], codes[rows]
                    ].sum(axis=1)
        return pd.Series(list(out))

    qid_arr = F.array(*[F.lit(int(i)).cast("long") for i in qids])
    scored = (
        q.withColumn("scores", adc("qv"))
        .select("vec_id", F.posexplode("scores").alias("qi", "pq_d2"))
        .filter(F.col("pq_d2") >= 0)
        .withColumn(
            "query_id", F.element_at(qid_arr, F.col("qi") + 1)
        )
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("pq_d2").asc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "pq_d2", "rnk")
    )


class IVFPQIndex:
    """Persisted IVF-PQ — the billion-vector index as a STORED
    artifact (the lifecycle twin of similarity/index.py IVFIndex,
    with PQ codes instead of raw vectors in the inverted lists).
    Three TxTables under one root:

    - ``centroids/`` (cent_id, cv) — K coarse integer centroids;
    - ``books/`` (j, cent_id, cv) — the M residual codebooks;
    - ``codes/`` (vec_id, cell, codes) — the inverted file: every
      vector as M small codes (~8 bytes of payload vs 256 for the
      raw vector — the 32× compression that makes the 100 TB corpus
      a ~3 TB index), OPTIMIZE'd ``cluster_by=("cell",)`` so probes
      skip unprobed files via the manifest stats.

    Queries never touch embeddings: rank stored centroids, build the
    per-(query, cell) residual LUTs from stored books, scan only the
    probed cells' code files, sum M lookups per row.  Training is
    shared with ivfpq_topk, so stored-index results are BIT-IDENTICAL
    to the per-run operator and the same oracle applies verbatim."""

    def __init__(self, path: str) -> None:
        import os

        from ..pipeline.txlog import TxTable

        self.path = path
        self.codes_t = TxTable(os.path.join(path, "codes"))
        self.cent_t = TxTable(os.path.join(path, "centroids"))
        self.books_t = TxTable(os.path.join(path, "books"))

    @classmethod
    def build(
        cls,
        path: str,
        embeddings: DataFrame,
        *,
        n_cells: int = 16,
        cell_iters: int = 1,
        m_sub: int = M_SUB,
        sub_dim: int = SUB_DIM,
        k_codes: int = K_CODES,
        pq_iters: int = PQ_ITERS,
    ) -> "IVFPQIndex":
        from .kmeans import kmeans_fit

        spark = embeddings.sparkSession
        q = quantize(embeddings)
        _, cents = kmeans_fit(
            embeddings, n_cells, cell_iters, materialize=False
        )
        cell_ids = np.array([c for c, _cv in cents], dtype="int64")
        cell_mat = np.array([cv for _c, cv in cents], dtype="int64")

        @F.pandas_udf("cell long, rv array<long>")
        def cell_res(qv: pd.Series) -> pd.DataFrame:
            X = np.stack(qv.to_numpy()).astype("int64")
            diff = X[:, None, :] - cell_mat[None, :, :]
            best = (diff * diff).sum(axis=2).argmin(axis=1)
            rv = X - cell_mat[best] + RES_OFFSET
            return pd.DataFrame(
                {"cell": cell_ids[best], "rv": list(rv)}
            )

        res = q.withColumn("cr", cell_res("qv")).select(
            "vec_id",
            F.col("cr.cell").alias("cell"),
            F.col("cr.rv").alias("qv"),
        )
        books = _train_codebooks(
            res.select("vec_id", "qv"),
            m_sub, sub_dim, k_codes, pq_iters,
        )
        mats = [
            np.array([cv for (_c, cv) in b], dtype="int64")
            for b in books
        ]

        @F.pandas_udf(T.ArrayType(T.LongType()))
        def encode(rv: pd.Series) -> pd.Series:
            X = np.stack(rv.to_numpy()).astype("int64")
            out = np.zeros((len(X), m_sub), dtype="int64")
            for j in range(m_sub):
                sub = X[:, j * sub_dim : (j + 1) * sub_dim]
                d = sub[:, None, :] - mats[j][None, :, :]
                # store the POSITION (0..K-1) in sorted-cent_id order
                out[:, j] = (d * d).sum(axis=2).argmin(axis=1)
            return pd.Series(list(out))

        idx = cls(path)
        idx.codes_t.overwrite(
            res.withColumn("codes", encode("qv")).select(
                "vec_id", "cell", "codes"
            )
        )
        idx.codes_t.compact(
            spark,
            target_files=max(1, n_cells // 2),
            cluster_by=("cell",),
        )
        idx.cent_t.overwrite(
            spark.createDataFrame(
                cents, "cent_id long, cv array<long>"
            )
        )
        idx.books_t.overwrite(
            spark.createDataFrame(
                [
                    (j, cid, cv)
                    for j, b in enumerate(books)
                    for (cid, cv) in b
                ],
                "j long, cent_id long, cv array<long>",
            )
        )
        # the build/query contract is cross-process: persist the
        # geometry so a later opener can't misparse stored books with
        # different assumed parameters
        import json
        import os

        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(
                {
                    "m_sub": m_sub,
                    "sub_dim": sub_dim,
                    "n_cells": n_cells,
                    "k_codes": k_codes,
                    "pq_iters": pq_iters,
                },
                f,
            )
        return idx

    def _stored_geometry(self, spark: SparkSession):
        """(m_sub, sub_dim, cell_ids, cell_mat, mats) from storage —
        the shared loader for tick() and topk()."""
        import json
        import os

        m_sub, sub_dim = M_SUB, SUB_DIM
        meta_p = os.path.join(self.path, "meta.json")
        if os.path.exists(meta_p):
            with open(meta_p) as f:
                meta = json.load(f)
            m_sub, sub_dim = meta["m_sub"], meta["sub_dim"]
        cents = sorted(
            (r["cent_id"], list(r["cv"]))
            for r in self.cent_t.read(spark).collect()
        )
        cell_ids = np.array([c for c, _cv in cents], dtype="int64")
        cell_mat = np.array([cv for _c, cv in cents], dtype="int64")
        books: list[list[tuple[int, list[int]]]] = [
            [] for _ in range(m_sub)
        ]
        for r in self.books_t.read(spark).collect():
            books[r["j"]].append((r["cent_id"], list(r["cv"])))
        mats = [
            np.array([cv for (_c, cv) in sorted(b)], dtype="int64")
            for b in books
        ]
        return m_sub, sub_dim, cell_ids, cell_mat, mats

    def encode_batch(
        self, spark: SparkSession, embeddings: DataFrame
    ) -> DataFrame:
        """(vec_id, cell, codes) for a batch, encoded against the
        STORED coarse centroids and residual codebooks — the identical
        arithmetic build() runs (nearest-cell argmin, offset residual,
        per-subspace code argmin), so tick-encoded rows are
        bit-interchangeable with build-encoded ones."""
        m_sub, sub_dim, cell_ids, cell_mat, mats = self._stored_geometry(
            spark
        )

        @F.pandas_udf("cell long, codes array<long>")
        def enc(qv: pd.Series) -> pd.DataFrame:
            X = np.stack(qv.to_numpy()).astype("int64")
            diff = X[:, None, :] - cell_mat[None, :, :]
            best = (diff * diff).sum(axis=2).argmin(axis=1)
            rv = X - cell_mat[best] + RES_OFFSET
            out = np.zeros((len(X), m_sub), dtype="int64")
            for j in range(m_sub):
                sub = rv[:, j * sub_dim : (j + 1) * sub_dim]
                d = sub[:, None, :] - mats[j][None, :, :]
                out[:, j] = (d * d).sum(axis=2).argmin(axis=1)
            return pd.DataFrame(
                {"cell": cell_ids[best], "codes": list(out)}
            )

        return (
            quantize(embeddings)
            .withColumn("cc", enc("qv"))
            .select(
                "vec_id",
                F.col("cc.cell").alias("cell"),
                F.col("cc.codes").alias("codes"),
            )
        )

    def tick(
        self,
        spark: SparkSession,
        new_embeddings: DataFrame,
        *,
        batch_id: str | None = None,
    ) -> int:
        """faiss ``add()`` for IVF-PQ — the O(new) daily path beside
        IVFIndex.tick: encode the new batch against STORED artifacts
        (collects are centroid/codebook-sized, the batch itself rides
        one Arrow pass and never shuffles) and append the ~8-byte code
        rows exactly-once (a replayed crawl batch adds nothing).
        Codebooks and centroids are untouched — rebuild() on the
        maintenance cadence retrains against drift; tick files land
        unclustered, so the same cadence should
        ``codes_t.compact(cluster_by=('cell',))`` to keep probe-time
        file skipping effective."""
        return self.codes_t.append(
            self.encode_batch(spark, new_embeddings), batch_id=batch_id
        )

    def ticks_since_build(self) -> int:
        """Append commits on the codes table since the last full
        (re)build — same staleness counter as IVFIndex (driver-side
        log walk, no Spark job)."""
        n = 0
        for v in reversed(self.codes_t.versions()):
            op = self.codes_t._read_entry(v)["op"]
            if op == "overwrite":
                break
            if op == "append":
                n += 1
        return n

    def needs_retrain(
        self,
        spark: SparkSession,
        *,
        max_ticks: int = 10,
        max_skew: float = 4.0,
    ) -> bool:
        """Rebuild trigger (IVFIndex.needs_retrain semantics): tick
        count OR inverted-list skew.  PQ drift is WORSE than IVF drift
        — codebooks quantize residuals against frozen centroids, so a
        drifted batch's residuals fall outside the trained Voronoi
        cells and the 8-byte codes lose precision on top of the cell
        misassignment.  Zero ticks → False (no change possible; skips
        the skew scan and the inherent-skew rebuild-thrash trap — see
        IVFIndex.needs_retrain)."""
        ticks = self.ticks_since_build()
        if ticks == 0:
            return False
        if ticks >= max_ticks:
            return True
        row = (
            self.codes_t.read(spark)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("mx"), F.avg("n").alias("mean"))
            .first()
        )
        if row is None or row["mx"] is None:
            return False
        return float(row["mx"]) / float(row["mean"]) > max_skew

    def rebuild(
        self,
        spark: SparkSession,
        embeddings: DataFrame,
        *,
        n_cells: int | None = None,
        **build_kwargs,
    ) -> "IVFPQIndex":
        """Retrain coarse centroids AND residual codebooks from the
        full corpus, rewriting the codes table in place.  Unlike
        IVFIndex.rebuild, PQ codes are LOSSY — the raw vectors are not
        recoverable from storage — so the caller supplies the
        embeddings source (at 100 TB: the embeddings lake table the
        ticks drew from)."""
        import json
        import os

        if n_cells is None:
            meta_p = os.path.join(self.path, "meta.json")
            if os.path.exists(meta_p):
                with open(meta_p) as f:
                    n_cells = json.load(f)["n_cells"]
            else:
                n_cells = 16
        return IVFPQIndex.build(
            self.path, embeddings, n_cells=n_cells, **build_kwargs
        )

    def topk(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int,
        *,
        n_probe: int = 4,
        m_sub: int = M_SUB,
        sub_dim: int = SUB_DIM,
    ) -> DataFrame:
        """Top-k per query row (vec_id, embedding) from STORED
        artifacts only — no training, no embedding scan.  Index
        geometry (m_sub/sub_dim) comes from the stored meta.json when
        present — the caller's defaults cannot misparse the books."""
        import json
        import os

        meta_p = os.path.join(self.path, "meta.json")
        if os.path.exists(meta_p):
            with open(meta_p) as f:
                meta = json.load(f)
            m_sub, sub_dim = meta["m_sub"], meta["sub_dim"]
        cents = sorted(
            (r["cent_id"], list(r["cv"]))
            for r in self.cent_t.read(spark).collect()
        )
        cell_ids = np.array([c for c, _cv in cents], dtype="int64")
        cell_mat = np.array([cv for _c, cv in cents], dtype="int64")
        book_rows = self.books_t.read(spark).collect()
        books: list[list[tuple[int, list[int]]]] = [
            [] for _ in range(m_sub)
        ]
        for r in book_rows:
            books[r["j"]].append((r["cent_id"], list(r["cv"])))
        books = [sorted(b) for b in books]
        mats = [
            np.array([cv for (_c, cv) in b], dtype="int64")
            for b in books
        ]

        q = quantize(queries)
        qrows = sorted(
            (r["vec_id"], np.array(list(r["qv"]), dtype="int64"))
            for r in q.collect()
        )
        if not qrows:  # empty query set → empty, correctly-typed frame
            return spark.createDataFrame(
                [], "query_id long, vec_id long, pq_d2 long, rnk int"
            )
        n_q = len(qrows)
        kmax = max(len(b) for b in books)
        luts = {}
        probe_sets = []
        for qi, (_qid, qv) in enumerate(qrows):
            diff = cell_mat - qv[None, :]
            d2 = (diff * diff).sum(axis=1)
            order = np.lexsort((cell_ids, d2))[:n_probe]
            probe_sets.append(set(map(int, cell_ids[order])))
            for ci in order:
                rq = qv - cell_mat[ci] + RES_OFFSET
                lut = np.zeros((m_sub, kmax), dtype="int64")
                for j in range(m_sub):
                    sub = rq[j * sub_dim : (j + 1) * sub_dim]
                    d = mats[j] - sub[None, :]
                    lut[j, : len(books[j])] = (d * d).sum(axis=1)
                luts[(qi, int(cell_ids[ci]))] = lut

        probed = sorted(set().union(*probe_sets))
        # manifest stats skip unprobed cells' files before Spark opens
        # them; the residual In-filter also pushes to the scan
        codes = self.codes_t.read_where(
            spark,
            [("cell", ">=", probed[0]), ("cell", "<=", probed[-1])],
        ).filter(F.col("cell").isin(probed))

        @F.pandas_udf(T.ArrayType(T.LongType()))
        def adc(cell: pd.Series, codes_s: pd.Series) -> pd.Series:
            cells = cell.to_numpy().astype("int64")
            C = np.stack(codes_s.to_numpy()).astype("int64")
            out = np.full((len(cells), n_q), -1, dtype="int64")
            sub_idx = np.arange(m_sub)
            for qi in range(n_q):
                for pc in probe_sets[qi]:
                    rows = np.nonzero(cells == pc)[0]
                    if len(rows):
                        lut = luts[(qi, pc)]
                        out[rows, qi] = lut[
                            sub_idx[None, :], C[rows]
                        ].sum(axis=1)
            return pd.Series(list(out))

        qid_arr = F.array(
            *[F.lit(int(qid)).cast("long") for qid, _ in qrows]
        )
        scored = (
            codes.withColumn("scores", adc("cell", "codes"))
            .select(
                "vec_id",
                F.posexplode("scores").alias("qi", "pq_d2"),
            )
            .filter(F.col("pq_d2") >= 0)
            .withColumn(
                "query_id", F.element_at(qid_arr, F.col("qi") + 1)
            )
            .filter(F.col("vec_id") != F.col("query_id"))
        )
        w = W.partitionBy("query_id").orderBy(
            F.col("pq_d2").asc(), F.col("vec_id")
        )
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", "vec_id", "pq_d2", "rnk")
        )
