"""Graph algorithms as DataFrame passes — PageRank.

Companion to dedup/clusters.py's connected components (the other
iterative graph op in the engine): PageRank scores every node of the
similarity graph by how centrally it sits among near-duplicates —
curation pipelines use it to pick the canonical representative of a
duplicate cluster (highest-centrality doc) instead of min-id.

Arithmetic is scaled-integer (rank mass in units of 1e-12) with
truncating integer division everywhere, for the same reason
similarity/kmeans.py quantizes: every intermediate is a BIGINT, so
Spark and the DuckDB unrolled-CTE oracle are bit-identical — no IEEE
summation-order drift, hash-checkable.  All quantities are positive,
where Spark's ``div`` (truncate) and DuckDB's ``//`` (floor) agree.

Scale shape per iteration: one join of the bidirectional edge list
against the rank relation (shuffle on node id) + one aggregate — the
standard message-passing round.  Edge list is localCheckpoint-ed once
(it feeds every round and derives from the applyInPandas cosine
kernel); rank lineage stays O(iterations), truncate further via
checkpoint_interval for long runs (see connected_components notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12  # rank unit = 1e-12 of total mass
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio


def pagerank(
    pairs: DataFrame,
    *,
    src: str = "vec_a",
    dst: str = "vec_b",
    iterations: int = 3,
    checkpoint_interval: int = 8,
) -> DataFrame:
    """Undirected PageRank over an (src, dst) edge list → (node,
    pr_scaled) with pr_scaled = rank in units of 1/SCALE.  Only
    edge-touched nodes participate (every node therefore has degree
    ≥ 1 and incoming mass — no dangling-node term needed).

    ``checkpoint_interval`` (VERDICT r11 #6, guide §5): every N rounds
    the node-sized rank relation is EAGERLY localCheckpoint-ed, so
    Catalyst plans at most N message-passing rounds at a time instead
    of a K-deep nest — the lineage cap for large-K runs.  Value-
    neutral (a checkpoint changes where rows live, never what they
    are).  The default 8 is deliberately ABOVE the registered K=3:
    interleaved A/B at sf0.1 measured eager per-run checkpointing a
    net LOSS at K=3 (best 0.78 vs 0.74 s — the materialization job
    costs more than 3-round planning), while at K=24 it trims the
    deep-plan tail; pass a smaller interval for long convergence
    runs (pagerank_until_converged already truncates per round)."""
    bi, deg, n_nodes, ranks = _pr_setup(pairs, src, dst)
    for i in range(iterations):
        ranks = _pr_round(bi, deg, n_nodes, ranks)
        if (
            checkpoint_interval
            and (i + 1) % checkpoint_interval == 0
            and (i + 1) < iterations
        ):
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.selectExpr("node", "pr AS pr_scaled")


def _pr_setup(pairs: DataFrame, src: str, dst: str):
    """Shared initialization: the bidirectional edge list is
    repartitioned BY SOURCE before its checkpoint, so every round's
    edges⋈ranks join reuses the stored partitioning instead of
    re-exchanging the (larger) edge side per round; the node count
    round-trips the driver once (one scalar — the kmeans-argmax
    pattern) so the per-round teleport term is a folded literal
    instead of a crossJoin with a 1-row relation in every round's
    plan.  Measured together: 1.23 → 0.92 s for 3 rounds at sf0.1
    (warm edges).  Both changes are value-invariant (same integer
    arithmetic, partitioning never affects integer sums)."""
    from ..exprs import sql_ident

    bi = (
        pairs.selectExpr(f"{sql_ident(src)} AS s", f"{sql_ident(dst)} AS d")
        .union(pairs.selectExpr(f"{sql_ident(dst)} AS s", f"{sql_ident(src)} AS d"))
        .repartition("s")
        .localCheckpoint(eager=False)  # feeds every round
    )
    deg = (
        bi.groupBy("s")
        .agg(F.expr("count(1) AS deg"))
        .withColumnRenamed("s", "node")
    )
    n_nodes = deg.count()
    ranks = deg.selectExpr(
        "node",
        "deg",
        f"CAST({SCALE // max(n_nodes, 1)} AS long) AS pr",
    )
    return bi, deg, n_nodes, ranks


def _pr_round(
    bi: DataFrame, deg: DataFrame, n_nodes: int, ranks: DataFrame
) -> DataFrame:
    """One message-passing round — shared verbatim by the bounded and
    the until-converged forms, so the two are the same computation."""
    contrib = (
        bi.join(ranks, bi["s"] == ranks["node"])
        .selectExpr("d AS cnode", "pr div deg AS share")
        .groupBy("cnode")
        .agg(F.expr("sum(share) AS contrib"))
    )
    base = (15 * SCALE) // (100 * max(n_nodes, 1))
    return deg.join(contrib, deg["node"] == contrib["cnode"]).selectExpr(
        "node",
        "deg",
        f"CAST({base} + (({DAMP_NUM} * contrib) div {DAMP_DEN}) "
        "AS long) AS pr",
    )


def pagerank_until_converged(
    pairs: DataFrame,
    *,
    src: str = "vec_a",
    dst: str = "vec_b",
    tol_scaled: int = 10**6,
    max_iterations: int = 100,
) -> tuple[DataFrame, int]:
    """PageRank iterated until the rank mass stops moving — the
    PRODUCTION variant of :func:`pagerank`, whose fixed round budget
    exists for cross-engine hash equality (both engines run the
    identical bounded computation), not because 3 rounds suffice on
    every graph.

    Driver-side delta loop: after each round, one 1-row aggregate
    collects Σ|pr_new − pr_old| (scaled-integer, so the test is exact
    arithmetic); the loop stops when the delta is ≤ ``tol_scaled`` or
    at ``max_iterations``.  The default tolerance is 10⁶ rank units =
    1e-6 of total mass (units are 1e-12ths): the damping contraction
    shrinks the delta ~0.6× per round (measured on the fixture graph),
    so the tail below any practical tolerance is noise-sized, while an
    EXACT integer fixpoint may never arrive (truncating division can
    leave ±1-unit flutter indefinitely — don't pass 0).  Per round
    the per-node rank relation is lazily localCheckpoint-ed — lineage
    stays O(1) per round instead of O(rounds), the same discipline as
    connected_components.  Cost per round beyond the bounded form: one
    extra node-keyed join + 1-row collect — the price of knowing you
    converged.  Oracle-exempt by design (the stopping round depends on
    the data); equality to the bounded form at the same round count is
    pinned in tests/test_graph_converged.py.

    Returns ``(ranks, rounds_run)``.
    """
    bi, deg, n_nodes, ranks = _pr_setup(pairs, src, dst)
    ranks = ranks.localCheckpoint(eager=False)
    rounds = 0
    for rounds in range(1, max_iterations + 1):
        new = _pr_round(bi, deg, n_nodes, ranks).localCheckpoint(
            eager=False
        )
        delta = (
            new.select("node", F.col("pr").alias("pr_new"))
            .join(ranks.select("node", "pr"), "node")
            .agg(
                F.coalesce(
                    F.sum(F.abs(F.col("pr_new") - F.col("pr"))), F.lit(0)
                ).alias("d")
            )
            .collect()[0]["d"]
        )
        ranks = new
        if delta <= tol_scaled:
            break
    return ranks.select("node", F.col("pr").alias("pr_scaled")), rounds


def kcore_until_converged(
    edges: DataFrame,
    k: int,
    *,
    src: str = "vec_a",
    dst: str = "vec_b",
    max_rounds: int = 1000,
    estimated_edge_rows: int | None = None,
) -> tuple[DataFrame, int]:
    """k-core peel iterated until NO node is removed — the PRODUCTION
    variant of the bounded peel in queries/graph.py graph_kcore (whose
    fixed 10-round budget exists for cross-engine equality; a 100×
    graph may need deeper peeling).  Driver-side loop: one surviving-
    node count per round (peeling strictly shrinks the node set, so
    `count unchanged` IS the fixpoint test — no frame diff needed);
    per-round node frames are lazily localCheckpoint-ed to keep the
    plan linear in rounds.  Returns ``((vec_id, core_degree), rounds)``
    where rounds counts peel iterations INCLUDING the final no-change
    confirmation round.

    ``estimated_edge_rows`` (a DRIVER-SIDE estimate — e.g. the stored
    edge artifact's manifest row count, no job) arms the memory
    pre-flight (VERDICT r10 #5): the peel's edge⋈keep sorts run at a
    partition count sized so buffers fit the execution pool
    (peel_shuffle_partitions), or the call raises
    :class:`KCoreMemoryError` with the DEPLOY.md sizing rule BEFORE
    any job launches instead of an opaque executor OOM mid-peel."""
    spark = edges.sparkSession
    override = kcore_preflight_partitions(spark, estimated_edge_rows)
    with peel_partitions_scope(spark, override):
        e = edges.select(
            F.col(src).alias("vec_a"), F.col(dst).alias("vec_b")
        ).localCheckpoint(eager=False)
        keep = (
            e.select(F.col("vec_a").alias("vec_id"))
            .unionAll(e.select(F.col("vec_b").alias("vec_id")))
            .distinct()
            .localCheckpoint(eager=False)
        )
        n_prev = keep.count()
        deg = None
        rounds = 0
        for rounds in range(1, max_rounds + 1):
            ka = keep.select(F.col("vec_id").alias("a_id"))
            kb = keep.select(F.col("vec_id").alias("b_id"))
            er = e.join(ka, e.vec_a == ka.a_id).join(
                kb, e.vec_b == kb.b_id
            )
            deg = (
                er.select(F.col("vec_a").alias("vec_id"))
                .unionAll(er.select(F.col("vec_b").alias("vec_id")))
                .groupBy("vec_id")
                .agg(F.count(F.lit(1)).alias("deg"))
            )
            keep = (
                deg.filter(F.col("deg") >= k)
                .select("vec_id")
                .localCheckpoint(eager=False)
            )
            n_now = keep.count()
            if n_now == n_prev:
                break
            n_prev = n_now
        out = keep.join(deg, "vec_id").select(
            "vec_id", F.col("deg").cast("long").alias("core_degree")
        )
        if override is not None:
            # the final join recomputes deg (one more edge⋈keep pass)
            # and the caller collects AFTER this scope restores the
            # session partition count — materialize it here, at the
            # pre-flighted width, so no sized join ever runs outside
            # the scope
            out = out.localCheckpoint(eager=True)
    return out, rounds


# ------------------------------------------------ round 11: peel pre-flight

KCORE_EDGE_ROW_BYTES = 48  # bidirectional endpoint pair in the sort
# buffer: 2 BIGINTs + UnsafeRow/sorter overhead, measured order of
# magnitude, deliberately pessimistic
KCORE_SORT_SAFETY = 3  # DEPLOY.md executor-sizing rule: one shuffle
# partition of the largest join must fit ~x3 in memory (sort-merge
# buffers)
KCORE_MAX_SHUFFLE_PARTITIONS = 4096  # beyond this the per-partition
# scheduling overhead dominates a local peel; a cluster deployment
# retunes it with the pool


class KCoreMemoryError(RuntimeError):
    """The k-core peel would not fit the execution-memory pool at any
    sane partition count — raised BEFORE any job launches, with the
    DEPLOY.md sizing rule in the message (VERDICT r10 #5: the failure
    used to surface as an opaque executor OOM mid-peel)."""


def peel_shuffle_partitions(
    edge_rows: int,
    *,
    heap_bytes: int,
    cores: int,
    current_partitions: int,
) -> int:
    """DEPLOY.md's executor-sizing rule made executable for the peel's
    dominant operator (the per-round edge⋈keep sort-merge join): one
    shuffle partition of the edge side must fit ~KCORE_SORT_SAFETY x
    in a task's execution-memory share, so the required partition
    count is  edge_rows * row_bytes * safety / per_task_pool,  where
    per_task_pool ≈ heap * 0.3 / cores (spark.memory.fraction 0.6,
    execution half of the unified region under storage pressure —
    local mode, where driver heap IS the executor pool).

    Returns the partition count the peel should run at (never lower
    than ``current_partitions``); raises :class:`KCoreMemoryError`
    when even KCORE_MAX_SHUFFLE_PARTITIONS partitions cannot fit —
    at that point the operator needs a bigger heap
    (SPARK_GRAFT_DRIVER_MEM, DEPLOY.md "local mode" table), not more
    partitions.  Measured calibration: the 256M-edge 100x fixture
    OOMs mid-peel at 8g/32-partition defaults (SCALING.md round-10
    note) — this formula asks for ~460 partitions there, and fails
    fast only past ~2.3B edges at 8g."""
    import math

    per_task_pool = heap_bytes * 0.3 / max(cores, 1)
    need = math.ceil(
        edge_rows * KCORE_EDGE_ROW_BYTES * KCORE_SORT_SAFETY
        / max(per_task_pool, 1)
    )
    if need <= current_partitions:
        return current_partitions
    if need > KCORE_MAX_SHUFFLE_PARTITIONS:
        heap_gib = heap_bytes / (1 << 30)
        want_gib = math.ceil(
            edge_rows
            * KCORE_EDGE_ROW_BYTES
            * KCORE_SORT_SAFETY
            * max(cores, 1)
            / (0.3 * KCORE_MAX_SHUFFLE_PARTITIONS)
            / (1 << 30)
        )
        raise KCoreMemoryError(
            f"k-core peel pre-flight: ~{edge_rows:,} edges need "
            f"{need} shuffle partitions to fit sort buffers in a "
            f"{heap_gib:.1f} GiB heap across {cores} cores, above the "
            f"{KCORE_MAX_SHUFFLE_PARTITIONS}-partition ceiling.  Raise "
            f"the pool instead: SPARK_GRAFT_DRIVER_MEM={want_gib}g "
            "(DEPLOY.md, 'local mode' sizing rule: one shuffle "
            "partition of the largest join must fit ~3x in memory)."
        )
    return need


def _session_pool(spark) -> tuple[int, int, int]:
    """(heap_bytes, cores, current shuffle partitions) of the live
    session — driver-side conf reads only, no job."""
    mem = spark.conf.get("spark.driver.memory", "8g").strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    if mem and mem[-1] in units:
        heap = int(float(mem[:-1]) * units[mem[-1]])
    else:
        heap = int(mem) if mem.isdigit() else 8 << 30
    cores = spark.sparkContext.defaultParallelism
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return heap, cores, parts


class peel_partitions_scope:
    """Context manager applying a pre-flighted shuffle-partition count
    for the peel's jobs and restoring the session value after — the
    peel is the rare operator whose join width is set by a DATA
    estimate (the stored edge artifact's manifest stats) rather than
    the session default.  AQE coalesces the extra partitions wherever
    the estimate was pessimistic, so raising is monotone-safe."""

    def __init__(self, spark, partitions: int | None):
        self.spark, self.partitions = spark, partitions

    def __enter__(self):
        if self.partitions is not None:
            self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
            self.spark.conf.set(
                "spark.sql.shuffle.partitions", str(self.partitions)
            )
        return self

    def __exit__(self, *exc):
        if self.partitions is not None:
            self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)
        return False


def kcore_preflight_partitions(
    spark, estimated_edge_rows: int | None
) -> int | None:
    """Partition count for a peel over ``estimated_edge_rows`` edges
    (None = no estimate available → no override, today's behavior), or
    raise :class:`KCoreMemoryError` actionably before any job runs."""
    if estimated_edge_rows is None:
        return None
    heap, cores, parts = _session_pool(spark)
    need = peel_shuffle_partitions(
        estimated_edge_rows,
        heap_bytes=heap,
        cores=cores,
        current_partitions=parts,
    )
    return None if need == parts else need
