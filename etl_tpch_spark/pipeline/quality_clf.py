"""In-engine quality-classifier training — the fastText/CCNet-style
model-score gate, trained inside the engine (VERDICT r7 #3).

Completes the curation lifecycle: the engine already TRAINS its
statistical LM (pipeline/lm_index.py) and its tokenizer (queries/bpe.py)
in-engine, but the model-score gate (curation_model_filter,
functions/gbtree.py) only *applied* an externally-supplied model.  This
module trains the linear classifier itself: logistic regression over
hashed n-gram presence features, labels from the in-domain reference
source split (source == 'src0', the same wiki stand-in the reference LM
trains on — queries/text.py _LM_REF_SOURCE).

Exactness trick (the quantized-Lloyd recipe, similarity/kmeans.py): NO
float ever enters the loop, so training is bit-identical across
engines, partitionings and retries — and therefore unrolled-CTE
oracle-checkable in DuckDB:

- features: presence (0/1) of md5-hashed unigram+bigram buckets —
  integers by construction;
- weights/probabilities: fixed-point BIGINT at scale F = 10^6;
- sigmoid: the HARD sigmoid clamp((t+4)/8, 0, 1), computed as
  ``GREATEST(0, LEAST(8F, z + 4F)) intdiv 8`` — the clamp runs BEFORE
  the division so the divided operand is non-negative, where Spark's
  truncating ``DIV`` and DuckDB's ``//`` agree;
- gradient: integer sums (associative — order-free), CLASS-BALANCED:
  each residual is weighted by the OPPOSITE class's doc count
  (m_pos = n_neg, m_neg = n_pos), i.e. the gradient of the balanced
  risk (1/2)[mean_pos + mean_neg] scaled by 2·n_pos·n_neg.  Quality
  filters train on a ~5% in-domain slice; with the unbalanced mean
  the 95% negatives drown the signal (measured: separation INVERTED
  at sf0.01), while balancing makes class-common buckets cancel
  exactly in round 1 and the weights a true discriminative direction;
- update: w <- w - floordiv(g, 2 * LR_DEN * n_pos * n_neg), with
  floordiv spelled as ``CASE WHEN g >= 0 THEN g intdiv d ELSE
  -((-g + d - 1) intdiv d) END`` so every engine division sees
  non-negative operands (Python's ``//`` floors natively and matches).
  int64 headroom: |g_b| <= n·max(n_pos, n_neg)·F ~ 2.4e17 at the
  100x fixture — two decades under 2^63.

Scale shape per round (the Lloyd/BPE driver pattern): one broadcast of
the (B+1)-row weight table, one shuffle to doc_id for z, one shuffle to
bucket for the gradient, one (B+1)-row collect.  K bounded rounds; the
corpus never moves except those two keyed aggregations, and the
persisted-index path (:class:`QualityClfIndex`) scores new batches
against STORED weights — one broadcast join per tick, zero retraining.

Reference scope: coiled/etl-tpch has no classifier counterpart (its
pipeline is relational only — reference pipeline/preprocess.py keeps
derived state in Delta tables, which is the lifecycle the TxTable
artifact mirrors); this module is north-star LLM-data surface
(SURVEY.md §2 "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from ..functions.text import sql_token_hash, token_hash, tokens
from .txlog import TxTable

CLF_BUCKETS = 1024  # hashed feature buckets; bucket id CLF_BUCKETS = bias
CLF_ROUNDS = 4  # demo K (real runs: more rounds, same per-round plan)
F_SCALE = 1_000_000  # fixed-point scale for weights / probabilities
LR_DEN = 2  # learning rate 1/LR_DEN
CLF_REF_SOURCE = "src0"  # in-domain label source (== text._LM_REF_SOURCE)
# Semantic version of the TRAINING RULE, folded into the persisted-fit
# stamp: numeric hyper-params alone cannot distinguish two trainers
# with the same (B, K, lr) but different update semantics, and a stale
# generation built by an older rule would silently serve wrong weights
# (caught live in round 8: the pre-class-balancing store answered for
# the balanced trainer until this tag split the generations).
CLF_TRAINER_VERSION = "balanced-v2"


# ---------------------------------------------------------------- features


def doc_features(docs: DataFrame) -> DataFrame:
    """(doc_id, b) — DISTINCT hashed unigram+bigram presence buckets
    per document, plus the bias bucket (b = CLF_BUCKETS, every doc).
    Presence (not counts) keeps the gradient bounded by n·F per bucket
    and the z magnitudes within the hard-sigmoid clamp's useful range.
    Unigrams contain no spaces and bigrams are 'w1 w2', so the two
    n-gram orders can never collide pre-hash."""
    toks = docs.select("doc_id", tokens(F.col("text")).alias("W"))
    uni = toks.select("doc_id", F.explode("W").alias("tok"))
    bi = toks.filter(F.size("W") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(W) - 1), "
                "i -> concat(element_at(W, i), ' ', element_at(W, i + 1)))"
            )
        ).alias("tok"),
    )
    grams = uni.unionAll(bi).select(
        "doc_id",
        F.pmod(token_hash(F.col("tok")), F.lit(CLF_BUCKETS)).alias("b"),
    )
    bias = docs.select("doc_id", F.lit(CLF_BUCKETS).cast("long").alias("b"))
    return grams.distinct().unionAll(bias)


def sql_doc_features(docs_rel: str = "documents") -> str:
    """DuckDB CTE body computing the same (doc_id, b) presence rows."""
    toks = "list_filter(string_split(text, ' '), x -> x <> '')"
    h = sql_token_hash("tok")
    return f"""(
        SELECT DISTINCT doc_id, {h} % {CLF_BUCKETS} AS b
        FROM (
            SELECT doc_id, unnest(W) AS tok
            FROM (SELECT doc_id, {toks} AS W FROM {docs_rel})
            UNION ALL
            SELECT doc_id,
                   unnest(list_transform(range(1, len(W)),
                          i -> W[i] || ' ' || W[i+1])) AS tok
            FROM (SELECT doc_id, {toks} AS W FROM {docs_rel})
        )
        UNION ALL
        SELECT doc_id, CAST({CLF_BUCKETS} AS BIGINT) AS b FROM {docs_rel}
    )"""


# ---------------------------------------------------------------- trainer


def _hard_sigmoid_expr(zcol: str) -> str:
    """Fixed-point hard sigmoid p_q = clamp((z+4F)/8, 0, F): clamp
    first, divide after — the divided operand is non-negative, where
    truncating and flooring integer division agree."""
    return (
        f"GREATEST(CAST(0 AS BIGINT), LEAST(CAST({8 * F_SCALE} AS BIGINT), "
        f"{zcol} + {4 * F_SCALE})) DIV 8"
    )


def _floordiv(g: int, d: int) -> int:
    """Python floor division IS the cross-engine fdiv (both SQL twins
    spell it via non-negative-operand CASE)."""
    return g // d


def labels_frame(
    docs: DataFrame,
    n_pos: int,
    n_neg: int,
    ref_source: str = CLF_REF_SOURCE,
) -> DataFrame:
    """(doc_id, yF, m): fixed-point label and the balanced-risk
    multiplier — each doc's residual is weighted by the OPPOSITE
    class's count so both classes contribute equal total gradient
    mass regardless of the in-domain slice's share."""
    is_pos = F.col("source") == ref_source
    return docs.select(
        "doc_id",
        F.when(is_pos, F.lit(F_SCALE)).otherwise(F.lit(0))
        .cast("long")
        .alias("yF"),
        F.when(is_pos, F.lit(n_neg)).otherwise(F.lit(n_pos))
        .cast("long")
        .alias("m"),
    )


def train_logreg(
    spark: SparkSession,
    feat: DataFrame,
    labels: DataFrame,
    n_pos: int,
    n_neg: int,
    rounds: int = CLF_ROUNDS,
) -> list[int]:
    """K fixed-point batch-gradient rounds over (doc_id, b) presence
    rows and (doc_id, yF, m) labels (:func:`labels_frame`).  Per
    round: broadcast the (B+1)-row weight table, aggregate z per doc,
    residuals through the hard sigmoid weighted by the balance
    multiplier, aggregate the gradient per bucket, collect (B+1
    rows), update weights driver-side in exact integer arithmetic.
    Returns the weight list indexed by bucket (bias last)."""
    w = [0] * (CLF_BUCKETS + 1)
    d = 2 * LR_DEN * n_pos * n_neg
    for _ in range(rounds):
        wdf = spark.createDataFrame(
            list(enumerate(w)), "b long, w long"
        )
        z = (
            feat.join(F.broadcast(wdf), "b")
            .groupBy("doc_id")
            .agg(F.sum("w").alias("z"))
        )
        r = z.join(labels, "doc_id").select(
            "doc_id",
            (
                (F.expr(_hard_sigmoid_expr("z")) - F.col("yF"))
                * F.col("m")
            ).alias("r"),
        )
        g_rows = (
            feat.join(r, "doc_id")
            .groupBy("b")
            .agg(F.sum("r").alias("g"))
            .collect()
        )
        for row in g_rows:
            w[row["b"]] -= _floordiv(int(row["g"]), d)
    return w


def train_logreg_driver(
    feat_rows: list[tuple[int, int]],
    label_rows: dict[int, tuple[int, int]],
    n_pos: int,
    n_neg: int,
    rounds: int = CLF_ROUNDS,
) -> list[int]:
    """Pure-Python reference trainer — byte-identical semantics to
    :func:`train_logreg` (pinned in tests/test_quality_clf.py): same
    presence rows, same hard sigmoid, same balanced multiplier, same
    floor-division update.  ``label_rows`` maps doc_id -> (yF, m).
    No Spark session touched."""
    by_doc: dict[int, list[int]] = {}
    for doc_id, b in feat_rows:
        by_doc.setdefault(doc_id, []).append(b)
    w = [0] * (CLF_BUCKETS + 1)
    d = 2 * LR_DEN * n_pos * n_neg
    for _ in range(rounds):
        g = [0] * (CLF_BUCKETS + 1)
        for doc_id, bs in by_doc.items():
            z = sum(w[b] for b in bs)
            p = max(0, min(8 * F_SCALE, z + 4 * F_SCALE)) // 8
            yF, m = label_rows[doc_id]
            r = (p - yF) * m
            for b in bs:
                g[b] += r
        for b in range(CLF_BUCKETS + 1):
            w[b] -= g[b] // d
    return w


def weights_frame(spark: SparkSession, w: list[int]) -> DataFrame:
    return spark.createDataFrame(list(enumerate(w)), "b long, w long")


def score_with_weights(feat: DataFrame, wdf: DataFrame) -> DataFrame:
    """(doc_id, score_q, prob_micro) from presence rows and a weight
    table — ONE broadcast join + one per-doc aggregate; the weights
    frame is model-sized (B+1 rows) by construction, so the broadcast
    is explicit (the createDataFrame-local-relation size-estimate trap,
    queries/bpe.py text_bpe_token_counts)."""
    z = (
        feat.join(F.broadcast(wdf), "b")
        .groupBy("doc_id")
        .agg(F.sum("w").alias("score_q"))
    )
    return z.select(
        "doc_id",
        "score_q",
        F.expr(_hard_sigmoid_expr("score_q")).alias("prob_micro"),
    )


# ------------------------------------------------------- persisted index


class QualityClfIndex:
    """Persisted classifier artifact: a TxTable of (b, w) weight rows.

    Lifecycle mirrors LmIndex (pipeline/lm_index.py) with the roles a
    discriminative model needs:

    - ``retrain`` OVERWRITES the weight table (weights, unlike bigram
      counts, do not fold by summation — retraining is the update
      path), pinned to the training inputs via the TxTable's atomic
      versioned commit;
    - ``score_batch`` scores ONLY the given batch against STORED
      weights — one feature pass over the new docs + one broadcast
      join; no training text is touched, no scored corpus rescanned.
      That is the O(new) daily-crawl tick.
    """

    def __init__(self, path: str) -> None:
        self.table = TxTable(path)

    def retrain(
        self,
        spark: SparkSession,
        docs: DataFrame,
        *,
        rounds: int = CLF_ROUNDS,
        ref_source: str = CLF_REF_SOURCE,
    ) -> list[int]:
        """Train on ``docs`` (labels = source match) and store the
        weights.  Deterministic: same corpus → bit-identical weight
        table, so a concurrent duplicate retrain is benign."""
        feat = doc_features(docs).localCheckpoint(eager=True)
        n_pos = docs.filter(F.col("source") == ref_source).count()
        n_neg = docs.count() - n_pos
        labels = labels_frame(docs, n_pos, n_neg, ref_source)
        w = train_logreg(spark, feat, labels, n_pos, n_neg, rounds)
        self.table.overwrite(weights_frame(spark, w))
        return w

    def weights(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        return self.table.read(spark, version)

    def score_batch(
        self, spark: SparkSession, new_docs: DataFrame
    ) -> DataFrame:
        """(doc_id, score_q, prob_micro) for the NEW batch only, from
        stored weights."""
        return score_with_weights(
            doc_features(new_docs), self.weights(spark)
        )
