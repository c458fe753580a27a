"""BPE tokenizer training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") — the vocabulary-build
step of every LLM data pipeline, as a Spark-first operator.

The published algorithm is: collect the corpus word-frequency table,
then repeatedly merge the most frequent adjacent symbol pair inside
words.  The corpus-sized work is ONLY the word count (one shuffle);
every merge iteration runs on the vocabulary frame (orders of magnitude
smaller than the corpus — ~31 rows on the fixture, a few million for a
real corpus), with a single 1-row argmax collect per round (the
kmeans-Lloyd driver pattern, allowlisted in PLANS.md).

Cross-engine determinism: self-pairs (l == r) are excluded from merge
candidates.  For l != r, adjacent-pair matches can never overlap
(position i and i+1 matching both would need tok[i+1] = r = l), so
"merge every match" is well-defined and order-free — exactly the
property that makes the merge expressible as one relational transform
in BOTH engines, where greedy left-to-right merging of self-pair runs
(aaa) is inherently sequential.  Ties break on (count DESC, lhs, rhs):
a total order, because (lhs, rhs) is the grouping key.

The DuckDB oracle re-derives the whole trainer as K unrolled CTE
rounds (the PQ/IVF-PQ recipe) and matches bit-for-bit: pair counts are
exact integers and merges are string concatenation.

Reference scope note: coiled/etl-tpch has no tokenizer counterpart
(its pipeline is relational only); this module is part of the
north-star LLM-data surface (SURVEY.md §2 "beyond the reference").
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import Tables
from ..functions.text import tokens
from ..registry import query
from .text import _SQL_TOKS

_BPE_K = 6  # merge rounds (fixture vocabulary saturates quickly; real
# tokenizers run 30k-100k rounds of the same per-round plan)


# ---------------------------------------------------------------- oracle
# (generated: K unrolled rounds of pair-count -> argmax -> merge-apply)


def _sql_merge_apply(tcol: str, bcte: str) -> str:
    """DuckDB list expression applying merge (l, r) everywhere in T.
    Element i becomes l||r when it starts a match; the consumed element
    (previous is l, self is r) drops; everything else passes through.
    The two conditions are mutually exclusive because l != r."""
    return (
        f"list_filter(list_transform(range(1, len({tcol})+1), i -> "
        f"CASE WHEN i < len({tcol}) AND {tcol}[i] = {bcte}.l "
        f"AND {tcol}[i+1] = {bcte}.r THEN {tcol}[i] || {tcol}[i+1] "
        f"WHEN i > 1 AND {tcol}[i-1] = {bcte}.l AND {tcol}[i] = {bcte}.r "
        f"THEN NULL ELSE {tcol}[i] END), x -> x IS NOT NULL)"
    )


def _bpe_ctes(where: str = "") -> str:
    parts = [
        f"""wf AS (
            SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
            FROM (SELECT unnest({_SQL_TOKS}) AS w FROM documents {where})
            GROUP BY w
        ), v0 AS (
            SELECT word, freq,
                   list_transform(range(1, length(word)+1), i -> word[i]) AS T
            FROM wf
        )"""
    ]
    for k in range(1, _BPE_K + 1):
        parts.append(
            f"""p{k} AS (
            SELECT T[i] AS l, T[i+1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
            FROM v{k-1}, unnest(range(1, len(T))) AS t(i)
            WHERE T[i] <> T[i+1] GROUP BY 1, 2
        ), b{k} AS (
            SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1
        ), v{k} AS (
            -- LEFT JOIN, not CROSS: when merge candidates dry up
            -- before round K (empty b{{k}}), the vocabulary must pass
            -- through unchanged — matching the engine loop's break —
            -- not annihilate to zero rows
            SELECT word, freq,
                   CASE WHEN b{k}.l IS NULL THEN T
                        ELSE {_sql_merge_apply('T', f'b{k}')} END AS T
            FROM v{k-1} LEFT JOIN b{k} ON TRUE
        )"""
        )
    return ",\n".join(parts)


_SQL_BPE_MERGES = (
    "WITH "
    + _bpe_ctes()
    + "\n"
    + " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS merge_rank, l AS lhs, r AS rhs, "
        f"l || r AS merged, cnt AS pair_count FROM b{k}"
        for k in range(1, _BPE_K + 1)
    )
)

_SQL_BPE_SEGMENT = (
    "WITH "
    + _bpe_ctes()
    + f"""
    SELECT word, freq,
           CAST(len(T) AS BIGINT) AS n_subwords,
           array_to_string(T, ' ') AS segmentation
    FROM v{_BPE_K}"""
)


# ---------------------------------------------------------------- engine


def _spark_merge_expr(l: str, r: str) -> str:
    """Spark SQL twin of _sql_merge_apply with (l, r) bound as literals
    (the 1-row argmax is collected, kmeans-style).  try_element_at keeps
    the boundary probes NULL-safe under ANSI mode; transform's lambda
    index i is 0-based, try_element_at is 1-based, so i+2 is the next
    element and i the previous."""
    ls = l.replace("\\", "\\\\").replace("'", "\\'")
    rs = r.replace("\\", "\\\\").replace("'", "\\'")
    return (
        "filter(transform(T, (x, i) -> "
        f"CASE WHEN x = '{ls}' AND try_element_at(T, i + 2) = '{rs}' "
        f"THEN x || '{rs}' "
        f"WHEN x = '{rs}' AND i > 0 AND try_element_at(T, i) = '{ls}' "
        "THEN NULL "
        "ELSE x END), x -> x IS NOT NULL)"
    )


def _word_vocab(t: Tables) -> DataFrame:
    """(word, freq, T=chars) — the ONLY corpus-sized stage (one explode
    + one count shuffle); everything after runs on the vocabulary."""
    wf = (
        t.documents.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    chars = F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
    return wf.select("word", "freq", chars.alias("T"))


def _train(t: Tables) -> tuple[list[Row], DataFrame]:
    """Run K merge rounds; returns (merge table rows, final vocab frame)."""
    v0 = _word_vocab(t).cache()
    v = v0
    merges: list[Row] = []
    for k in range(1, _BPE_K + 1):
        pairs = (
            v.filter(F.size("T") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(T) - 1), "
                        "i -> struct(element_at(T, i) AS l, "
                        "element_at(T, i + 1) AS r))"
                    )
                ).alias("p"),
            )
            .select("freq", "p.l", "p.r")
            .filter(F.col("l") != F.col("r"))
            .groupBy("l", "r")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(
            F.col("cnt").desc(), F.col("l"), F.col("r")
        ).first()
        if best is None:  # vocabulary fully merged
            break
        merges.append(
            Row(
                merge_rank=k,
                lhs=best.l,
                rhs=best.r,
                merged=best.l + best.r,
                pair_count=int(best.cnt),
            )
        )
        # localCheckpoint truncates the lineage each round (the
        # clusters/pagerank iterative pattern) — without it the final
        # frame's plan nests K rounds of the merge expression and the
        # printed plan grows 2^K scan nodes
        v = v.select(
            "word", "freq", F.expr(_spark_merge_expr(best.l, best.r)).alias("T")
        ).localCheckpoint(eager=True)
    v0.unpersist()
    return merges, v


# ------------------------------------------------- production trainer
#
# The relational trainer above is the ORACLE-CHECKED mechanism demo: one
# Spark job (pair-count shuffle + 1-row argmax collect) PER merge round.
# Fine at demo K, but a production vocabulary is 32k-100k merges =
# that many sequential Spark jobs.  Standard practice (Sennrich's
# learn_bpe, HF tokenizers) is: the corpus-sized work is ONLY the word
# count; once the word-frequency table is collected (vocab-sized — a
# few million rows for a web corpus, ~100 MB, comfortably driver-side)
# the entire merge loop runs in process with ZERO further Spark jobs.
# ``train_bpe`` below is that path; equality of its merge table to the
# relational trainer's at demo K is pinned in tests/test_bpe.py, and a
# K=256 run is timed in SCALING.md.


def train_bpe_driver(
    wordfreq: list[tuple[str, int]],
    n_merges: int,
    *,
    with_vocab: bool = False,
) -> list[Row] | tuple[list[Row], list[tuple[list[str], int]]]:
    """Driver-side BPE merge loop over a collected (word, freq) table —
    byte-for-byte the relational trainer's semantics: candidate pairs
    are adjacent symbols with l != r weighted by word freq (every
    occurrence counts), argmax ties break on (count DESC, l, r), and a
    merge rewrites every non-overlapping match (overlap is impossible
    for l != r).  Pure Python: no Spark session touched.

    ``with_vocab=True`` additionally returns the final per-word
    segmentations (parallel to ``wordfreq`` order) — the application
    queries read the tokenizer from here instead of re-running the
    K-round relational trainer."""
    vocab: list[tuple[list[str], int]] = [
        (list(w), f) for w, f in wordfreq
    ]
    merges: list[Row] = []
    for k in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab:
            for i in range(len(syms) - 1):
                if syms[i] != syms[i + 1]:
                    p = (syms[i], syms[i + 1])
                    counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        (l, r), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append(
            Row(merge_rank=k, lhs=l, rhs=r, merged=l + r, pair_count=cnt)
        )
        for idx, (syms, freq) in enumerate(vocab):
            if l not in syms:
                continue
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == l
                    and syms[i + 1] == r
                ):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[idx] = (out, freq)
    if with_vocab:
        return merges, vocab
    return merges


def train_bpe(
    documents: DataFrame,
    n_merges: int,
    *,
    sample_pct: int | None = None,
) -> list[Row]:
    """Production BPE training: ONE Spark job (the corpus word-count
    shuffle, optionally over a deterministic ``sample_pct``% hash
    sample of documents — xxhash64 on doc_id, so the sample is stable
    across runs and appends), then the whole merge loop driver-side
    (:func:`train_bpe_driver`).  Returns the merge table rows in the
    text_bpe_merges schema.  The collect is vocab-sized, never
    corpus-sized — the one deliberate driver-side table in the module,
    which is exactly how reference BPE trainers work."""
    docs = documents
    if sample_pct is not None:
        docs = docs.filter(
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(100))
            < F.lit(sample_pct)
        )
    wf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .collect()
    )
    return train_bpe_driver(
        [(r["word"], r["freq"]) for r in wf], n_merges
    )


@query("text_bpe_merges", oracle=_SQL_BPE_MERGES)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned BPE merge table: rank, pair, merged symbol, and the
    weighted pair count at selection time — the artifact a tokenizer
    ships (merges.txt).

    MECHANISM DEMO, not a perf surface (re-scoped out of the headline
    bench in round 8): the K-round relational trainer exists to pin
    the merge semantics against an unrolled-CTE oracle.  Its named
    floor — K sequential count-shuffle rounds, each paying fixed Spark
    job overhead that a 31-row vocabulary frame can never amortize
    against DuckDB's in-process loop (measured 2.12x at the 100x
    fixture, flat in corpus size) — is a property of the demo's round
    structure.  Batching rank-tied merges per round was evaluated and
    rejected: a merge can create a new pair that ties at the same
    count and sorts lexicographically ahead of a batched candidate, so
    batching silently changes the merge table on adversarial vocabs.
    The engine's tokenizer perf path is :func:`train_bpe` (one
    word-count job + driver merge loop, flat at K=256 across 100x
    corpora) and the queries that ride it (text_bpe_token_counts,
    text_bpe_segment, text_bpe_encode_holdout)."""
    merges, _ = _train(Tables(spark, sf_dir))
    from ..exprs import values_frame

    return values_frame(
        spark,
        merges,
        "merge_rank LONG, lhs STRING, rhs STRING, merged STRING, "
        "pair_count LONG",
    )


# (application id, documents stamp) → (vocab frame, row count) of the
# PRODUCTION-trained tokenizer.  Training is deterministic per fixture,
# so the application queries re-deriving it per call only re-paid the
# word-count job + driver merge loop — exactly the cost a real
# pipeline stores as merges.txt and never re-pays (the docstring below
# already said so; round 11 makes the code match).  Same staleness
# recipe as every session cache (catalog.table_stamp).
_VOCAB_CACHE: dict[tuple[str, str], tuple[DataFrame, int]] = {}


def _trained_vocab(
    spark: SparkSession, t: Tables
) -> tuple[DataFrame, int]:
    """((word, freq, T=final segmentation), vocab row count) via the
    PRODUCTION trainer:
    one word-count job, then the whole merge loop driver-side
    (:func:`train_bpe_driver`, byte-identical to the relational
    trainer — pinned in tests/test_bpe.py), shipped back as a
    vocab-sized literal frame.  The application queries read the
    tokenizer from here — a real pipeline applies a stored merges.txt,
    it does not re-train per query (the trained frame is
    session-cached per documents stamp); the K-round relational
    trainer stays exercised (and oracle-unrolled) by text_bpe_merges."""
    from ..catalog import evict_superseded, table_stamp

    key = (
        spark.sparkContext.applicationId,
        table_stamp(t._sf_dir, "documents"),
    )
    hit = _VOCAB_CACHE.get(key)
    if hit is not None:
        return hit
    real = key[1].split("|", 1)[0]
    evict_superseded(
        _VOCAB_CACHE,
        lambda k: k[0] == key[0]
        and k[1].split("|", 1)[0] == real
        and k[1] != key[1],
    )
    wf = (
        t.documents.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .collect()
    )
    wordfreq = [(r["word"], r["freq"]) for r in wf]
    _, vocab = train_bpe_driver(wordfreq, _BPE_K, with_vocab=True)
    from ..exprs import values_frame

    frame = values_frame(
        spark,
        [
            (w, f, syms)
            for (w, f), (syms, _) in zip(wordfreq, vocab)
        ],
        "word STRING, freq LONG, T ARRAY<STRING>",
    )
    _VOCAB_CACHE[key] = (frame, len(wordfreq))
    return frame, len(wordfreq)


# Above this, the trained vocabulary rides a broadcast join (the
# local-relation size-estimate trap makes the hint mandatory — left
# alone the planner hashes the EXPLODED CORPUS side; measured 25 s vs
# 3 s at the 100x fixture).  A web-corpus vocabulary is ~100 MB at a
# few million rows — broadcastable, but only given driver/executor
# headroom (DEPLOY.md "BPE vocabulary broadcast"); past this many rows
# fall back to a shuffle join rather than assume it (ADVICE r8).
_VOCAB_BROADCAST_MAX_ROWS = 4_000_000


def _vocab_join_side(seg: DataFrame, n_vocab: int) -> DataFrame:
    return F.broadcast(seg) if n_vocab <= _VOCAB_BROADCAST_MAX_ROWS else seg


@query("text_bpe_segment", oracle=_SQL_BPE_SEGMENT)
def text_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained tokenizer applied to its own vocabulary: each word's
    subword segmentation after all K merges, with the subword count the
    corpus token budget is computed from.  (Tokenizing NEW text is the
    same transform chain replayed from the stored merge table.)"""
    v, _ = _trained_vocab(spark, Tables(spark, sf_dir))
    out = v.select(
        "word",
        "freq",
        F.size("T").cast("long").alias("n_subwords"),
        F.concat_ws(" ", "T").alias("segmentation"),
    )
    return out


@query(
    "text_bpe_token_counts",
    oracle=(
        "WITH "
        + _bpe_ctes()
        + f""",
        seg AS (
            SELECT word, CAST(len(T) AS BIGINT) AS n_sub FROM v{_BPE_K}
        ),
        tok AS (
            SELECT doc_id, unnest({_SQL_TOKS}) AS word FROM documents
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS ws_tokens,
               CAST(sum(n_sub) AS BIGINT) AS bpe_tokens
        FROM tok JOIN seg USING (word)
        GROUP BY doc_id"""
    ),
)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BPE token budget per document: apply the trained merge
    table to every word (one join of the exploded corpus against the
    trained vocabulary's segmentation — every corpus word is in the
    vocabulary by construction) and sum subword counts.  Replaces the
    regex proxy (text_token_counts bpe_ish_tokens) with the trained
    tokenizer's own counts — the number that decides epochs, packing,
    and cost for an LLM training run.

    Scale shape: training via the production path (one word-count job
    + the driver merge loop — see :func:`_trained_vocab`); application
    is one corpus-sized explode + one broadcast join keyed on word
    against the vocabulary frame + one per-doc aggregate.  The
    broadcast is EXPLICIT: the vocab frame is a createDataFrame local
    relation whose default size estimate is not small, so left alone
    the planner builds the hashed relation from the corpus side
    (measured: 25 s vs 3 s at the 100x fixture) — and the vocabulary
    is broadcastable by construction (vocab-sized, ~100 MB for a web
    corpus), which is exactly how production tokenizer-apply works."""
    t = Tables(spark, sf_dir)
    v, n_vocab = _trained_vocab(spark, t)
    seg = v.select("word", F.size("T").cast("long").alias("n_sub"))
    tok = t.documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("word")
    )
    return tok.join(_vocab_join_side(seg, n_vocab), "word").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("ws_tokens"),
        F.sum("n_sub").alias("bpe_tokens"),
    )


# --------------------------------------------- encode UNSEEN text
#
# The missing third of a tokenizer's lifecycle: train (above) → store
# the merge table → ENCODE text the trainer never saw (the daily crawl
# a 100 TB pipeline actually tokenizes).  Encoding replays the ranked
# merge table over a word's characters; replaying rank order
# sequentially-and-exhaustively is exactly the trainer's own vocabulary
# evolution (merge k's constituents are only ever produced by merges
# < k, so a later merge cannot create an opportunity for an earlier
# one), which is what lets the SAME per-round CTE chain the trainer is
# oracle-checked with double as the encode oracle — and makes OOV
# handling free: an unseen word starts from characters and takes
# whatever merges apply.

_SQL_BPE_ENCODE = (
    "WITH "
    + _bpe_ctes(where="WHERE doc_id % 2 = 0")
    + f""",
    nw AS (
        SELECT DISTINCT w AS word
        FROM (SELECT unnest({_SQL_TOKS}) AS w FROM documents
              WHERE doc_id % 2 = 1)
    ), e0 AS (
        SELECT word,
               list_transform(range(1, length(word)+1), i -> word[i]) AS T
        FROM nw
    )"""
)
for _k in range(1, _BPE_K + 1):
    _SQL_BPE_ENCODE += f""",
    e{_k} AS (
        SELECT word,
               CASE WHEN b{_k}.l IS NULL THEN T
                    ELSE {_sql_merge_apply('T', f'b{_k}')} END AS T
        FROM e{_k - 1} LEFT JOIN b{_k} ON TRUE
    )"""
_SQL_BPE_ENCODE += f""",
    seg AS (SELECT word, CAST(len(T) AS BIGINT) AS n_sub FROM e{_BPE_K}),
    tok AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS word FROM documents
        WHERE doc_id % 2 = 1
    )
    SELECT tok.doc_id,
           CAST(count(*) AS BIGINT) AS ws_tokens,
           CAST(sum(seg.n_sub) AS BIGINT) AS bpe_tokens,
           CAST(sum(CASE WHEN wf.word IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS oov_tokens
    FROM tok
    JOIN seg ON tok.word = seg.word
    LEFT JOIN wf ON tok.word = wf.word
    GROUP BY tok.doc_id
"""


def apply_merges_chain(words: DataFrame, merges: list[Row]) -> DataFrame:
    """Replay a ranked merge table over a (word, T) frame as chained
    JVM transforms — one :func:`_spark_merge_expr` per merge, each with
    the pair bound as literals.  Executor-side and vocabulary-sized;
    right for demo K.  Production K (32k-100k merges) cannot be an
    expression chain — :func:`bpe_encode_word` under a pandas UDF with
    the broadcast merge table is that path (equality pinned in
    tests/test_bpe.py)."""
    v = words
    for m in merges:
        v = v.select(
            "word", F.expr(_spark_merge_expr(m.lhs, m.rhs)).alias("T")
        )
    return v


def bpe_encode_word(word: str, ranked: list[tuple[str, str]]) -> list[str]:
    """Encode ONE word with a ranked merge list — the per-word loop of
    every production BPE encoder (pure Python, byte-identical to
    :func:`apply_merges_chain`'s expression replay)."""
    syms = list(word)
    for l, r in ranked:
        if l not in syms:
            continue
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode_udf(merges: list[Row]):
    """Arrow-batched production encoder: word column → subword array,
    the ranked merge table shipped once in the UDF closure and each
    distinct word encoded once per batch via an LRU cache (real
    corpora are Zipfian — the cache hit rate IS the speedup).  Scale
    shape: encode rides the executors; no driver round-trip, no
    expression chain growing with K."""
    ranked = [(m.lhs, m.rhs) for m in merges]

    @F.pandas_udf("array<string>")
    def enc(words: pd.Series) -> pd.Series:
        from functools import lru_cache

        @lru_cache(maxsize=1 << 16)
        def one(w: str) -> tuple[str, ...]:
            return tuple(bpe_encode_word(w, ranked))

        return words.map(lambda w: list(one(w)))

    return enc


@query("text_bpe_encode_holdout", oracle=_SQL_BPE_ENCODE)
def text_bpe_encode_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize text the trainer NEVER SAW: train on the even-doc_id
    half of the corpus (production driver-loop trainer), then encode
    the odd half's words by replaying the stored merge table —
    including out-of-vocabulary words, which start from characters and
    take whatever merges apply (`oov_tokens` counts them per doc).
    This is the operation a 100 TB pipeline runs daily: the merge
    table is a fixed artifact; the corpus-sized work is one explode +
    a vocabulary join.

    Scale shape: distinct held-out words (executor-side dedup), the
    K-merge replay on that vocabulary frame, one join back to the
    exploded corpus, one per-doc aggregate.  The even/odd split is the
    cross-engine-trivial stand-in for a train/serve date boundary."""
    t = Tables(spark, sf_dir)
    train_docs = t.documents.filter(F.col("doc_id") % 2 == 0)
    held = t.documents.filter(F.col("doc_id") % 2 == 1)
    merges = train_bpe(train_docs, _BPE_K)
    chars = F.expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    )
    nw = (
        held.select(F.explode(tokens(F.col("text"))).alias("word"))
        .distinct()
        .select("word", chars.alias("T"))
    )
    seg = apply_merges_chain(nw, merges).select(
        "word", F.size("T").cast("long").alias("n_sub")
    )
    trained = (
        train_docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .distinct()
        .withColumn("seen", F.lit(1))
    )
    tok = held.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("word")
    )
    return (
        tok.join(seg, "word")
        .join(trained, "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("ws_tokens"),
            F.sum("n_sub").alias("bpe_tokens"),
            F.sum(F.when(F.col("seen").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("oov_tokens"),
        )
    )
