"""Bloom-filter semi-join: a broadcast-sized bitset pre-filters the
probe side BEFORE its shuffle, the explicit form of Spark's AQE
runtime row-level filter (spark.sql.optimizer.runtime.bloomFilter) —
built by hand so the engine controls when it fires.

When it pays: the build side must be too large (or the join too far
downstream) for a broadcast hash join — then the probe-side shuffle
is the bottleneck and the bloom cuts its row count to the match rate
+ false positives.  When the build side broadcasts anyway, the BHJ
already does one exact hash probe per row and a bloom in front of it
is pure overhead — don't use it there (the registered demo query
measures this honestly: it reports the shuffle-row reduction, while
its wall time at toy scale is dominated by the extra build job).

Why it matters at 100 TB: a fact⋈dim semi-join where the dim side is
selective (e.g. "orders of platinum customers") shuffles the ENTIRE
fact table just to discard most of it at the join.  A bloom filter of
the build keys costs a few KB broadcast and drops non-matching fact
rows at the scan — the shuffle carries only candidate rows.  False
positives are killed by the exact semi-join that follows, so the
result is bit-identical to the plain semi-join (the oracle runs the
plain form).

Sizing: m_bits ≈ 10 bits/key gives ~1% false positives at k=4; the
default 8192 bits (128 longs) covers ~800 keys.  The build is one
constant-size aggregation (positions → 64-bit words → bit_or), the
collect is O(m_bits/64) rows — the same driver-side footprint as a
kmeans centroid round.

Everything evaluates JVM-side.  TWO membership forms:

- ``bloom_semi_join`` — the bitset words as a LITERAL array in the
  probe expression (``element_at`` on a literal array sidesteps
  shift-by-column, which the DataFrame API lacks).  Zero joins, but
  whole-stage codegen budgets cap the literal at 65,536 bits ≈ 6.5k
  build keys at 10 bits/key; beyond that the FP rate climbs toward 1
  and the filter degrades to pure overhead.  The oracle-checked demo.
- ``bloom_semi_join_unbounded`` — the bitset as a broadcast (w, bits)
  WORD TABLE probed by k broadcast-hash joins on word index.  No
  literal, no cap: sizing follows 10 bits/key to millions of keys
  (bounded by broadcast capacity, ~12 MB at 10M keys), which is the
  production path exactly where the "build side too big to broadcast"
  motivation bites.  tests/test_sketches.py pins that it keeps a
  ≥90% prune rate at a 100k-key build where the capped form decays
  to ~zero pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..exprs import json_array_sql

# the 64 single-bit masks as signed longs (bit 63 wraps negative)
_BIT_MASKS = [
    (1 << b) if b < 63 else -(1 << 63) for b in range(64)
]

# the masks as SQL text: ONE expression node at analysis, folded to a
# single ArrayType Literal at optimization, zero py4j round-trips when
# embedded in a larger expr string (round 11 — the F.lit(list) form
# cost ~2 round-trips per element at construction, ~130 here)
_MASKS_SQL = json_array_sql(_BIT_MASKS, "long")


def _pos_sql(key_sql: str, i: int, m_bits: int) -> str:
    """SQL text of the i-th seeded-xxhash64 bit position for a key.
    Unlike every oracle-checked hash in this repo (md5-derived), bloom
    positions never cross engines — the ORACLE runs the plain
    semi-join and the bloom is internal pruning — so the hot path uses
    Spark's native non-cryptographic hash: one codegen'd 64-bit mix
    per probe function instead of an md5 string digest (~5× cheaper
    per row on the 100 TB probe side, where this filter runs once per
    fact row)."""
    return f"pmod(xxhash64({key_sql}, {i}), {m_bits})"


def _key_sql(key: Column | str) -> str:
    """The probe key as SQL text.  Membership expressions are built as
    one ``F.expr`` string, so the key must arrive as a column NAME
    (a Column object has no public SQL-text accessor in Spark 4)."""
    if isinstance(key, str):
        return f"`{key}`"
    raise TypeError(
        "bloom membership takes the key column NAME (str); got Column"
    )


def bloom_build(
    keys: DataFrame, key: str, *, m_bits: int = 8192, k: int = 4
) -> list[int]:
    """Aggregate the build side's keys into an m_bits bitset, returned
    as ``m_bits/64`` longs (index ``pos >> 6``, bit ``pos & 63``).
    One shuffle of at most m_bits/64 groups, one tiny collect."""
    n_words = m_bits // 64
    pos_arr = ", ".join(_pos_sql(f"`{key}`", i, m_bits) for i in range(k))
    rows = (
        keys.selectExpr(f"explode(array({pos_arr})) AS pos")
        .selectExpr(
            "shiftright(pos, 6) AS w",
            f"element_at({_MASKS_SQL}, "
            "cast((pos & 63) + 1 AS int)) AS bit",
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    out = [0] * n_words
    for r in rows:
        out[r["w"]] = r["bits"]
    return out


def bloom_might_contain(
    key: Column | str, words: list[int], *, k: int = 4
) -> Column:
    """Membership test as a pure column expression over the literal
    word array — evaluates at the scan, JVM-side, no Python, no UDF.

    Built as ONE ``F.expr`` string: the word array rides ``from_json``
    of a constant (one node at analysis — the round-11 CreateArray
    plan-bloat fix preserved — folded to a single ArrayType Literal at
    optimization), and the whole k-probe conjunction costs 3 py4j
    round-trips instead of ~2 per literal element (~4k at
    m_bits=65536, the dominant construction cost of the bloom demo
    queries)."""
    m_bits = len(words) * 64
    key_s = _key_sql(key)
    arr_sql = json_array_sql(list(words), "long")
    conds = []
    for i in range(k):
        p = _pos_sql(key_s, i, m_bits)
        conds.append(
            f"(element_at({arr_sql}, cast(shiftright({p}, 6) + 1 AS int))"
            f" & element_at({_MASKS_SQL}, cast(({p} & 63) + 1 AS int)))"
            " != 0"
        )
    return F.expr("(" + ") AND (".join(conds) + ")")


def auto_m_bits(n_keys: int) -> int:
    """~10 bits/key (≈1% FP at k=4) rounded up to a power of two,
    floored at 8192 and capped at 65536: the words become a LITERAL
    array in the probe expression, and whole-stage codegen budgets
    bound how large that literal can grow (1024 longs is safely
    inside).  Beyond the cap the FP rate degrades gracefully — the
    filter still prunes, the exact semi-join still guarantees the
    result."""
    want = max(1, 10 * n_keys)
    return max(8192, min(65536, 1 << (want - 1).bit_length()))


def auto_m_bits_unbounded(n_keys: int) -> int:
    """~10 bits/key rounded up to a power of two, floored at 8192,
    UNCAPPED — for the word-table form, whose bitset never enters a
    codegen'd literal (it rides a broadcast relation instead)."""
    want = max(8192, 10 * max(1, n_keys))
    return 1 << (want - 1).bit_length()


def bloom_words(
    keys: DataFrame, key: str, *, m_bits: int, k: int = 4
) -> DataFrame:
    """The bitset as a DataFrame of (w, bits) words — the same
    aggregation as :func:`bloom_build` WITHOUT the driver collect, so
    m_bits is bounded by broadcast capacity (millions of keys), not by
    the whole-stage-codegen literal budget (~6.5k keys)."""
    pos_arr = ", ".join(_pos_sql(f"`{key}`", i, m_bits) for i in range(k))
    return (
        keys.selectExpr(f"explode(array({pos_arr})) AS pos")
        .selectExpr(
            "shiftright(pos, 6) AS w",
            f"element_at({_MASKS_SQL}, "
            "cast((pos & 63) + 1 AS int)) AS bit",
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_prefilter_wordtable(
    probe: DataFrame,
    probe_key: str,
    words: DataFrame,
    *,
    m_bits: int,
    k: int = 4,
) -> DataFrame:
    """Probe-side bloom membership via k broadcast-hash joins on word
    index: each probe row computes its i-th bit position, equi-joins
    the (w, bits) word table (inner join — a key whose word was never
    set is DEFINITELY absent and drops immediately), and keeps the row
    only if its bit is set.  All JVM-side column arithmetic.  Pass a
    localCheckpoint-ed ``words`` (as :func:`bloom_semi_join_unbounded`
    does): the k broadcast exchanges carry per-iteration column names
    (see below), which defeats ReuseExchange — checkpointing makes the
    build-side aggregation compute once either way.

    This is the uncapped scale path: at 10 bits/key a 10M-key build is
    a ~1.5M-row / ~12 MB broadcast — far past where the literal-array
    form's fixed 65,536-bit ceiling has degraded to FP≈1 (pure
    overhead), and still far smaller than broadcasting the exact key
    set."""
    out = probe
    for i in range(k):
        p = _pos_sql(f"`{probe_key}`", i, m_bits)
        # per-iteration column names: joining the same word-table plan
        # k times under one alias trips the ambiguous-self-join check
        wcol, bcol = f"_bloom_w{i}", f"_bloom_b{i}"
        wt = words.select(
            F.col("w").alias(wcol), F.col("bits").alias(bcol)
        )
        out = (
            out.join(
                F.broadcast(wt),
                F.expr(f"shiftright({p}, 6) = `{wcol}`"),
                "inner",
            )
            .where(
                F.expr(
                    f"(`{bcol}` & element_at({_MASKS_SQL}, "
                    f"cast(({p} & 63) + 1 AS int))) != 0"
                )
            )
            .drop(wcol, bcol)
        )
    return out


def bloom_semi_join_unbounded(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    *,
    m_bits: int | None = None,
    k: int = 4,
) -> DataFrame:
    """Semi-join with an UNCAPPED bloom pre-filter (word-table form).
    Result ≡ the plain left-semi join: the bloom only removes rows
    early, and the exact semi-join that follows kills false positives.
    Unlike :func:`bloom_semi_join`, the final exact join is NOT
    broadcast-hinted — at the build sizes that motivate this form the
    key set outgrows broadcast, and the bloom's job is exactly to
    shrink the probe side feeding that shuffled semi-join (AQE may
    still choose to broadcast when the build turns out small)."""
    # EAGER localCheckpoint: the distinct key set feeds THREE actions
    # (the m_bits count, the word-table build, the final exact
    # semi-join) — un-materialized, each re-ran the build-side scan +
    # distinct exchange (round 11, guide §5; 8 bytes/key of storage)
    keys = (
        build.select(build_key).distinct().localCheckpoint(eager=True)
    )
    if m_bits is None:
        m_bits = auto_m_bits_unbounded(keys.count())
    # EAGER localCheckpoint: the word table feeds several broadcast
    # builds of ONE action — lazy lets those broadcast jobs race to
    # materialize the same RDD, each re-running the build-side
    # aggregation (the lazy-checkpoint race measured on the minhash
    # groups frame, dedup/operators.py); eager computes it once
    words = bloom_words(keys, build_key, m_bits=m_bits, k=k).localCheckpoint(
        eager=True
    )
    filtered = bloom_prefilter_wordtable(
        probe, probe_key, words, m_bits=m_bits, k=k
    )
    return filtered.join(
        keys, filtered[probe_key] == keys[build_key], "left_semi"
    )


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    *,
    m_bits: int | None = None,
    k: int = 4,
) -> DataFrame:
    """Semi-join ``probe`` to ``build`` with a bloom pre-filter on the
    probe side.  Result ≡ the plain left-semi join — the bloom only
    removes rows early; the exact semi-join kills false positives.
    ``m_bits=None`` sizes the filter from the build-key count
    (:func:`auto_m_bits`)."""
    # same three-consumer shape as the unbounded form: count, literal
    # bloom build (collect), broadcast exact semi-join — materialize
    # the key set once (round 11, guide §5)
    keys = (
        build.select(build_key).distinct().localCheckpoint(eager=True)
    )
    if m_bits is None:
        m_bits = auto_m_bits(keys.count())
    words = bloom_build(keys, build_key, m_bits=m_bits, k=k)
    filtered = probe.where(
        bloom_might_contain(probe_key, words, k=k)
    )
    return filtered.join(
        F.broadcast(keys),
        filtered[probe_key] == F.col(build_key),
        "left_semi",
    )
