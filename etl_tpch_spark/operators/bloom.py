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

Everything evaluates JVM-side: the membership test is a pure column
expression over two literal arrays (the bitset words and the 64
single-bit masks — ``element_at`` on a literal array sidesteps
shift-by-column, which the DataFrame API lacks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the 64 single-bit masks as signed longs (bit 63 wraps negative)
_BIT_MASKS = [
    (1 << b) if b < 63 else -(1 << 63) for b in range(64)
]


def _positions(key: Column, k: int, m_bits: int) -> list[Column]:
    """k seeded-xxhash64 bit positions for a key.  Unlike every
    oracle-checked hash in this repo (md5-derived), bloom positions
    never cross engines — the ORACLE runs the plain semi-join and the
    bloom is internal pruning — so the hot path uses Spark's native
    non-cryptographic hash: one codegen'd 64-bit mix per probe
    function instead of an md5 string digest (~5× cheaper per row on
    the 100 TB probe side, where this filter runs once per fact
    row)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        for i in range(k)
    ]


def bloom_build(
    keys: DataFrame, key: str, *, m_bits: int = 8192, k: int = 4
) -> list[int]:
    """Aggregate the build side's keys into an m_bits bitset, returned
    as ``m_bits/64`` longs (index ``pos >> 6``, bit ``pos & 63``).
    One shuffle of at most m_bits/64 groups, one tiny collect."""
    n_words = m_bits // 64
    masks = F.array(*[F.lit(m).cast("long") for m in _BIT_MASKS])
    rows = (
        keys.select(
            F.explode(
                F.array(*_positions(F.col(key), k, m_bits))
            ).alias("pos")
        )
        .select(
            F.shiftright("pos", 6).alias("w"),
            F.element_at(
                masks, (F.col("pos").bitwiseAND(63) + 1).cast("int")
            ).alias("bit"),
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
    key: Column, words: list[int], *, k: int = 4
) -> Column:
    """Membership test as a pure column expression over the literal
    word array — evaluates at the scan, JVM-side, no Python, no UDF."""
    m_bits = len(words) * 64
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    masks = F.array(*[F.lit(m).cast("long") for m in _BIT_MASKS])
    cond = F.lit(True)
    for p in _positions(key, k, m_bits):
        word = F.element_at(arr, (F.shiftright(p, 6) + 1).cast("int"))
        mask = F.element_at(
            masks, (p.bitwiseAND(63) + 1).cast("int")
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


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
    keys = build.select(build_key).distinct()
    if m_bits is None:
        m_bits = auto_m_bits(keys.count())
    words = bloom_build(keys, build_key, m_bits=m_bits, k=k)
    filtered = probe.where(
        bloom_might_contain(F.col(probe_key), words, k=k)
    )
    return filtered.join(
        F.broadcast(keys),
        filtered[probe_key] == F.col(build_key),
        "left_semi",
    )
