"""Text-analysis primitives for LLM-data pipelines (north star: lang-ID,
quality scoring, token counting, fingerprinting — BASELINE.json).

All primitives are JVM-side column expressions (no Python in the hot
path) and every hash is derived from md5, which is bit-identical across
engines — so even hash-based operators (fingerprints, minhash) are
DuckDB-oracle-checkable.  Cross-engine hash recipe:

    Spark:  conv(substring(md5(x), 1, 8), 16, 10) :: long
    DuckDB: CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)

8 hex chars → 32-bit value: products with small constants stay < 2^53,
exact in BIGINT and in double, so folds agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..exprs import json_array_lit

HASH_MOD = 1_000_000_007  # prime; keeps fold accumulators < 2^53
FOLD_MULT = 131

# Tiny per-language stopword lists for the heuristic n-gram/stopword
# language identifier. Deterministic, tie-broken by fixed order.
STOPWORDS = {
    "en": ["the", "a", "of", "to", "and", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "los", "es"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit"],
    "fr": ["le", "la", "les", "et", "est", "des", "une"],
}
CJK_PATTERN = "[一-鿿]"


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties removed (array<string>)."""
    return F.filter(F.split(text, " "), lambda x: x != "")


def token_hash(tok: Column) -> Column:
    """32-bit md5-derived hash of a token (cross-engine deterministic)."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def sql_token_hash(tok: str) -> str:
    """DuckDB twin of :func:`token_hash`."""
    return f"CAST('0x' || substr(md5({tok}), 1, 8) AS BIGINT)"


def spark_sql_tokens(text: str) -> str:
    """Spark-SQL text twin of :func:`tokens` — same Catalyst operators
    via the parser in one py4j round-trip (round 11, guide §4: the
    node-by-node builder pays ~2 round-trips per expression node)."""
    return f"filter(split({text}, ' '), x -> x != '')"


def spark_sql_token_hash(tok: str) -> str:
    """Spark-SQL text twin of :func:`token_hash`."""
    return f"cast(conv(substring(md5({tok}), 1, 8), 16, 10) AS bigint)"


def token_hash_wide(tok: Column) -> Column:
    """60-bit md5-derived token hash (15 hex chars — wide enough for a
    Manku-style simhash fingerprint, narrow enough to stay clear of the
    BIGINT sign bit on both engines)."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


def sql_token_hash_wide(tok: str) -> str:
    """DuckDB twin of :func:`token_hash_wide`."""
    return f"CAST('0x' || substr(md5({tok}), 1, 15) AS BIGINT)"


def spark_sql_token_hash_wide(tok: str) -> str:
    """Spark-SQL text twin of :func:`token_hash_wide` (round 11)."""
    return f"cast(conv(substring(md5({tok}), 1, 15), 16, 10) AS bigint)"


def stopword_count(toks: Column, words: list[str]) -> Column:
    """How many tokens are in the given stopword list."""
    arr = json_array_lit(list(words), "string")
    return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))


def fingerprint(toks: Column) -> Column:
    """Order-sensitive rolling polynomial hash of the token sequence:
    fold h -> (h * 131 + hash32(token)) mod p.  Identical to the DuckDB
    list_reduce with a prepended 0 accumulator.  Detects exact
    *sequence* duplicates while being robust to whitespace differences
    (tokens, not raw chars)."""
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FOLD_MULT + token_hash(x)) % HASH_MOD,
    )


def sql_fingerprint(toks_expr: str) -> str:
    """DuckDB twin of :func:`fingerprint` over a list expression."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({toks_expr}, t -> {sql_token_hash('t')})), "
        f"(a, b) -> (a * {FOLD_MULT} + b) % {HASH_MOD})"
    )


def quality_score(text: Column) -> Column:
    """The engine's document quality score in [0, 1]: capped length
    factor × vocabulary diversity (type-token ratio), rounded once to
    6 decimals so every downstream use (gates, weighted sampling)
    compares the same exact double.  Same formula as the
    text_quality_score query/oracle (queries/text.py)."""
    toks = tokens(text)
    n_words = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    return F.round(
        F.least(n_words / 50.0, F.lit(1.0)) * (n_uniq * 1.0 / n_words),
        6,
    )
