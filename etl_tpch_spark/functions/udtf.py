"""Python UDTF (Spark 4 user-defined *table* function): one input row →
many typed output rows, usable in a LATERAL join from SQL or the
DataFrame API.

This closes the §2.10 UDTF slot with the real API (the engine's
vectorized row-expanding path remains ``mapInPandas`` / ``explode`` —
a row-at-a-time Python UDTF is the *flexibility* surface, not the hot
path; its per-row cost is the same class as a classic Python UDF).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, token string, token_len int")
class TokenizeUDTF:
    """text → one row per whitespace token with its position and
    length.  Deterministic, so even this is DuckDB-oracle-checkable
    (unnest over the split list with an index range)."""

    def eval(self, text: str):  # noqa: D102 — contract fixed by Spark
        pos = 0
        for tok in (text or "").split(" "):
            if tok:
                yield pos, tok, len(tok)
                pos += 1


def register_udtfs(spark) -> None:
    """Idempotent session registration (SQL name: ``tokenize``)."""
    spark.udtf.register("tokenize", TokenizeUDTF)
