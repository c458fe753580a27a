"""Property-based check: the windowed concat-and-chunk packing
arithmetic (queries/curation.py text_pack_sequences) must agree with a
straightforward sequential pandas simulation on arbitrary token-length
sequences — bin boundaries and span counts have off-by-one edges a
fixed corpus can miss (doc exactly filling a bin, doc larger than the
budget, budget-aligned prefixes)."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

BUDGET = 16

lengths = st.lists(
    st.integers(min_value=1, max_value=40), min_size=1, max_size=30
)


def _pandas_pack(tok_counts: list[int], budget: int):
    """Sequential simulation: concatenate docs, cut every `budget`
    tokens; a doc's first_bin is the bin of its first token, span is
    how many bins it touches."""
    out, cursor = [], 0
    for n in tok_counts:
        first = cursor // budget
        last = (cursor + n - 1) // budget
        out.append((first, last - first + 1))
        cursor += n
    return out


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tok_counts=lengths)
def test_packing_matches_sequential_simulation(spark, tok_counts):
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(tok_counts)],
        "doc_id long, ws_tokens long",
    )
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = (
        df.withColumn("cum", F.sum("ws_tokens").over(w))
        .select(
            "doc_id",
            F.expr(f"(cum - ws_tokens) div {BUDGET}").alias("first_bin"),
            (
                F.expr(f"(cum - 1) div {BUDGET}")
                - F.expr(f"(cum - ws_tokens) div {BUDGET}")
                + 1
            ).alias("n_bins"),
        )
        .orderBy("doc_id")
        .collect()
    )
    want = _pandas_pack(tok_counts, BUDGET)
    assert [(r.first_bin, r.n_bins) for r in got] == want
