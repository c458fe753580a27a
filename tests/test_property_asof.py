"""Property-based check: asof_join must agree with pandas merge_asof on
arbitrary generated data (hypothesis) — the union+window implementation
has subtle tie/null edges a fixed fixture can miss."""

from __future__ import annotations

import pandas as pd
import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_tpch_spark.operators.joins import asof_join

_ts = st.integers(min_value=0, max_value=50)
_key = st.integers(min_value=0, max_value=3)

left_rows = st.lists(st.tuples(_key, _ts), min_size=1, max_size=25)
right_rows = st.lists(st.tuples(_key, _ts), min_size=1, max_size=25)


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=left_rows, right=right_rows)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    # dedupe right on (key, ts): asof requires unique right keys
    right = sorted({(k, t) for k, t in right})
    rvals = [(k, t, float(k * 100 + t)) for k, t in right]
    ldf = spark.createDataFrame(
        [(k, t) for k, t in left], "key int, lts int"
    )
    rdf = spark.createDataFrame(rvals, "key int, rts int, val double")

    got = (
        asof_join(ldf, rdf, "key", "lts", "rts", ["val"])
        .toPandas()
        .sort_values(["key", "lts", "asof_val"])
        .reset_index(drop=True)
    )

    lp = pd.DataFrame(left, columns=["key", "lts"]).sort_values("lts")
    rp = pd.DataFrame(rvals, columns=["key", "rts", "val"]).sort_values(
        "rts"
    )
    exp = pd.merge_asof(
        lp, rp, left_on="lts", right_on="rts", by="key"
    ).sort_values(["key", "lts", "val"]).reset_index(drop=True)

    assert len(got) == len(exp)
    got_set = sorted(
        (r.key, r.lts, None if pd.isna(r.asof_val) else r.asof_val)
        for r in got.itertuples()
    )
    exp_set = sorted(
        (r.key, r.lts, None if pd.isna(r.val) else r.val)
        for r in exp.itertuples()
    )
    assert got_set == exp_set
