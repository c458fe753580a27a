"""Property-based check: TxTable.read_where must equal the full-scan
filter for ARBITRARY predicate conjunctions over arbitrarily-batched
data — file pruning is a superset guarantee, and a min/max boundary
mistake (>= vs >) silently drops rows only on edge-valued predicates
a fixed fixture can miss."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_tpch_spark.pipeline.txlog import TxTable

_val = st.integers(min_value=-5, max_value=25)
_op = st.sampled_from(["=", "<", "<=", ">", ">="])
_pred = st.tuples(st.sampled_from(["a", "b"]), _op, _val)

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=0, max_value=20),
    ),
    min_size=1,
    max_size=40,
)
preds = st.lists(_pred, min_size=1, max_size=3)
n_batches = st.integers(min_value=1, max_value=3)


@pytest.mark.slow
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=rows, predicates=preds, nb=n_batches)
def test_read_where_equals_full_filter(spark, tmp_path_factory, data, predicates, nb):
    d = tmp_path_factory.mktemp("prop")
    t = TxTable(str(d / "t"))
    # split into nb batches so files get distinct stat ranges; batch
    # membership is computed driver-side (the data is a python list
    # already) — the earlier filter().take(1) per batch cost two extra
    # Spark jobs per example for the same split
    for i in range(nb):
        chunk = [r for r in data if r[0] % nb == i]
        if chunk:
            t.append(
                spark.createDataFrame(chunk, "a: long, b: long").coalesce(1)
            )
    if t.latest_version() is None:
        return
    got = sorted(
        map(tuple, t.read_where(spark, predicates).collect())
    )
    full = t.read(spark)
    cond = TxTable._pred_column(predicates)
    want = sorted(map(tuple, full.where(cond).collect()))
    assert got == want
