"""functions/gbtree.py: dependency-free XGBoost-JSON tree scoring —
parse round-trip, traversal semantics (thresholds, NaN default
routing), UDF-vs-driver parity, and the SQL twin's exactness."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from etl_tpch_spark.functions.gbtree import (
    GbtreeModel,
    Tree,
    demo_model,
    gbtree_score,
    sql_gbtree_score,
)


def _stump(feat: int, thr: float, left_v: float, right_v: float,
           default_left: bool = True) -> Tree:
    return Tree(
        left=np.asarray([1, -1, -1], dtype="int32"),
        right=np.asarray([2, -1, -1], dtype="int32"),
        feat=np.asarray([feat, 0, 0], dtype="int32"),
        thr=np.asarray([thr, left_v, right_v], dtype="float64"),
        default_left=np.asarray([default_left, False, False], dtype="bool"),
    )


def test_single_stump_paths():
    m = GbtreeModel(
        trees=[_stump(0, 10.0, -1.0, 2.0)],
        num_feature=1,
        base_margin=0.0,
        objective="reg:squarederror",
    )
    out = m.predict(np.array([[5.0], [10.0], [15.0]]))
    # x < 10 goes left; x == 10 is NOT < 10 → right
    assert out.tolist() == [-1.0, 2.0, 2.0]


def test_nan_routes_by_default_left():
    left_default = GbtreeModel(
        trees=[_stump(0, 10.0, -1.0, 2.0, default_left=True)],
        num_feature=1, base_margin=0.0, objective="reg:squarederror",
    )
    right_default = GbtreeModel(
        trees=[_stump(0, 10.0, -1.0, 2.0, default_left=False)],
        num_feature=1, base_margin=0.0, objective="reg:squarederror",
    )
    X = np.array([[float("nan")]])
    assert left_default.predict(X).tolist() == [-1.0]
    assert right_default.predict(X).tolist() == [2.0]


def test_depth_two_tree_and_base_margin():
    t = Tree(
        left=np.asarray([1, 3, -1, -1, -1], dtype="int32"),
        right=np.asarray([2, 4, -1, -1, -1], dtype="int32"),
        feat=np.asarray([0, 1, 0, 0, 0], dtype="int32"),
        thr=np.asarray([10.0, 5.0, 8.0, 1.0, 2.0], dtype="float64"),
        default_left=np.asarray([True] * 5, dtype="bool"),
    )
    m = GbtreeModel(trees=[t], num_feature=2, base_margin=0.5,
                    objective="reg:squarederror")
    X = np.array([[3.0, 2.0], [3.0, 7.0], [12.0, 0.0]])
    # (f0<10, f1<5)→1.0 ; (f0<10, f1>=5)→2.0 ; f0>=10→8.0 ; +0.5 base
    assert m.predict(X).tolist() == [1.5, 2.5, 8.5]


def test_json_round_trip_preserves_scores():
    m = demo_model()
    m2 = GbtreeModel.from_json(m.to_json())
    assert m2.num_feature == m.num_feature
    assert m2.objective == m.objective
    assert m2.base_margin == pytest.approx(m.base_margin, abs=0.0)
    rng = np.random.RandomState(7)
    X = np.column_stack(
        [rng.uniform(800, 2200, 64), rng.uniform(1, 50, 64)]
    )
    np.testing.assert_array_equal(m.predict(X), m2.predict(X))


def test_logistic_base_score_becomes_logit_margin():
    m = demo_model()
    m.base_margin = 0.25
    m2 = GbtreeModel.from_json(m.to_json())
    # to_json stores sigmoid(0.25) as base_score; from_json logits it back
    assert m2.base_margin == pytest.approx(0.25, abs=1e-12)
    assert abs(
        1.0 / (1.0 + math.exp(-0.25))
        - float(m.to_json().split('"base_score": "')[1].split('"')[0])
    ) < 1e-15


def test_udf_matches_driver_numpy(spark, sf_dir):
    from etl_tpch_spark.catalog import load_table

    m = demo_model()
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    got = (
        part.withColumn(
            "score",
            gbtree_score(
                m, F.col("p_retailprice"), F.col("p_size").cast("double")
            ),
        )
        .orderBy("p_partkey")
        .toPandas()
    )
    X = np.column_stack(
        [got["p_retailprice"].to_numpy(), got["p_size"].to_numpy(dtype="float64")]
    )
    np.testing.assert_array_equal(got["score"].to_numpy(), m.predict(X))
    # the ensemble actually discriminates: both classes present
    assert 0 < (got["score"] > 0.5).sum() < len(got)


def test_sql_twin_is_bit_identical(spark, sf_dir):
    """The generated CASE WHEN SQL is valid Spark SQL too — evaluate
    it in Spark against the UDF path; identical doubles, no rounding."""
    from etl_tpch_spark.catalog import load_table

    m = demo_model()
    sql = sql_gbtree_score(m, ["p_retailprice", "CAST(p_size AS DOUBLE)"])
    part = load_table(spark, sf_dir, "part")
    both = part.select(
        gbtree_score(
            m, F.col("p_retailprice"), F.col("p_size").cast("double")
        ).alias("udf"),
        F.expr(sql).alias("sql"),
    )
    assert both.filter(F.col("udf") != F.col("sql")).count() == 0


def test_multi_softprob_softmax_and_round_trip():
    """multi:softprob: trees round-robin across classes via tree_info,
    transform is a per-row softmax — the reference model's objective.
    Round-trips through the JSON schema with class assignments
    intact."""
    m = GbtreeModel(
        trees=[
            _stump(0, 10.0, 1.0, 2.0),   # class 0
            _stump(0, 10.0, 0.5, -0.5),  # class 1
            _stump(0, 10.0, 0.0, 1.0),   # class 2
        ],
        num_feature=1,
        base_margin=0.5,
        objective="multi:softprob",
        num_class=3,
        tree_info=[0, 1, 2],
    )
    X = np.array([[5.0], [15.0]])
    probs = m.predict(X)
    assert probs.shape == (2, 3)
    np.testing.assert_allclose(probs.sum(axis=1), [1.0, 1.0])
    # row 0 margins: (1.5, 1.0, 0.5) → class 0 wins; row 1: (2.5, 0,
    # 1.5) → class 0 wins but class 2 beats class 1
    assert probs[0].argmax() == 0 and probs[1][2] > probs[1][1]
    expect = np.exp([1.5, 1.0, 0.5]) / np.exp([1.5, 1.0, 0.5]).sum()
    np.testing.assert_allclose(probs[0], expect)
    m2 = GbtreeModel.from_json(m.to_json())
    assert m2.num_class == 3 and m2.tree_info == [0, 1, 2]
    # softprob base_score stays a raw margin (no logit round-trip)
    assert m2.base_margin == pytest.approx(0.5, abs=0.0)
    np.testing.assert_array_equal(m2.predict(X), probs)


def test_xgboost_equivalence_if_installed():
    """When the real library is present, our traversal must match
    Booster.predict on the SAME JSON file (skipped in this container:
    xgboost is not installed)."""
    xgb = pytest.importorskip("xgboost")
    import tempfile

    m = demo_model()
    with tempfile.NamedTemporaryFile("w", suffix=".json") as f:
        f.write(m.to_json())
        f.flush()
        booster = xgb.Booster()
        booster.load_model(f.name)
        rng = np.random.RandomState(11)
        X = np.column_stack(
            [rng.uniform(800, 2200, 256), rng.uniform(1, 50, 256)]
        )
        np.testing.assert_allclose(
            m.predict(X), booster.inplace_predict(X), rtol=1e-6
        )
