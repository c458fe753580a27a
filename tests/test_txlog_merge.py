"""TxTable MERGE (pipeline/txlog.py): keyed copy-on-write upsert with
snapshot-pinned serializability, exactly-once CDC replay, and time
travel to the pre-merge table."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_tpch_spark.catalog import load_table
from etl_tpch_spark.pipeline.txlog import TxTable


@pytest.fixture()
def orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )


def test_merge_replaces_and_inserts(spark, orders, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    base = orders.limit(20)
    t.append(base)
    keys = [r[0] for r in base.select("o_orderkey").collect()]
    updates = (
        base.limit(5)
        .withColumn("o_totalprice", F.lit(0.0))  # corrections
        .unionByName(
            base.limit(3).withColumn(
                "o_orderkey",
                F.col("o_orderkey") + F.lit(max(keys) + 1000),
            )
        )  # inserts
    )
    v = t.merge(spark, updates, "o_orderkey")
    assert v == 2
    now = t.read(spark)
    assert now.count() == 23  # 20 - 5 replaced + 5 + 3 inserted
    assert now.filter(F.col("o_totalprice") == 0.0).count() == 5
    # time travel: the pre-merge table is intact
    assert t.read(spark, version=1).count() == 20
    assert (
        t.read(spark, version=1)
        .filter(F.col("o_totalprice") == 0.0)
        .count()
        == 0
    )


def test_merge_replay_is_noop(spark, orders, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(orders.limit(10))
    updates = orders.limit(4).withColumn("o_totalprice", F.lit(1.0))
    v = t.merge(spark, updates, "o_orderkey", batch_id="cdc-7")
    v2 = t.merge(spark, updates, "o_orderkey", batch_id="cdc-7")
    assert v == v2 == t.latest_version() == 2
    assert t.read(spark).count() == 10


def test_merge_aborts_on_rival_commit(spark, orders, tmp_path):
    """A rival append landing between the merge's snapshot read and
    its commit would be erased by the copy-on-write overwrite — the
    merge must abort (None) and leave the rival's rows intact."""
    t = TxTable(str(tmp_path / "t"))
    t.append(orders.limit(10))
    rival = TxTable(t.path)
    orig = t._try_commit_at
    raced = {"done": False}

    def racing(v, entry):
        if not raced["done"]:
            raced["done"] = True
            rival.append(orders.limit(3))  # lands mid-merge
            return False
        return orig(v, entry)

    t._try_commit_at = racing
    out = t.merge(
        spark,
        orders.limit(2).withColumn("o_totalprice", F.lit(0.0)),
        "o_orderkey",
    )
    assert out is None  # aborted, not silently overwritten
    assert t.read(spark).count() == 13  # rival's rows survive
    assert (
        t.read(spark).filter(F.col("o_totalprice") == 0.0).count() == 0
    )
    # the caller's documented recovery: re-run against the new state
    assert t.merge(
        spark,
        orders.limit(2).withColumn("o_totalprice", F.lit(0.0)),
        "o_orderkey",
    ) is not None


def test_merge_into_empty_table_is_append(spark, orders, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    v = t.merge(spark, orders.limit(5), "o_orderkey")
    assert v == 1
    assert t.read(spark).count() == 5
