"""CHECK constraints on TxTables (Delta's ALTER TABLE ADD CONSTRAINT):
installation validates existing data, every write path refuses a
violating batch BEFORE staging files, NULL passes (SQL semantics),
and the constraint set is shared across handles via the log dir."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_tpch_spark.pipeline.txlog import TxTable


def _df(spark, rows, schema="k LONG, qty LONG"):
    return spark.createDataFrame(rows, schema)


def test_add_refuses_when_existing_rows_violate(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 5), (2, -3)]))
    with pytest.raises(ValueError, match="existing rows violate"):
        t.add_constraint(spark, "qty_nonneg", "qty >= 0")
    assert t.constraints() == {}


def test_writes_enforce_and_abort_cleanly(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 5)]))
    t.add_constraint(spark, "qty_nonneg", "qty >= 0")
    v = t.latest_version()
    with pytest.raises(ValueError, match="qty_nonneg"):
        t.append(_df(spark, [(2, -1)]))
    with pytest.raises(ValueError, match="qty_nonneg"):
        t.merge(spark, _df(spark, [(1, -9)]), "k")
    with pytest.raises(ValueError, match="qty_nonneg"):
        t.overwrite(_df(spark, [(3, -2)]))
    # nothing committed, table state untouched
    assert t.latest_version() == v
    assert t.read(spark).count() == 1
    # a clean batch still lands
    t.append(_df(spark, [(2, 7)]))
    assert t.read(spark).count() == 2


def test_null_passes_sql_check_semantics(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.add_constraint(spark, "qty_nonneg", "qty >= 0")
    t.append(_df(spark, [(1, None), (2, 0)]))
    assert t.read(spark).count() == 2


def test_constraints_shared_across_handles_and_droppable(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    a = TxTable(path)
    a.append(_df(spark, [(1, 1)]))
    a.add_constraint(spark, "qty_nonneg", "qty >= 0")
    b = TxTable(path)  # fresh handle, e.g. another writer process
    with pytest.raises(ValueError, match="qty_nonneg"):
        b.append(_df(spark, [(2, -1)]))
    with pytest.raises(ValueError, match="already exists"):
        b.add_constraint(spark, "qty_nonneg", "qty >= 10")
    b.drop_constraint("qty_nonneg")
    a.append(_df(spark, [(2, -1)]))  # both handles see the drop
    assert a.read(spark).filter(F.col("qty") < 0).count() == 1
