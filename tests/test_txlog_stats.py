"""Data skipping + log checkpoints for the transaction-log table
(pipeline/txlog.py): per-file min/max stats recorded at commit time,
``read_where`` pruning files driver-side before Spark opens anything
(Delta's stats-based skipping), and the ``_last_checkpoint`` protocol
bounding the exactly-once batch-id walk to the log suffix."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from etl_tpch_spark.catalog import load_table
from etl_tpch_spark.pipeline.txlog import TxTable


@pytest.fixture()
def orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority", "o_orderdate"
    )


def _three_ranges(t, orders):
    """Append three batches with disjoint o_orderkey ranges, one file
    each (coalesce(1)), so stats give each file a disjoint range."""
    keys = sorted(r[0] for r in orders.select("o_orderkey").collect())
    cut1, cut2 = keys[len(keys) // 3], keys[2 * len(keys) // 3]
    t.append(orders.filter(F.col("o_orderkey") < cut1).coalesce(1))
    t.append(
        orders.filter(
            (F.col("o_orderkey") >= cut1) & (F.col("o_orderkey") < cut2)
        ).coalesce(1)
    )
    t.append(orders.filter(F.col("o_orderkey") >= cut2).coalesce(1))
    return cut1, cut2


def test_stats_recorded_per_file(spark, orders, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.append(orders.coalesce(1))
    entry = t._read_entry(t.latest_version())
    (f,) = entry["files"]
    st = entry["stats"][f]
    assert st["rows"] == orders.count()
    lo, hi = st["cols"]["o_orderkey"]
    mm = orders.agg(
        F.min("o_orderkey"), F.max("o_orderkey")
    ).first()
    assert (lo, hi) == (mm[0], mm[1])
    assert "o_orderpriority" in st["cols"]  # string stats too
    assert "o_orderdate" in st["cols"]  # date stats as ISO strings


def test_read_where_prunes_files(spark, orders, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    cut1, _ = _three_ranges(t, orders)
    assert len(t.snapshot_files()) == 3
    # an equality probe below the first cut can only live in file 1
    probe = orders.agg(F.min("o_orderkey")).first()[0]
    pruned = t.pruned_files([("o_orderkey", "=", probe)])
    assert len(pruned) == 1
    got = t.read_where(spark, [("o_orderkey", "=", probe)])
    assert len(got.inputFiles()) == 1  # Spark truly opened one file
    expect = t.read(spark).where(F.col("o_orderkey") == probe)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expect.collect())
    )


def test_read_where_range_predicates(spark, orders, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    cut1, cut2 = _three_ranges(t, orders)
    # < cut1 prunes to 1 file; >= cut1 keeps 2
    assert len(t.pruned_files([("o_orderkey", "<", cut1)])) == 1
    assert len(t.pruned_files([("o_orderkey", ">=", cut1)])) == 2
    got = t.read_where(spark, [("o_orderkey", ">=", cut1)])
    expect = t.read(spark).where(F.col("o_orderkey") >= cut1)
    assert got.count() == expect.count()
    # conjunction narrows to the middle file only
    mid = t.pruned_files(
        [("o_orderkey", ">=", cut1), ("o_orderkey", "<", cut2)]
    )
    assert len(mid) == 1


def test_read_where_empty_result_keeps_schema(spark, orders, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    _three_ranges(t, orders)
    top = orders.agg(F.max("o_orderkey")).first()[0]
    got = t.read_where(spark, [("o_orderkey", ">", top + 1)])
    assert got.count() == 0
    assert got.columns == t.read(spark).columns


def test_string_stats_prune(spark, orders, tmp_path):
    """Range-clustered layout on a string column → selective string
    equality opens a strict subset of files."""
    t = TxTable(str(tmp_path / "t"))
    t.append(orders)
    t.compact(spark, target_files=3, cluster_by=("o_orderpriority",))
    pruned = t.pruned_files([("o_orderpriority", "=", "1-URGENT")])
    assert 0 < len(pruned) < len(t.snapshot_files())
    got = t.read_where(spark, [("o_orderpriority", "=", "1-URGENT")])
    expect = t.read(spark).where(F.col("o_orderpriority") == "1-URGENT")
    assert got.count() == expect.count() > 0


def test_stats_survive_compact_cluster_by(spark, orders, tmp_path):
    """OPTIMIZE ZORDER-style rewrite re-records stats for the new
    files: disjoint key ranges per file ⇒ point probes open 1 file."""
    t = TxTable(str(tmp_path / "t"))
    _three_ranges(t, orders)
    t.compact(spark, target_files=4, cluster_by=("o_orderkey",))
    assert len(t.snapshot_files()) == 4
    probe = orders.agg(F.min("o_orderkey")).first()[0]
    assert len(t.pruned_files([("o_orderkey", "=", probe)])) == 1


def test_stats_carried_by_append_after_compact(spark, orders, tmp_path):
    """Files retained from the base snapshot keep their stats through
    later commits (carry-forward, not recompute)."""
    t = TxTable(str(tmp_path / "t"))
    _three_ranges(t, orders)
    t.append(orders.limit(5).coalesce(1))
    entry = t._read_entry(t.latest_version())
    assert set(entry["stats"]) == set(entry["files"])  # all files covered


def test_date_predicates_prune(spark, orders, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    dates = sorted(r[0] for r in orders.select("o_orderdate").collect())
    cut = dates[len(dates) // 2]
    t.append(orders.filter(F.col("o_orderdate") < F.lit(cut)).coalesce(1))
    t.append(orders.filter(F.col("o_orderdate") >= F.lit(cut)).coalesce(1))
    early = t.pruned_files([("o_orderdate", "<", cut)])
    assert len(early) == 1
    got = t.read_where(spark, [("o_orderdate", "<", cut)])
    expect = t.read(spark).where(F.col("o_orderdate") < F.lit(cut))
    assert got.count() == expect.count() > 0


# ------------------------------------------------------------ checkpoints


def test_auto_checkpoint_and_replay(spark, orders, tmp_path):
    t = TxTable(str(tmp_path / "t"), checkpoint_interval=5)
    small = orders.limit(3).coalesce(1)
    for i in range(12):
        t.append(small, batch_id=f"b{i}")
    assert os.path.exists(t._ckpt_file(10))
    with open(t._last_ckpt_pointer) as f:
        assert json.load(f)["version"] == 10
    assert t.applied_batch_ids() == {f"b{i}" for i in range(12)}
    # replaying any historical batch id is still a no-op
    v = t.latest_version()
    t.append(small, batch_id="b3")
    assert t.latest_version() == v


def test_applied_ids_read_only_log_suffix(spark, orders, tmp_path):
    """After a checkpoint at v10, applied_batch_ids must not read
    entries ≤ 10 — the O(commits) walk is the thing checkpoints
    remove."""
    t = TxTable(str(tmp_path / "t"), checkpoint_interval=10)
    small = orders.limit(2).coalesce(1)
    for i in range(13):
        t.append(small, batch_id=f"b{i}")
    t._entry_cache.clear()
    seen = []
    orig = t._read_entry

    def spy(v):
        seen.append(v)
        return orig(v)

    t._read_entry = spy
    ids = t.applied_batch_ids()
    assert ids == {f"b{i}" for i in range(13)}
    assert min(seen) > 10


def test_checkpoint_survives_vacuum(spark, orders, tmp_path):
    t = TxTable(str(tmp_path / "t"), checkpoint_interval=4)
    small = orders.limit(2).coalesce(1)
    for i in range(6):
        t.append(small, batch_id=f"b{i}")
    t.vacuum(keep_versions=1)
    # log truncated; checkpoint + vacuum carry-forward still see all ids
    assert {f"b{i}" for i in range(6)} <= t.applied_batch_ids()
    v = t.latest_version()
    t.append(small, batch_id="b0")
    assert t.latest_version() == v


def test_old_checkpoints_garbage_collected(spark, orders, tmp_path):
    t = TxTable(str(tmp_path / "t"), checkpoint_interval=2)
    small = orders.limit(1).coalesce(1)
    for i in range(9):
        t.append(small, batch_id=f"c{i}")
    ckpts = [
        f for f in os.listdir(t.log_dir) if f.startswith("ckpt-v")
    ]
    assert len(ckpts) == 1  # only the newest checkpoint is kept


def test_zorder_compact_prunes_both_dimensions(spark, orders, tmp_path):
    """OPTIMIZE ZORDER BY (custkey, totalprice): after the 2-D
    rewrite, selective predicates on EITHER column prune files —
    the property no 1-D sort gives both of (a custkey-clustered
    layout leaves every file spanning the full totalprice range)."""
    t1 = TxTable(str(tmp_path / "zorder"))
    t1.append(orders)
    t1.compact(
        spark, target_files=16,
        zorder_by=("o_orderkey", "o_totalprice"),
    )
    t2 = TxTable(str(tmp_path / "oned"))
    t2.append(orders)
    t2.compact(spark, target_files=16, cluster_by=("o_orderkey",))

    key_probe = orders.agg(F.min("o_orderkey")).first()[0]
    price_cut = orders.approxQuantile("o_totalprice", [0.1], 0.01)[0]
    n = 16
    z_key = len(t1.pruned_files([("o_orderkey", "=", key_probe)]))
    z_price = len(t1.pruned_files([("o_totalprice", "<", price_cut)]))
    d_key = len(t2.pruned_files([("o_orderkey", "=", key_probe)]))
    d_price = len(t2.pruned_files([("o_totalprice", "<", price_cut)]))
    assert z_key < n and z_price < n  # BOTH dims prune under Z-order
    assert d_key == 1  # 1-D layout: its own column prunes perfectly...
    assert d_price == n  # ...the other dimension not at all
    # results stay correct through the pruned read
    got = t1.read_where(spark, [("o_totalprice", "<", price_cut)])
    want = t1.read(spark).where(F.col("o_totalprice") < price_cut)
    assert got.count() == want.count() > 0


def test_threaded_storm_with_checkpoints(spark, orders, tmp_path):
    """The append storm with aggressive checkpointing (interval=2):
    racing workers checkpoint concurrently — same-version checkpoint
    claims collapse via exclusive create, the pointer is
    last-writer-wins over valid checkpoints, and NO batch id is ever
    lost to a stale checkpoint (ids are only ever added)."""
    from concurrent.futures import ThreadPoolExecutor

    t = TxTable(str(tmp_path / "t"), checkpoint_interval=2)
    batch = orders.limit(5).coalesce(1)

    def worker(k: int) -> None:
        handle = TxTable(t.path, checkpoint_interval=2)
        for j in range(3):
            handle.append(batch, batch_id=f"w{k}-{j}")

    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(worker, range(4)))

    assert t.latest_version() == 12
    want = {f"w{k}-{j}" for k in range(4) for j in range(3)}
    assert t.applied_batch_ids() == want
    # replay from a fresh handle (cold caches, checkpoint-backed)
    fresh = TxTable(t.path, checkpoint_interval=2)
    fresh.append(batch, batch_id="w0-0")
    assert fresh.latest_version() == 12


def test_date_predicate_on_timestamp_column_never_drops_rows(
    spark, sf_dir, tmp_path
):
    """Regression: a date-valued predicate against a TIMESTAMP
    column's stats — unpadded '1995-06-17' sorts BELOW
    '1995-06-17T00:00:00' lexicographically, which once pruned the
    very file whose midnight rows Spark's real filter matches.
    _enc pads dates to midnight so both sides compare in the same
    shape."""
    import datetime as dt

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    t = TxTable(str(tmp_path / "t"))
    t.append(ev)
    t.compact(spark, target_files=4, cluster_by=("ts",))
    some_day = ev.selectExpr("date_trunc('day', ts) d").first()[0]
    probe = dt.date(some_day.year, some_day.month, some_day.day)
    for op in ("<=", "<", ">=", ">", "="):
        got = t.read_where(spark, [("ts", op, probe)]).count()
        want = t.read(spark).where(
            TxTable._pred_column([("ts", op, probe)])
        ).count()
        assert got == want, (op, got, want)


def test_conditional_overwrite_aborts_on_rival(spark, orders, tmp_path):
    """overwrite(expect_version=N): a rival commit landing first must
    abort the replacement (None) — the compare-and-swap a derived
    rewrite (e.g. HllIndex.fold) needs to avoid erasing a rival tick
    whose batch_id is already recorded."""
    t = TxTable(str(tmp_path / "t"))
    t.append(orders.limit(5).coalesce(1))
    start = t.latest_version()
    rival = TxTable(t.path)
    rival.append(orders.limit(3).coalesce(1), batch_id="tick-9")
    out = t.overwrite(orders.limit(1), expect_version=start)
    assert out is None
    assert t.read(spark).count() == 8  # rival's rows intact
    assert "tick-9" in t.applied_batch_ids()
    # unconditional overwrite still works
    assert t.overwrite(orders.limit(1)) == 3
