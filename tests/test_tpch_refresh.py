"""TPC-H refresh streams on the transaction log: RF1 (insert a batch
of new orders + their lineitems) and RF2 (delete a batch by orderkey)
— the spec's §2.27/§2.28 maintenance functions, run as txlog ops with
exactly-once batch ids.  Also the DELETE op's own contracts:
file-scoped copy-on-write (stats-overlapping files only), snapshot
CAS, replay no-op, time travel."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_tpch_spark.catalog import load_table
from etl_tpch_spark.pipeline.txlog import TxTable


def _q1ish(df):
    """The pricing-summary invariant used to observe refresh effects:
    integer-exact per-flag totals (no float accumulation → equality
    comparisons are sound)."""
    return {
        (r.l_returnflag, r.l_linestatus): (r.n, r.qty)
        for r in df.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
        .collect()
    }


def _split(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_orderkey") % 10 != 0)
    rf = li.filter(F.col("l_orderkey") % 10 == 0)
    return li, base, rf


def test_rf1_insert_rf2_delete_roundtrip(spark, sf_dir, tmp_path):
    """RF1 inserts a refresh batch, RF2 deletes the same orderkeys:
    the table returns EXACTLY to its pre-refresh state (the TPC-H
    refresh pair is an inverse), with every intermediate state
    time-travelable."""
    li, base, rf = _split(spark, sf_dir)
    t = TxTable(str(tmp_path / "lineitem"))
    t.append(base, batch_id="load")
    v_base = t.latest_version()
    before = _q1ish(t.read(spark))

    # RF1: the insert refresh stream
    t.append(rf, batch_id="rf1-1")
    v_rf1 = t.latest_version()
    assert _q1ish(t.read(spark)) == _q1ish(li)

    # RF2: the delete refresh stream (same orderkey batch)
    keys = rf.select("l_orderkey").distinct()
    v_rf2 = t.delete(spark, keys, "l_orderkey", batch_id="rf2-1")
    assert v_rf2 is not None
    assert _q1ish(t.read(spark)) == before

    # time travel: every refresh state remains readable
    assert _q1ish(t.read(spark, version=v_base)) == before
    assert _q1ish(t.read(spark, version=v_rf1)) == _q1ish(li)


def test_refresh_replay_is_noop(spark, sf_dir, tmp_path):
    """A re-delivered refresh stream (RF1 or RF2) mutates nothing —
    the spec's maintenance functions become idempotent under the
    txlog's exactly-once batch ids."""
    _, base, rf = _split(spark, sf_dir)
    t = TxTable(str(tmp_path / "lineitem"))
    t.append(base, batch_id="load")
    t.append(rf, batch_id="rf1-1")
    keys = rf.select("l_orderkey").distinct()
    t.delete(spark, keys, "l_orderkey", batch_id="rf2-1")
    state = _q1ish(t.read(spark))
    v = t.latest_version()

    assert t.append(rf, batch_id="rf1-1") == v  # replayed RF1
    assert t.delete(spark, keys, "l_orderkey", batch_id="rf2-1") == v
    assert t.latest_version() == v
    assert _q1ish(t.read(spark)) == state


def test_delete_is_file_scoped_on_clustered_table(
    spark, sf_dir, tmp_path
):
    """The data-skipping contract: on a range-clustered table, deleting
    a narrow key band rewrites ONLY the files whose stats overlap it —
    the rest of the table's files are carried into the new version
    byte-identical (same file names)."""
    li = load_table(spark, sf_dir, "lineitem")
    t = TxTable(str(tmp_path / "li"))
    t.append(li)
    t.compact(spark, target_files=8, cluster_by=("l_orderkey",))
    files_before = set(t.snapshot_files())
    assert len(files_before) == 8

    lo_keys = (
        li.select("l_orderkey")
        .distinct()
        .orderBy("l_orderkey")
        .limit(5)
    )
    assert t.delete(spark, lo_keys, "l_orderkey") is not None
    files_after = set(t.snapshot_files())
    carried = files_before & files_after
    # a 5-key band at the low end of an 8-file range layout must
    # leave most files untouched
    assert len(carried) >= 4, (len(files_before), len(carried))
    assert files_after != files_before  # something WAS rewritten
    # correctness of the scoped rewrite
    deleted = {r.l_orderkey for r in lo_keys.collect()}
    assert (
        t.read(spark)
        .filter(F.col("l_orderkey").isin(list(deleted)))
        .count()
        == 0
    )
    expect = li.filter(~F.col("l_orderkey").isin(list(deleted))).count()
    assert t.read(spark).count() == expect


def test_delete_no_overlap_skips_commit(spark, sf_dir, tmp_path):
    """Keys provably outside every file's stats range: no rewrite, no
    new version — the log-only decision the manifest stats buy."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = TxTable(str(tmp_path / "t"))
    t.append(orders)
    v = t.latest_version()
    ghost = orders.select(
        (F.col("o_orderkey") + 10_000_000_000).alias("o_orderkey")
    )
    assert t.delete(spark, ghost, "o_orderkey") == v
    assert t.latest_version() == v


def test_delete_aborts_on_rival_commit(spark, sf_dir, tmp_path):
    """Snapshot CAS: a rival append landing mid-delete would be erased
    by the copy-on-write overwrite — the delete must abort and leave
    the rival's rows intact."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = TxTable(str(tmp_path / "t"))
    t.append(orders.limit(10))
    rival = TxTable(t.path)
    orig = t._try_commit_at
    raced = {"done": False}

    def racing(v, entry):
        if not raced["done"]:
            raced["done"] = True
            rival.append(orders.limit(3))
            return False
        return orig(v, entry)

    t._try_commit_at = racing
    keys = orders.limit(2).select("o_orderkey")
    out = t.delete(spark, keys, "o_orderkey")
    assert out is None
    assert t.read(spark).count() == 13  # rival's rows survive
    # documented recovery: re-run against the new state (delete is
    # by KEY — the rival's 3 rows may share keys with the base 10,
    # so expectation comes from the data, not arithmetic)
    key_vals = [r.o_orderkey for r in keys.collect()]
    n_match = (
        t.read(spark)
        .filter(F.col("o_orderkey").isin(key_vals))
        .count()
    )
    assert n_match >= 2
    assert t.delete(spark, keys, "o_orderkey") is not None
    remaining = t.read(spark)
    assert (
        remaining.filter(F.col("o_orderkey").isin(key_vals)).count()
        == 0
    )
    assert remaining.count() == 13 - n_match


def test_delete_all_leaves_readable_empty_table(
    spark, sf_dir, tmp_path
):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = TxTable(str(tmp_path / "t"))
    t.append(orders)
    v = t.delete(spark, orders.select("o_orderkey"), "o_orderkey")
    assert v is not None
    assert t.read(spark).count() == 0
    assert t.read(spark).columns == ["o_orderkey", "o_totalprice"]


def test_stats_survive_delete_for_carried_files(
    spark, sf_dir, tmp_path
):
    """Manifest stats carry through a DELETE's new version: a
    selective read AFTER deleting a low band still prunes to one
    file via the untouched files' recorded ranges."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t = TxTable(str(tmp_path / "t"))
    t.append(orders)
    t.compact(spark, target_files=8, cluster_by=("o_orderkey",))
    lo = orders.select("o_orderkey").orderBy("o_orderkey").limit(3)
    assert t.delete(spark, lo, "o_orderkey") is not None
    hi = orders.agg(F.max("o_orderkey")).collect()[0][0]
    assert len(t.pruned_files([("o_orderkey", "=", hi)])) == 1
    assert (
        t.read_where(spark, [("o_orderkey", "=", hi)]).count() == 1
    )
