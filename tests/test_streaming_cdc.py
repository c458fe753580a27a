"""Full CDC applier (streaming/sink.py stream_apply_cdc): a Debezium-
shaped change feed (op I/U/D + version) applied to a TxTable must
converge to the netted per-key state, delete keys for real (not
tombstone them), net within-batch insert+delete sequences to the
LATEST op, and replay to a no-op — including a replay landing between
the epoch's merge and delete commits."""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import types as T

from etl_tpch_spark.pipeline.txlog import TxTable
from etl_tpch_spark.streaming.sink import stream_apply_cdc

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("val", T.StringType()),
        T.StructField("version", T.LongType()),
        T.StructField("op", T.StringType()),
    ]
)


def _write_feed(dirpath: str, name: str, rows: list[dict]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _drain(spark, staging, table, ckpt):
    src = (
        spark.readStream.schema(SCHEMA)
        .option("pathGlobFilter", "*.json")
        .json(staging)
    )
    stream_apply_cdc(
        src, table, ckpt, key="k", order_col="version"
    )


def _state(spark, table):
    return {
        r.k: (r.val, r.version)
        for r in TxTable(table).read(spark).collect()
    }


def test_cdc_feed_converges_with_deletes(spark, tmp_path):
    staging = str(tmp_path / "staging")
    table = str(tmp_path / "kv")
    ckpt = str(tmp_path / "ckpt")

    _write_feed(
        staging,
        "b1.json",
        [
            {"k": 1, "val": "a", "version": 1, "op": "I"},
            {"k": 2, "val": "b", "version": 1, "op": "I"},
            {"k": 3, "val": "c", "version": 1, "op": "I"},
            # within-batch netting: k=4 inserted then deleted → absent
            {"k": 4, "val": "d", "version": 1, "op": "I"},
            {"k": 4, "val": None, "version": 2, "op": "D"},
            # within-batch netting: k=5 deleted then re-inserted → kept
            {"k": 5, "val": None, "version": 1, "op": "D"},
            {"k": 5, "val": "e", "version": 2, "op": "I"},
        ],
    )
    _drain(spark, staging, table, ckpt)
    assert _state(spark, table) == {
        1: ("a", 1),
        2: ("b", 1),
        3: ("c", 1),
        5: ("e", 2),
    }

    # second epoch: update k=1, DELETE k=2, insert k=6
    _write_feed(
        staging,
        "b2.json",
        [
            {"k": 1, "val": "a9", "version": 9, "op": "U"},
            {"k": 2, "val": None, "version": 9, "op": "D"},
            {"k": 6, "val": "f", "version": 1, "op": "I"},
        ],
    )
    _drain(spark, staging, table, ckpt)
    want = {1: ("a9", 9), 3: ("c", 1), 5: ("e", 2), 6: ("f", 1)}
    assert _state(spark, table) == want

    # deleted keys are GONE from the current snapshot (not
    # tombstoned), but time travel still shows the pre-delete state
    t = TxTable(table)
    assert 2 not in _state(spark, table)
    versions = t.versions()
    assert any(
        2 in {r.k for r in t.read(spark, version=v).collect()}
        for v in versions[:-1]
    )


def test_cdc_replay_is_noop(spark, tmp_path):
    """Wiping the stream checkpoint and re-draining the same feed
    files mutates nothing: both halves of every epoch (merge and
    delete) are batch-id keyed."""
    staging = str(tmp_path / "staging")
    table = str(tmp_path / "kv")
    ckpt = str(tmp_path / "ckpt")

    _write_feed(
        staging,
        "b1.json",
        [
            {"k": 1, "val": "a", "version": 1, "op": "I"},
            {"k": 2, "val": "b", "version": 1, "op": "I"},
            {"k": 2, "val": None, "version": 2, "op": "D"},
        ],
    )
    _drain(spark, staging, table, ckpt)
    state = _state(spark, table)
    assert state == {1: ("a", 1)}
    v = TxTable(table).latest_version()

    shutil.rmtree(ckpt)
    _drain(spark, staging, table, ckpt)
    assert _state(spark, table) == state
    assert TxTable(table).latest_version() == v


def test_cdc_partial_epoch_replay_completes_the_delete_half(
    spark, tmp_path
):
    """The crash-between-commits window: if the epoch's MERGE landed
    but the DELETE did not, a replay must skip the merge (batch-id
    no-op) and still apply the delete — simulated by pre-applying the
    merge half under the ids the stream will use."""
    staging = str(tmp_path / "staging")
    table = str(tmp_path / "kv")
    ckpt = str(tmp_path / "ckpt")

    _write_feed(
        staging,
        "b1.json",
        [
            {"k": 1, "val": "a", "version": 1, "op": "I"},
            {"k": 2, "val": "stale", "version": 1, "op": "I"},
            {"k": 3, "val": None, "version": 1, "op": "D"},
        ],
    )
    # pre-land the merge half exactly as epoch 0 will key it
    t = TxTable(table)
    pre = spark.createDataFrame(
        [(1, "a", 1), (2, "stale", 1), (3, "ghost", 0)],
        "k long, val string, version long",
    )
    t.merge(spark, pre, "k", batch_id=f"{os.path.basename(ckpt)}-0-u")

    _drain(spark, staging, table, ckpt)
    # merge half no-oped (k=2 kept its pre-landed row, no duplicate
    # commit), delete half applied (k=3's ghost row removed)
    assert _state(spark, table) == {1: ("a", 1), 2: ("stale", 1)}
