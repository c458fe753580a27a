"""Cross-PROCESS TxTable commit races (VERDICT r7 #6).

The O_EXCL commit protocol (pipeline/txlog.py) was argued correct and
thread-tested (test_txlog.py threaded append storm), but threads share
one Python process; the real deployment shape is two Spark
APPLICATIONS — separate OS processes, separate JVMs — sharing a table.
These tests race the pytest session's Spark against a subprocess
worker (tests/cross_process_worker.py) and FORCE the conflict path
deterministically (the verdict's version-pin hook): the local writer's
first commit claim blocks until the rival has committed exactly the
version it is about to claim, so the O_EXCL create MUST fail once and
the loser-retries path is observed cross-process, not left to
scheduling luck.

Pinned: winner-commits/loser-retries (≥1 observed EEXIST loss), no
lost updates (every batch present exactly once), snapshot isolation
(every version remains readable with its exact row count), and
OPTIMIZE carrying a rival process's append into the compacted
manifest per the op-aware reconcile contract.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import pytest

from etl_tpch_spark.pipeline.txlog import TxTable

_WORKER = os.path.join(os.path.dirname(__file__), "cross_process_worker.py")


def _batch(spark, v: int):
    return spark.createDataFrame(
        [(i, v) for i in range(10)], "id long, v long"
    )


def _start_worker(path: str, n_batches: int, go_file: str, tag: str):
    return subprocess.Popen(
        [sys.executable, _WORKER, path, str(n_batches), go_file, tag],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )


def _forced_loss_hook(monkeypatch, table_path: str, go_file: str):
    """Patch THIS process's _try_commit_at so the first claim releases
    the rival (creates go_file) and then waits until the version it is
    about to claim exists — guaranteeing the rival wins it and the
    local writer exercises the retry-rebuild path.  Returns the
    observed-conflict counter."""
    state = {"forced": False, "conflicts": 0}
    orig = TxTable._try_commit_at
    probe = TxTable(table_path)

    def patched(self, v, entry):
        if not state["forced"] and os.path.realpath(self.path) == (
            os.path.realpath(table_path)
        ):
            state["forced"] = True
            with open(go_file, "w") as f:
                f.write("go")
            deadline = time.time() + 180
            while (probe.latest_version() or 0) < v:
                if time.time() > deadline:
                    pytest.fail("rival never committed — hook deadlock")
                time.sleep(0.05)
        ok = orig(self, v, entry)
        if not ok:
            state["conflicts"] += 1
        return ok

    monkeypatch.setattr(TxTable, "_try_commit_at", patched)
    return state


@pytest.mark.slow
def test_cross_process_append_race_loser_retries(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "t")
    go_file = str(tmp_path / "go")
    t = TxTable(path)
    t.append(_batch(spark, 0), batch_id="seed")  # v1, fixes the schema

    proc = _start_worker(path, 3, go_file, "w1")
    try:
        state = _forced_loss_hook(monkeypatch, path, go_file)
        t.append(_batch(spark, 99), batch_id="main-0")
        out, _ = proc.communicate(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert "WORKER_DONE" in out

    # the forced race really exercised the loser path in THIS process
    assert state["conflicts"] >= 1

    # winner-commits/loser-retries composed losslessly: 5 commits
    # (seed + 3 rival + 1 local), every batch exactly once
    final = TxTable(path)
    assert final.latest_version() == 5
    assert final.applied_batch_ids() == {
        "seed",
        "main-0",
        "w1-0",
        "w1-1",
        "w1-2",
    }
    assert final.read(spark).count() == 50
    # exactly-once across processes: replaying the rival's batch id
    # from THIS process is a no-op
    assert final.append(_batch(spark, 1), batch_id="w1-1") == 5

    # snapshot isolation: every version stays readable with its exact
    # cumulative row count, regardless of which process committed it
    for v in final.versions():
        assert final.read(spark, version=v).count() == 10 * v


@pytest.mark.slow
def test_cross_process_compact_carries_rival_append(
    spark, tmp_path, monkeypatch
):
    """OPTIMIZE vs a rival process's append: the compaction's commit
    loses the version race (forced), and its retry must CARRY the
    rival's appended file into the compacted manifest — rows from both
    processes present exactly once afterwards."""
    path = str(tmp_path / "t")
    go_file = str(tmp_path / "go")
    t = TxTable(path)
    for j in range(3):  # several small files so compaction has work
        t.append(_batch(spark, j), batch_id=f"seed-{j}")

    proc = _start_worker(path, 1, go_file, "w1")
    try:
        state = _forced_loss_hook(monkeypatch, path, go_file)
        v = t.compact(spark, target_files=1)
        out, _ = proc.communicate(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert "WORKER_DONE" in out
    assert state["conflicts"] >= 1

    final = TxTable(path)
    # rival append won v4; the compaction retried and committed v5
    assert v == 5
    seeds = set(final.snapshot_files(3))
    rival_files = set(final.snapshot_files(4)) - seeds
    compacted = set(final.snapshot_files(5))
    # the rival's file(s) carried verbatim into the compacted manifest
    assert rival_files and rival_files <= compacted
    # the seed files were rewritten away into target_files=1
    assert not (compacted & seeds)
    assert len(compacted - rival_files) == 1
    # no lost update, no double count: 3 seed batches + rival batch
    assert final.read(spark).count() == 40
    # the rival's rows (v=1, tag w1) exist once beside seed-1's
    assert final.read(spark).where("v = 1").count() == 20
    assert final.applied_batch_ids() == {
        "seed-0",
        "seed-1",
        "seed-2",
        "w1-0",
    }
