"""Versioned transaction-log table format — Delta Lake's core design
(an ordered commit log of file-manifest deltas, optimistic concurrency
on log-entry creation) implemented directly, since this environment has
no delta-spark jars (DEPLOY.md).  Gives the reference's Delta behaviors
(reference pipeline/preprocess.py:41-76 append/OPTIMIZE/VACUUM,
reduce.py:43-54 snapshot reads) on plain parquet:

- **atomic commits**: a version is ONE file ``_txlog/v{N}.json`` listing
  the data files of that snapshot; readers list the log, pick the
  highest version, and read exactly its files — a crashed writer leaves
  orphan data files (invisible — never referenced) but no torn table.
- **optimistic concurrency**: the commit file is created with
  ``open(..., "x")`` (O_EXCL); two writers racing to version N — one
  wins, the loser re-reads the log and retries against the new state.
  Same protocol as Delta on a filesystem with atomic create.
- **time travel**: ``read(spark, version=K)`` reconstructs snapshot K;
  every version stays readable until ``vacuum``.
- **exactly-once appends**: an optional ``batch_id`` is recorded in the
  commit; an append whose batch_id already appears in the log is a
  no-op (the streaming foreachBatch replay contract, like
  pipeline/matview.py).
- **compaction (OPTIMIZE)**: rewrite current files into fewer, commit
  the swapped manifest; old versions still reference the old files.
- **vacuum**: delete data files referenced ONLY by versions older than
  the retained horizon, then drop those log entries.

SCOPE: like matview.py, correctness relies on POSIX atomic create
within one directory — local/NFS-with-O_EXCL filesystems.  On S3, swap
the commit primitive for a conditional PUT (the same adaptation real
Delta/Iceberg deployments make); everything else is engine-agnostic.
Multi-writer appends are safe (retry loop); concurrent compaction is
last-writer-wins on the manifest, never data loss (compaction only
rewrites, it does not delete — vacuum does, and vacuum is an
administrative single-writer operation by contract).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG_DIR = "_txlog"
_MAX_COMMIT_RETRIES = 20


class TxTable:
    """A parquet table with a versioned commit log under ``path``."""

    def __init__(self, path: str) -> None:
        self.path = path
        self.log_dir = os.path.join(path, _LOG_DIR)
        os.makedirs(self.log_dir, exist_ok=True)

    # ------------------------------------------------------------- log

    def _version_file(self, v: int) -> str:
        return os.path.join(self.log_dir, f"v{v:010d}.json")

    def versions(self) -> list[int]:
        return sorted(
            int(f[1:11])
            for f in os.listdir(self.log_dir)
            if f.startswith("v") and f.endswith(".json")
        )

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _read_entry(self, v: int) -> dict:
        with open(self._version_file(v)) as f:
            return json.load(f)

    def snapshot_files(self, version: int | None = None) -> list[str]:
        v = self.latest_version() if version is None else version
        if v is None:
            return []
        if version is not None and version not in self.versions():
            raise ValueError(f"version {version} not in log")
        return self._read_entry(v)["files"]

    def applied_batch_ids(self) -> set[str]:
        ids = set()
        for v in self.versions():
            b = self._read_entry(v).get("batch_id")
            if b is not None:
                ids.add(b)
        return ids

    def _try_commit(self, entry: dict) -> int | None:
        """One optimistic attempt: claim version latest+1 atomically.
        Returns the committed version, or None on losing the race
        (caller re-reads the log and retries).

        The claim is ``os.link(tmp, version_file)`` — exclusive (EEXIST
        if a rival won) AND atomic on content: the entry is fully
        written to the temp file first, so a crash can never publish a
        torn/partial log entry (a bare ``open('x')`` + ``json.dump``
        could die mid-dump having already claimed the version)."""
        v = (self.latest_version() or 0) + 1
        entry = {**entry, "version": v}
        tmp = os.path.join(self.log_dir, f"_tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump(entry, f)
        try:
            os.link(tmp, self._version_file(v))
            return v
        except FileExistsError:
            return None
        finally:
            os.remove(tmp)

    # ------------------------------------------------------------ write

    def _write_data(self, df: DataFrame) -> list[str]:
        """Write df's rows as new uniquely-named parquet files (a temp
        write + rename into the table dir), returning their names.
        Files are invisible until a commit references them."""
        tmp = os.path.join(self.path, f"_staging-{uuid.uuid4().hex[:8]}")
        df.write.parquet(tmp)
        names = []
        for f in sorted(os.listdir(tmp)):
            if f.endswith(".parquet"):
                new = f"part-{uuid.uuid4().hex}.parquet"
                os.rename(os.path.join(tmp, f), os.path.join(self.path, new))
                names.append(new)
        for leftover in os.listdir(tmp):
            os.remove(os.path.join(tmp, leftover))
        os.rmdir(tmp)
        return names

    def _commit_with_retry(self, build_entry) -> int:
        """Retry loop: ``build_entry(current_files)`` returns the entry
        to commit given the files of the (re-read) current snapshot."""
        for _ in range(_MAX_COMMIT_RETRIES):
            entry = build_entry(self.snapshot_files())
            if entry is None:  # e.g. replayed batch — nothing to do
                return self.latest_version() or 0
            v = self._try_commit(entry)
            if v is not None:
                return v
        raise RuntimeError("commit contention: too many retries")

    def append(
        self, df: DataFrame, *, batch_id: str | None = None
    ) -> int:
        """Append rows atomically; replaying a recorded batch_id is a
        no-op.  Returns the committed (or current, on replay) version."""
        if batch_id is not None and batch_id in self.applied_batch_ids():
            return self.latest_version() or 0
        new_files = self._write_data(df)

        def build(current: list[str]):
            if (
                batch_id is not None
                and batch_id in self.applied_batch_ids()
            ):
                return None
            return {
                "op": "append",
                "files": current + new_files,
                "batch_id": batch_id,
            }

        return self._commit_with_retry(build)

    def overwrite(self, df: DataFrame) -> int:
        """Replace the table contents; prior versions remain readable."""
        new_files = self._write_data(df)
        return self._commit_with_retry(
            lambda current: {"op": "overwrite", "files": new_files}
        )

    def compact(self, spark: SparkSession, target_files: int = 1) -> int:
        """OPTIMIZE: rewrite the current snapshot into ``target_files``
        files and commit the swap (reference preprocess.py:70-73).
        Files appended by rivals BETWEEN the compaction read and the
        commit are carried into the new manifest untouched — compaction
        must never drop a concurrent append (the same reconcile-on-
        conflict rule Delta's OPTIMIZE applies)."""
        base = self.snapshot_files()
        if len(base) <= target_files:
            return self.latest_version() or 0
        compacted_away = set(base)
        df = self.read(spark).coalesce(target_files)
        new_files = self._write_data(df)

        def build(current: list[str]):
            appended_since = [f for f in current if f not in compacted_away]
            return {"op": "compact", "files": new_files + appended_since}

        return self._commit_with_retry(build)

    def vacuum(self, keep_versions: int = 1) -> list[str]:
        """Drop versions older than the newest ``keep_versions`` and
        delete data files no retained version references (reference
        preprocess.py:74-76).  Single-writer administrative op."""
        vs = self.versions()
        retained = vs[-keep_versions:] if keep_versions > 0 else []
        kept_files = set()
        for v in retained:
            kept_files.update(self._read_entry(v)["files"])
        removed = []
        for v in vs:
            if v not in retained:
                os.remove(self._version_file(v))
        for f in os.listdir(self.path):
            if f.endswith(".parquet") and f not in kept_files:
                os.remove(os.path.join(self.path, f))
                removed.append(f)
        # sweep staging dirs orphaned by writers that died pre-commit
        for f in os.listdir(self.path):
            if f.startswith("_staging-"):
                d = os.path.join(self.path, f)
                for inner in os.listdir(d):
                    os.remove(os.path.join(d, inner))
                os.rmdir(d)
        return sorted(removed)

    # ------------------------------------------------------------- read

    def read(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        """Snapshot read of ``version`` (default: latest)."""
        files = self.snapshot_files(version)
        if not files:
            raise ValueError("table has no committed data")
        return spark.read.parquet(
            *[os.path.join(self.path, f) for f in files]
        )
