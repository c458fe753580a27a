"""Table snapshots: time travel for plain-parquet tables.

With Delta, readers get snapshot isolation and ``VERSION AS OF`` from
the transaction log (reference preprocess.py:42-44 relies on exactly
this to make compaction safe, SURVEY.md T6).  The parquet fallback
recovers the capability with explicit snapshots:

- ``take_snapshot`` hardlinks every data file into a *sibling*
  directory ``.<table>.snapshots/<tag>/`` — O(#files) metadata ops,
  zero data copied, so snapshotting a huge table costs what a
  directory listing costs (hardlinks require same-filesystem;
  object-store deployments use the store's versioning or Delta
  instead);
- snapshots live OUTSIDE the table directory on purpose: the engine's
  rewriters (compact / upsert) replace the table dir wholesale via
  atomic rename + delete — anything stored inside would be destroyed.
  The hardlinked files themselves survive the delete (a file's blocks
  live until its last link is gone), which is exactly what makes the
  snapshot immutable history;
- ``read_snapshot`` is a plain parquet scan of the snapshot dir;
  ``list_snapshots`` / ``drop_snapshot`` manage retention.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _snap_root(table_dir: str) -> str:
    table_dir = table_dir.rstrip("/")
    return os.path.join(
        os.path.dirname(table_dir),
        f".{os.path.basename(table_dir)}.snapshots",
    )


def _data_files(table_dir: str) -> list[str]:
    out = []
    for root, dirs, files in os.walk(table_dir):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        out.extend(
            os.path.join(root, f)
            for f in files
            if not f.startswith(("_", "."))
        )
    return sorted(out)


def take_snapshot(table_dir: str, tag: str) -> int:
    """Hardlink the table's current data files under the sibling
    snapshot root (layout preserved).  Returns file count.  Refuses to
    overwrite an existing tag — snapshots are immutable."""
    snap = os.path.join(_snap_root(table_dir), tag)
    if os.path.exists(snap):
        raise ValueError(f"snapshot {tag!r} already exists")
    files = _data_files(table_dir)
    for f in files:
        rel = os.path.relpath(f, table_dir)
        dst = os.path.join(snap, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.link(f, dst)
    return len(files)


def read_snapshot(
    spark: SparkSession, table_dir: str, tag: str, *, fmt: str = "parquet"
) -> DataFrame:
    """The table as of ``tag`` — a plain scan of immutable files."""
    snap = os.path.join(_snap_root(table_dir), tag)
    if not os.path.exists(snap):
        raise ValueError(f"no snapshot {tag!r} for {table_dir}")
    return spark.read.format(fmt).load(snap)


def list_snapshots(table_dir: str) -> list[str]:
    root = _snap_root(table_dir)
    if not os.path.isdir(root):
        return []
    return sorted(os.listdir(root))


def drop_snapshot(table_dir: str, tag: str) -> None:
    """Retention: unlink the snapshot (shared file blocks live until
    the last link is gone — dropping never touches the live table)."""
    shutil.rmtree(os.path.join(_snap_root(table_dir), tag))
