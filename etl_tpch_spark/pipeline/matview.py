"""Incremental materialized-view maintenance for append-only tables.

The reference recomputes its one analytical query from the full table
every day (reduce.py:24-78 re-reads the whole Delta table).  At the
reference's own append rate (~576M lineitem rows/day, BASELINE.md) that
full recompute grows without bound; at 100 TB it is the difference
between touching ~GBs of fresh data and re-scanning the lake.

This module maintains a grouped-aggregate result *incrementally*: the
state is the partial-aggregate table (one row per group), and each
appended batch folds in with

    state' = combine( state ∪ partial(batch) )

Supported measure kinds are the self-decomposable aggregates over an
append-only feed — ``count``, ``sum``, ``min``, ``max`` (avg = sum/count
at read time).  These are exactly the aggregates whose combine step is
the aggregate itself, so refresh cost is O(|state| + |batch|), never
O(history).  Deletes/updates would need retractable state (count can
decrement, min/max cannot) — out of scope, matching the reference's
append-only pipeline.

Exactly-once refresh: each batch may carry a ``batch_id``; applied ids
are recorded in ``_applied_batches.json`` INSIDE the state directory
(underscore-prefixed ⇒ invisible to Spark's reader).  BOTH the initial
create and the incremental path write data + marker into a temp dir
first, then swap it into place, so a batch can never be applied but
unrecorded (or vice versa) — replaying the same batch is a no-op, which
is what makes this safe as a streaming ``foreachBatch`` sink
(epoch id → batch_id).

Crash safety of the swap: the incremental path renames the live dir to
the fixed sibling ``<path>.old`` before renaming the temp dir into
place.  Every entry point first runs :meth:`_recover`, which heals the
two possible crash windows: (a) live dir missing but ``.old`` present →
the crash hit between the two renames; the old state is restored (the
unmarked temp result is discarded and the batch simply replays);
(b) both present → the crash hit after the swap but before cleanup; the
stale ``.old`` is deleted.  Stale ``<path>.mv-*`` temp dirs from either
window are swept on the next refresh.

SCOPE: the swap protocol relies on same-directory ``os.rename``
atomicity and a SINGLE writer — correct on a local/POSIX filesystem
(this engine's driver-node state pattern), NOT on S3/HDFS paths and not
under concurrent ``refresh()`` calls.  For object storage, put the
state behind a transactional table format instead (see
pipeline/ingest.py's pluggable ``fmt``).

Determinism note: sums should be declared over exact decimal exprs
(functions/agg.py) so the state is independent of batch arrival order —
IEEE double sums would make the matview depend on ingestion history.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KINDS = ("count", "sum", "min", "max")

# combine step per kind: how two partial states merge
_COMBINE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}

# self-describing formats only: the state is re-read with no explicit
# schema, so text formats (csv/json) would come back untyped/renamed and
# corrupt the combine step.
_FORMATS = ("parquet", "orc")


@dataclass(frozen=True)
class Measure:
    """One maintained aggregate: ``kind(expr) AS name``.

    ``expr`` is a SQL expression string evaluated against batch rows
    (e.g. ``"CAST(o_totalprice AS DECIMAL(12,2))"``).  For ``count``,
    ``expr`` is ignored (row count).
    """

    name: str
    kind: str
    expr: str = "1"

    def __post_init__(self) -> None:
        if self.kind not in _KINDS:
            raise ValueError(f"kind {self.kind!r} not in {_KINDS}")


class MaterializedView:
    """A grouped-aggregate view maintained under ``path`` (local FS,
    single writer — see module docstring)."""

    def __init__(
        self,
        path: str,
        keys: tuple[str, ...],
        measures: tuple[Measure, ...],
        fmt: str = "parquet",
    ) -> None:
        if not keys or not measures:
            raise ValueError("need at least one key and one measure")
        if fmt not in _FORMATS:
            raise ValueError(
                f"fmt {fmt!r} not in {_FORMATS}: matview state must be "
                "self-describing to survive re-reads"
            )
        names = [m.name for m in measures]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate measure names {names}")
        self.path = path
        self.keys = tuple(keys)
        self.measures = tuple(measures)
        self.fmt = fmt

    # ------------------------------------------------------------ state

    def _old_dir(self) -> str:
        return f"{self.path}.old"

    def _recover(self) -> None:
        """Heal an interrupted swap (see module docstring): restore the
        old state if the live dir vanished mid-swap, or drop the stale
        ``.old`` if the swap completed but cleanup didn't."""
        old = self._old_dir()
        if not os.path.exists(old):
            return
        if os.path.exists(self.path):
            shutil.rmtree(old)  # swap completed; cleanup was interrupted
        else:
            os.rename(old, self.path)  # swap never completed; roll back

    def _marker_file(self) -> str:
        return os.path.join(self.path, "_applied_batches.json")

    def applied_batches(self) -> list[str]:
        self._recover()
        try:
            with open(self._marker_file()) as f:
                return json.load(f)
        except FileNotFoundError:
            return []

    def _partial(self, batch: DataFrame) -> DataFrame:
        """Map-side shape: aggregate one batch down to group partials."""
        aggs = []
        for m in self.measures:
            if m.kind == "count":
                aggs.append(F.count(F.lit(1)).alias(m.name))
            else:
                aggs.append(_COMBINE[m.kind](F.expr(m.expr)).alias(m.name))
        return batch.groupBy(*self.keys).agg(*aggs)

    def refresh(
        self,
        spark: SparkSession,
        batch: DataFrame,
        *,
        batch_id: str | None = None,
    ) -> int:
        """Fold ``batch`` into the state; returns group count.  A
        ``batch_id`` already recorded is skipped (idempotent replay)."""
        applied = self.applied_batches()  # runs _recover() first
        if batch_id is not None and batch_id in applied:
            return self.read(spark).count()
        for stale in glob.glob(glob.escape(self.path) + ".mv-*"):
            shutil.rmtree(stale)  # temp leftovers from a crashed swap

        part = self._partial(batch)
        tmp = f"{self.path}.mv-{uuid.uuid4().hex[:8]}"
        if not os.path.exists(self.path):
            # initial create: data + marker land in tmp, then ONE rename
            # publishes both — a crash can't leave the batch applied but
            # unrecorded (the mirror of the incremental path below).
            part.write.format(self.fmt).save(tmp)
            self._write_marker(tmp, applied, batch_id)
            os.rename(tmp, self.path)
            return spark.read.format(self.fmt).load(self.path).count()

        state = spark.read.format(self.fmt).load(self.path)
        # combine: sum-of-counts / sum-of-sums / min-of-mins / max-of-maxs,
        # then pin each column back to the partial's dtype so the state
        # schema is a fixed point across refreshes (Spark widens decimal
        # sums by 10 digits per aggregation otherwise).
        merged = state.unionByName(part).groupBy(*self.keys).agg(
            *[
                _COMBINE[m.kind](F.col(m.name)).alias(m.name)
                for m in self.measures
            ]
        )
        types = {f.name: f.dataType for f in part.schema.fields}
        merged = merged.select(
            *self.keys,
            *[F.col(m.name).cast(types[m.name]) for m in self.measures],
        )

        old = self._old_dir()
        merged.write.format(self.fmt).save(tmp)
        n = spark.read.format(self.fmt).load(tmp).count()
        self._write_marker(tmp, applied, batch_id)
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old)
        return n

    @staticmethod
    def _write_marker(
        into_dir: str, applied: list[str], batch_id: str | None
    ) -> None:
        ids = applied + ([batch_id] if batch_id is not None else [])
        with open(os.path.join(into_dir, "_applied_batches.json"), "w") as f:
            json.dump(ids, f)

    # ------------------------------------------------------------- read

    def read(self, spark: SparkSession) -> DataFrame:
        """Current view state (keys + raw measure columns)."""
        self._recover()
        return spark.read.format(self.fmt).load(self.path)
