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
(underscore-prefixed ⇒ invisible to Spark's reader) and the id file is
written into the new state dir *before* the atomic swap.  A crash
leaves either the old dir (batch unapplied, unmarked) or the new dir
(applied, marked) — replaying the same batch is a no-op either way,
which is what makes this safe as a streaming ``foreachBatch`` sink
(epoch id → batch_id).

Determinism note: sums should be declared over exact decimal exprs
(functions/agg.py) so the state is independent of batch arrival order —
IEEE double sums would make the matview depend on ingestion history.
"""

from __future__ import annotations

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
    """A grouped-aggregate view maintained under ``path``."""

    def __init__(
        self,
        path: str,
        keys: tuple[str, ...],
        measures: tuple[Measure, ...],
        fmt: str = "parquet",
    ) -> None:
        if not keys or not measures:
            raise ValueError("need at least one key and one measure")
        names = [m.name for m in measures]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate measure names {names}")
        self.path = path
        self.keys = tuple(keys)
        self.measures = tuple(measures)
        self.fmt = fmt

    # ------------------------------------------------------------ state

    def _marker_file(self) -> str:
        return os.path.join(self.path, "_applied_batches.json")

    def applied_batches(self) -> list[str]:
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
        applied = self.applied_batches()
        if batch_id is not None and batch_id in applied:
            return self.read(spark).count()

        part = self._partial(batch)
        if not os.path.exists(self.path):
            part.write.format(self.fmt).save(self.path)
            self._mark(applied, batch_id)
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

        tmp = f"{self.path}.mv-{uuid.uuid4().hex[:8]}"
        old = f"{self.path}.old-{uuid.uuid4().hex[:8]}"
        merged.write.format(self.fmt).save(tmp)
        n = spark.read.format(self.fmt).load(tmp).count()
        self._write_marker(tmp, applied, batch_id)
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old)
        return n

    def _mark(self, applied: list[str], batch_id: str | None) -> None:
        self._write_marker(self.path, applied, batch_id)

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
        return spark.read.format(self.fmt).load(self.path)
