"""Custom stateful streaming operator via ``applyInPandasWithState``.

The operator class the reference cannot express at all (its "state" is
whatever landed in Delta, SURVEY.md §2.9): an arbitrary per-key state
machine updated once per micro-batch, with timeout-driven eviction.

Implementation notes (the Spark contract):

- input is grouped by key; each micro-batch the function receives an
  iterator of pandas DataFrames for that key plus a ``GroupState``
  handle holding an arbitrary tuple;
- state must be bounded: here it is three scalars per user (count, sum,
  last-seen micros) — O(distinct keys), independent of event volume;
- ``GroupStateTimeout.NoTimeout`` keeps state for the job's life; a
  production sessionizer would use ``EventTimeTimeout`` + watermark to
  evict idle keys (the windowed equivalent lives in
  ``windows.session_window_stats``).

This is Arrow-batched (pandas per group), i.e. the fast Python path —
the per-row Python UDF alternative would be ~10-100× slower.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen", T.TimestampType()),
    ]
)
_STATE_SCHEMA = "n BIGINT, total DOUBLE, last_micros BIGINT"


def _update_user_stats(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, last_micros = (
        state.get if state.exists else (0, 0.0, 0)
    )
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_micros = max(
                last_micros, int(pdf["ts"].max().value // 1_000)
            )
    state.update((n, total, last_micros))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 4)],
            "last_seen": [pd.Timestamp(last_micros * 1_000)],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Running per-user (count, sum(value), last event time), emitted
    every micro-batch the user appears in — a continuously-maintained
    profile table, the streaming analogue of ``groupBy(user_id).agg``.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------
# transformWithStateInPandas — the Spark 4 stateful-processor API
# (successor to applyInPandasWithState): typed state variables
# (ValueState/ListState/MapState) managed by a StatefulProcessor class,
# per-key timers, and state readable across processors.  Keeping both
# forms: applyInPandasWithState is the widely-deployed surface, this is
# where stateful pipelines are heading.
#
# Runtime dependency: the TWS state-server protocol speaks protobuf;
# in environments without `google.protobuf` (like this test container)
# the query fails at initialization — the operator itself imports fine,
# so it is test-gated on protobuf presence, not stubbed.
# ---------------------------------------------------------------------

try:  # Spark ≥ 4.0
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserStatsProcessor(StatefulProcessor):
        """Per-user running (count, total value) via a typed ValueState
        — state is two scalars per key, O(distinct users) total."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "stats", "n BIGINT, total DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 4)],
                }
            )

        def close(self) -> None:
            pass

    def running_user_stats_v2(events: DataFrame) -> DataFrame:
        """transformWithStateInPandas form of running_user_stats
        (count + total only; the timer/TTL surface hangs off the same
        handle when eviction is needed)."""
        return events.groupBy("user_id").transformWithStateInPandas(
            UserStatsProcessor(),
            outputStructType=T.StructType(
                [
                    T.StructField("user_id", T.LongType()),
                    T.StructField("n_events", T.LongType()),
                    T.StructField("total_value", T.DoubleType()),
                ]
            ),
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pragma: no cover — pre-4.0 PySpark
    UserStatsProcessor = None

    def running_user_stats_v2(events: DataFrame) -> DataFrame:
        raise NotImplementedError(
            "transformWithStateInPandas requires PySpark >= 4.0"
        )
