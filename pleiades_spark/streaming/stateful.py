"""Custom stateful streaming operators (applyInPandasWithState).

Two operators the built-in windowed aggregation can't express:

  running_user_totals   per-user all-time running counters that emit an
                        updated row per user per micro-batch (the
                        reference's Redis keyspace as explicit state)
  streaming_dedup       drop events whose event_id was already seen —
                        at-least-once → exactly-once repair at the edge

State design for scale: state is keyed by the grouping column and lives
in the state store (RocksDB-backed on a real cluster); per-key payload is
a handful of scalars, so state size is O(distinct keys). A production
deployment sets a timeout (``GroupStateTimeout.ProcessingTimeTimeout``
with ``state.setTimeoutDuration``) to expire idle keys; unbounded here
because fixture keys are finite.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

RUNNING_SCHEMA = "user_id long, n_events long, total_value double"
RUNNING_STATE_SCHEMA = "n long, total double"

DEDUP_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
DEDUP_STATE_SCHEMA = "seen array<long>"


def _running_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, sum) via explicit group state."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _running_totals,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=RUNNING_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _dedup(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (seen_list,) = state.get if state.exists else ([],)
    seen = set(seen_list)
    for pdf in pdfs:
        fresh = pdf[~pdf["event_id"].isin(seen)]
        # within-batch duplicates: keep first occurrence
        fresh = fresh.drop_duplicates(subset=["event_id"], keep="first")
        seen.update(int(x) for x in fresh["event_id"])
        if len(fresh):
            yield fresh[["event_id", "ts", "user_id", "event_type", "value"]]
    state.update((sorted(seen),))


class _RunningTotalsProcessor(StatefulProcessor):
    """transformWithState twin of running_user_totals.

    The Spark 4 stateful API: typed state handles (ValueState here; List/
    MapState and timers available) instead of one opaque tuple — state
    schema evolution and TTL come managed by the engine rather than
    hand-rolled inside the function. Same semantics as _running_totals, so
    the same oracle checks both.

    ENV GATE: executing transformWithState requires the ``protobuf``
    package (the Python worker talks to the JVM state server over proto);
    this image ships without it, so the e2e path is exercised by a
    skip-gated pytest (tests/test_stateful.py) and the
    applyInPandasWithState twin carries the in-gate correctness check.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", RUNNING_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """running_user_totals on the transformWithStateInPandas API."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotalsProcessor(),
        outputStructType=RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def streaming_dedup(events: DataFrame) -> DataFrame:
    """Exactly-once repair: drop re-delivered event_ids across batches.

    State = the seen-id set per user partition. At scale the id set per
    key is bounded by pairing this with a watermark column and pruning
    ids older than the lateness horizon (the built-in alternative is
    ``dropDuplicatesWithinWatermark``).
    """
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _dedup,
            outputStructType=DEDUP_SCHEMA,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
