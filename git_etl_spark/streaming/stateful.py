"""Custom stateful streaming operator — SURVEY.md §2.10 X7
(``applyInPandasWithState``).

A per-user running aggregate (event count + value sum) maintained in
explicit state across micro-batches — the escape hatch for stateful
logic the built-in windowed aggregations can't express (per-entity
models, custom session logic, CDC folding). State is one small tuple
per user: bounded keys, RocksDB-backed at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user_state(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit GroupState;
    emits the updated total for every user seen in each micro-batch
    (update output mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
