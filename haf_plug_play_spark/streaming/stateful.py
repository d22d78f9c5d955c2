"""Custom stateful streaming operator via applyInPandasWithState — the
Structured Streaming form of the reference's ordered stateful apply (T5,
database/sql/sync.sql:82-105): per-entity state read-modify-write, here
keyed per user with explicit GroupState instead of a PG row loop.

Tracks, per user: total events seen, total value, last event id/time. The
same reduction is expressible in batch as a group-by (used as the test
oracle), which is exactly the property the reformulation must preserve.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, last_event_id long"
)
STATE_SCHEMA = "n long, total double, last_id long"


def running_user_state(events: DataFrame) -> DataFrame:
    """Per-user running aggregates as a stateful stream (update mode).

    The state handler is a CLOSURE, deliberately: cloudpickle serializes a
    nested function by value, so executors never need this package on
    their own sys.path. A module-level handler pickles by (module, name)
    reference and dies with ModuleNotFoundError the moment the driver
    process runs from outside the repo — exactly how the correctness
    driver invokes the engine (caught by the vanilla-session verify
    sweep; the same rule the mapInPandas operators already follow)."""

    def _update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total, last_id = state.get if state.exists else (0, 0.0, -1)
        for pdf in pdfs:
            if not len(pdf):
                # Arrow chunking may hand the iterator an empty frame;
                # .max() of nothing is NaN and int(NaN) would kill the
                # stream for this key
                continue
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = int(pdf["event_id"].max())
            last_id = max(last_id, batch_max)
        state.update((n, total, last_id))
        yield pd.DataFrame(
            [(user_id, n, round(total, 6), last_id)],
            columns=["user_id", "n_events", "total_value", "last_event_id"],
        )

    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
