"""Streaming event-transition pairs: the Markov-matrix feed computed
online (the batch twin is queries/temporal.py's event_transitions).

Batch LEAD windows don't exist on streams, so the per-user "previous
event" carries in the state store: each micro-batch sorts its rows per
key, emits (prev -> cur) pairs including the BOUNDARY pair from the
state left by earlier batches, and stores the newest event back. With
per-key time-ordered arrival across batches (the same precondition as
the token-bucket gate, and what a time-split landing guarantees), the
emitted pair multiset equals the batch window's — proven in tests and
by the registered query's shared SQL oracle.

State is O(1) per key (one event), so the operator is stable over an
unbounded stream — no watermark needed for correctness, only for
state expiry of retired keys (plug GroupStateTimeout if keys churn).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TR_OUTPUT_SCHEMA = "user_id long, cur string, nxt string"
TR_STATE_SCHEMA = "ts_us long, event_id long, etype string"


def transition_pairs(events: DataFrame) -> DataFrame:
    """(user_id, event_id, ts_us, event_type) stream -> (user_id, cur,
    nxt) transition pairs, state carrying one event per key."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not len(pdf):
            return
        pdf = pdf.sort_values(["ts_us", "event_id"])
        prev = state.get if state.exists else None
        rows = []
        for ts, eid, et in zip(
            pdf["ts_us"], pdf["event_id"], pdf["event_type"]
        ):
            if prev is not None:
                rows.append((key[0], prev[2], et))
            prev = (int(ts), int(eid), str(et))
        state.update(prev)
        yield pd.DataFrame(rows, columns=["user_id", "cur", "nxt"])

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=TR_OUTPUT_SCHEMA,
        stateStructType=TR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
