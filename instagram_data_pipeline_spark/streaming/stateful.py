"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.9 T3): the reference's daily-quota counter as per-key
streaming state.

The reference kept one global in-memory counter
(``job_scheduler.py:29-47``); the distributed form keys the state (here:
per user) and lets the state store + checkpoint own durability. This is
the pattern for any custom stateful operator Spark lacks as a built-in.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, event_id long, ts timestamp, event_type string, "
    "admitted boolean"
)
STATE_SCHEMA = "n_seen long"


def quota_gate(events: DataFrame, quota: int) -> DataFrame:
    """Admit at most ``quota`` events per user across the stream's
    lifetime; excess events are emitted with ``admitted=false`` (audit
    trail instead of silent drop — the scheduler decides what to do).

    State is one long per key; within a micro-batch, admission is
    decided in event order (ts, event_id) for determinism."""

    def gate(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (n_seen,) = state.get if state.exists else (0,)
        # A group can span several Arrow chunks within one micro-batch;
        # the (ts, event_id) admission order must hold across ALL of them,
        # so concatenate before the single sort. Chunks are Arrow-batch
        # sized (spark.sql.execution.arrow.maxRecordsPerBatch), so the
        # concat is bounded by the group's share of one micro-batch.
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values(["ts", "event_id"])
            order = range(n_seen, n_seen + len(pdf))
            pdf = pdf.assign(
                user_id=key[0],
                admitted=[i < quota for i in order],
            )
            n_seen += len(pdf)
            yield pdf[["user_id", "event_id", "ts", "event_type", "admitted"]]
        state.update((n_seen,))

    return (
        events.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            gate,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


RL_OUTPUT_SCHEMA = (
    "user_id long, event_id long, ts_s long, tokens_after long, "
    "admitted boolean"
)
RL_STATE_SCHEMA = "tokens long, last_ts long"


def token_bucket_gate(
    requests: DataFrame,
    rate: int = 1,
    capacity: int = 300,
    cost: int = 60,
    key_col: str = "user_id",
    key_type: str = "long",
) -> DataFrame:
    """Streaming form of ``operators.ratelimit.token_bucket_admission``
    (T4): per-key token-bucket state carried across micro-batches by
    the state store. Same integer-exact dynamics — refill
    ``elapsed * rate`` capped at ``capacity``, admit iff
    ``tokens >= cost`` — and same (ts, id) in-batch ordering, so a
    drained stream reproduces the batch replay decision-for-decision
    (tested). Expects columns (user_id, event_id, ts_s) with ts_s in
    integer seconds.

    Late data: ``last_ts`` only moves FORWARD (``max(last_ts, now)``).
    An event arriving in a later micro-batch with ts behind the stored
    watermark refills nothing (elapsed clamps to 0) and cannot rewind
    the clock — without this, the next on-time event would re-count
    the elapsed span and over-refill. Batch-equivalence therefore
    holds exactly when each key's events arrive time-ordered across
    micro-batches; a late straggler is admitted against the CURRENT
    bucket, which is the only causal option for an online gate.

    ``key_col``/``key_type`` generalize the gate to any bucket key —
    the default is the T4 per-user form; ``key_col="domain",
    key_type="string"`` is the online crawl-politeness form of
    queries/web.py's crawl_frontier (tested gate == batch fold for
    both key shapes)."""

    out_schema = (
        f"{key_col} {key_type}, event_id long, ts_s long, "
        "tokens_after long, admitted boolean"
    )

    def gate(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not len(pdf):
            return
        pdf = pdf.sort_values(["ts_s", "event_id"])
        if state.exists:
            tokens, last_ts = state.get
        else:
            tokens, last_ts = capacity, int(pdf["ts_s"].iloc[0])
        out_tokens, out_adm = [], []
        for ts in zip(pdf["ts_s"], pdf["event_id"]):
            now = int(ts[0])
            tokens = min(capacity, tokens + max(now - last_ts, 0) * rate)
            last_ts = max(last_ts, now)
            ok = tokens >= cost
            if ok:
                tokens -= cost
            out_tokens.append(tokens)
            out_adm.append(ok)
        state.update((int(tokens), int(last_ts)))
        yield pdf.assign(**{
            key_col: key[0], "tokens_after": out_tokens,
            "admitted": out_adm,
        })[[key_col, "event_id", "ts_s", "tokens_after", "admitted"]]

    return requests.groupBy(key_col).applyInPandasWithState(
        gate,
        outputStructType=out_schema,
        stateStructType=RL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
