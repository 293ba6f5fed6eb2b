"""Custom stateful streaming operator: per-host politeness token bucket.

The batch engine does politeness by rank-filter admission
(frontier/politeness.py, Q3). In continuous mode — the JMS-style
subscription path (…/crawler/social/jms/JMSConsumer.java:41-100) — the same
semantics become a keyed state machine: each host owns a token bucket;
a micro-batch may admit at most the tokens the bucket holds, and the bucket
refills between batches. Implemented with applyInPandasWithState (Arrow
batches per host group, state persisted in the streaming state store, so
tokens survive restarts via the checkpoint — the streaming analog of Q4
resumability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

STATE_SCHEMA = "tokens long"


def host_token_bucket(
    requests: DataFrame, capacity: int, refill: int | None = None
) -> DataFrame:
    """Admit ≤ bucket(host) requests per micro-batch, deterministic
    priority order (depth, discovery_iter, url); bucket starts at
    `capacity`, gains `refill` (default: capacity) after every batch,
    capped at `capacity`. Output schema == input schema."""
    refill_n = capacity if refill is None else refill
    out_schema = requests.schema
    sort_cols = [
        c for c in ("depth", "discovery_iter", "url") if c in requests.columns
    ]

    def fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            (tokens,) = state.get
        else:
            tokens = capacity
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if sort_cols:
            pdf = pdf.sort_values(sort_cols, kind="mergesort")
        take = int(min(len(pdf), max(0, tokens)))
        tokens = min(capacity, tokens - take + refill_n)
        state.update((int(tokens),))
        yield pdf.iloc[:take]

    return requests.groupBy("host").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
