"""Stateful streaming LWW compactor — applyInPandasWithState.

The batch engine dedups/LWW-reduces each micro-batch against the lake's
stored state (lake/arrow_merge.py). When the consumer is another STREAM
(not a table), the same semantics need per-key state carried across
micro-batches: this operator turns an at-least-once, out-of-order,
duplicate-bearing change feed into a compacted changelog that emits a
key only when its winning (max-lsn) event actually advances.

Reference analog: the cross-batch dedup memo the reference keeps in
driver memory to avoid re-emitting xrefs
(src/etl/molecular_interaction_etl.py:296-302, 614-620) — here the memo
is Spark-managed keyed state (checkpointed, partitioned, recoverable)
instead of a Python list on one box, and the fold inside each group is
vectorized pandas (north rule: no per-row Python).

Scale: state is hash-partitioned by key across executors; each
micro-batch shuffles only its own events. State size is O(live keys +
unexpired tombstones): deletes keep a tombstone (lsn, op='D') so stale
re-deliveries cannot resurrect the key; the ``tombstone_ttl_ms``
processing-time timeout expires idle keys and bounds total state.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# emitted changelog row
OUTPUT_SCHEMA = (
    "doc_id string, event_lsn long, op string, tokens array<int>, "
    "n_tok int, source string"
)
# carried state: the winning event so far
STATE_SCHEMA = "event_lsn long, op string, tokens array<int>, n_tok int, source string"


def _make_fold(tombstone_ttl_ms: int | None):
    def _fold(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        if tombstone_ttl_ms is not None and state.hasTimedOut:
            # TTL expiry of an idle key (normally a tombstone): drop the
            # state row; emit nothing. An event for this key arriving
            # LATER than the TTL is treated as fresh — that is the
            # explicit retention trade-off the TTL dial expresses.
            state.remove()
            return
        best_lsn, best = -1, None
        for pdf in pdfs:
            i = int(pdf["event_lsn"].idxmax())  # vectorized argmax per batch
            lsn = int(pdf["event_lsn"].iloc[i])
            if lsn > best_lsn:
                best_lsn = lsn
                row = pdf.iloc[i]
                best = (
                    lsn,
                    str(row["op"]),
                    # plain-int list: numpy scalars don't survive the state
                    # (un)pickling across the JVM boundary
                    None if row["tokens"] is None else [int(x) for x in row["tokens"]],
                    None if pd.isna(row["n_tok"]) else int(row["n_tok"]),
                    None if row["source"] is None else str(row["source"]),
                )
        if best is None:
            return
        if state.exists:
            (prev_lsn,) = state.get[:1]
            if best_lsn <= prev_lsn:
                # Stale re-delivery: nothing advances, emit nothing — but
                # Spark CLEARS a GroupState timeout on any invocation that
                # does not re-set it, so re-arm the TTL here or a duplicate
                # stale event arriving after a delete would disarm the
                # tombstone's expiry and pin that key's state forever.
                if tombstone_ttl_ms is not None:
                    state.setTimeoutDuration(tombstone_ttl_ms)
                return
        # a delete RETAINS state as a tombstone (lsn + op='D'): clearing
        # it would let a late/re-delivered stale event for the key skip
        # the lsn check and resurrect a deleted row — the exact
        # at-least-once out-of-order regime this operator exists for.
        # State growth is bounded by the TTL timeout (or by the caller
        # compacting the downstream table), not by dropping tombstones
        # the moment they are written.
        state.update(best)
        if tombstone_ttl_ms is not None:
            state.setTimeoutDuration(tombstone_ttl_ms)
        yield pd.DataFrame(
            {
                "doc_id": [doc_id],
                "event_lsn": [best[0]],
                "op": [best[1]],
                "tokens": [best[2]],
                "n_tok": [best[3]],
                "source": [best[4]],
            }
        )

    return _fold


def latest_state_stream(
    events: DataFrame, tombstone_ttl_ms: int | None = None
) -> DataFrame:
    """events: a STREAMING DataFrame with (doc_id, event_lsn, op, tokens,
    n_tok, source). Returns the compacted changelog stream: one row per
    (trigger, key) whose winning event advanced past the stored state;
    deletes emit a tombstone row (op='D') and RETAIN the key's state so
    late stale re-deliveries stay suppressed. ``tombstone_ttl_ms`` bounds
    state: idle keys expire via ProcessingTimeTimeout after that long
    with no new events (None = keep state forever)."""
    timeout = (
        GroupStateTimeout.NoTimeout
        if tombstone_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        events.select("doc_id", "event_lsn", "op", "tokens", "n_tok", "source")
        .groupBy("doc_id")
        .applyInPandasWithState(
            _make_fold(tombstone_ttl_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
