"""Streaming gap-based sessionization.

The ingest-side twin of :func:`coies_spark.ops.relational.sessionize`:
events arrive as a stream (a user's events may span micro-batches,
out of order), and the user's complete session table is emitted on
QUIESCENCE — no new event for ``idle_timeout_ms`` of processing time,
the completeness rule shared by every stateful twin in this package
(``streaming.stateful``, ``streaming.loops``, ``streaming.pairs``).
Emitting on completion keeps the semantics exactly equal to the batch
operator — the parity test's assertion — where an eager per-batch
emission would publish half-sessions that later events extend.

State per user is (epoch-µs, event_id) pairs — ~16 bytes/event, no
payload; timestamps are converted JVM-side before the stateful stage.
Keyed by user_id, so the state store spreads like the batch shuffle.
The timeout fold is the batch contract in a few lines of Python:
sort by (ts, event_id), split where the gap exceeds ``gap_seconds``,
number the runs 1..k — asserted equal to the batch DataFrame operator
in tests/test_stateful_streaming.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

STATE_SCHEMA = "tss array<long>, ids array<long>, base long"
OUTPUT_SCHEMA = (
    "user_id long, session_idx long, n_events long, duration_s double"
)

_EMPTY = pd.DataFrame(
    {
        "user_id": pd.Series(dtype="int64"),
        "session_idx": pd.Series(dtype="int64"),
        "n_events": pd.Series(dtype="int64"),
        "duration_s": pd.Series(dtype="float64"),
    }
)


def stream_sessionize(
    event_stream: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    idle_timeout_ms: int = 1000,
    renumber_retention_ms: int = 60_000,
) -> DataFrame:
    """Event stream → session-table stream: (user_id, session_idx,
    n_events, duration_s) rows per quiesced user, equal to the batch
    ``sessionize`` on the same events.  Late/out-of-order arrivals
    within the quiescence window are absorbed by the sort inside the
    fold, not dropped.  NULL-timestamp events are dropped here (the
    batch operator gives each its own leading session) — a stream
    with NULL event times has bigger problems than sessionization;
    gate with transcript_integrity-style audits upstream.

    A user may quiesce MORE THAN ONCE (idle past ``idle_timeout_ms``,
    then return).  Each emission continues ``session_idx`` from where
    the previous one stopped — the numbering base survives in state
    (one long, ~24 bytes/user) for ``renumber_retention_ms`` after
    quiescence, so the output stream never repeats a
    (user_id, session_idx) key across epochs.  Already-emitted rows
    are never retracted (append mode), so an idle gap shorter than
    ``gap_seconds`` of EVENT time still closes a session at the
    quiescence boundary; batch parity holds per quiescence epoch, and
    exactly when each user quiesces once.  A user returning after
    retention expires restarts at 1 — size retention to the longest
    return you need monotone numbering across; the cost is linear in
    quiesced-user cardinality, which is why it is bounded at all."""
    if gap_seconds < 1:
        raise ValueError("stream_sessionize: gap_seconds must be >= 1")
    # strictly positive: state.setTimeoutDuration(0) raises inside the
    # streaming task (PySpark VALUE_NOT_POSITIVE), which would kill the
    # query at the FIRST quiescence — reject the bad value at plan time
    if renumber_retention_ms < 1:
        raise ValueError(
            "stream_sessionize: renumber_retention_ms must be >= 1"
        )
    gap_us = gap_seconds * 1_000_000
    keyed = event_stream.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(id_col).cast("long").alias("eid"),
    )

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            tss, ids, base = state.get
            if not tss:
                # retention epoch ended with no new events: the
                # numbering base expires — state stays bounded by
                # ACTIVE-ish users, not all users ever seen
                state.remove()
                yield _EMPTY
                return
            pairs = sorted(zip(tss, ids))
            idxs, counts, firsts, lasts = [], [], [], []
            sidx = base
            for i, (ts, _) in enumerate(pairs):
                if i == 0 or ts - pairs[i - 1][0] > gap_us:
                    sidx += 1
                    idxs.append(sidx)
                    counts.append(0)
                    firsts.append(ts)
                    lasts.append(ts)
                counts[-1] += 1
                lasts[-1] = ts
            # keep only the numbering base, for renumber_retention_ms
            state.update(([], [], sidx))
            state.setTimeoutDuration(renumber_retention_ms)
            yield pd.DataFrame(
                {
                    "user_id": pd.Series(
                        [key[0]] * len(idxs), dtype="int64"
                    ),
                    "session_idx": pd.Series(idxs, dtype="int64"),
                    "n_events": pd.Series(counts, dtype="int64"),
                    "duration_s": pd.Series(
                        [
                            (b - a) / 1_000_000.0
                            for a, b in zip(firsts, lasts)
                        ],
                        dtype="float64",
                    ),
                }
            )
            return
        tss: list[int] = []
        ids: list[int] = []
        base = 0
        if state.exists:
            p_ts, p_id, base = state.get
            tss.extend(p_ts)
            ids.extend(p_id)
        for pdf in pdfs:
            for t, i in zip(pdf["us"], pdf["eid"]):
                if pd.isna(t):
                    continue
                tss.append(int(t))
                ids.append(int(i) if not pd.isna(i) else 0)
        state.update((tss, ids, base))
        state.setTimeoutDuration(idle_timeout_ms)
        yield _EMPTY

    return keyed.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
