"""Custom stateful streaming: incremental conversation assembly.

``assemble_conversations_stateful`` consumes a *turn-level* stream
(turns of one conversation may arrive across micro-batches, out of
order) and emits one row per conversation once it is COMPLETE —
completeness = quiescence: no new turn for ``idle_timeout_ms`` of
processing time.  This is the streaming twin of the batch
``assemble_docs`` stage, built on ``applyInPandasWithState`` (Spark's
arbitrary-stateful-processing API): per-conv state accumulates
(turn_idx, text) pairs; on group timeout the conversation is emitted in
stable turn order, byte-equal to the batch assembly (per-row
invariant).

At 10^12-turn scale the state store is RocksDB-backed and keyed by
conv_id — the same key the batch path buckets on, so state spreads
evenly; emitted conversations feed the same detection kernel.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

STATE_SCHEMA = "turn_idxs array<int>, texts array<string>"
OUTPUT_SCHEMA = "conv_id string, n_turns int, raw_text string"

_EMPTY = pd.DataFrame(
    {"conv_id": pd.Series(dtype="object"),
     "n_turns": pd.Series(dtype="int32"),
     "raw_text": pd.Series(dtype="object")}
)


def assemble_conversations_stateful(
    turn_stream: DataFrame, idle_timeout_ms: int = 1000
) -> DataFrame:
    """Turn stream → completed-conversation stream via per-group state
    with processing-time timeouts."""

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            turn_idxs, texts = state.get
            pairs = sorted(zip(turn_idxs, texts))
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "n_turns": pd.Series([len(pairs)], dtype="int32"),
                    "raw_text": ["\n".join(t for _, t in pairs)],
                }
            )
            return
        turn_idxs: list[int] = []
        texts: list[str] = []
        if state.exists:
            prev_idx, prev_txt = state.get
            turn_idxs.extend(prev_idx)
            texts.extend(prev_txt)
        for pdf in pdfs:
            for i, t in zip(pdf["turn_idx"], pdf["text"]):
                # batch-parity NULL handling: a NULL turn_idx row is
                # dropped (assemble_docs's turn_idx predicate filters
                # it) and a NULL text contributes nothing to the
                # concatenation (concat_ws skips nulls) — without this,
                # NULL turn_idx arrives as NaN (int() raises) and NULL
                # text would stringify to the literal 'None'
                if pd.isna(i) or pd.isna(t):
                    continue
                turn_idxs.append(int(i))
                texts.append(str(t))
        state.update((turn_idxs, texts))
        state.setTimeoutDuration(idle_timeout_ms)
        yield _EMPTY

    return turn_stream.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
