"""Streaming instruct-pair emission.

The ingest-side twin of
:func:`coies_spark.ops.transcripts.training_pairs`: turns arrive as a
stream (a conversation's turns may span micro-batches, out of order),
and the conversation's training pairs are emitted on QUIESCENCE — no
new turn for ``idle_timeout_ms`` of processing time, the same
completeness rule as ``streaming.loops.stream_agent_loops``.  Emitting
on completion keeps the semantics exactly equal to the batch operator
(prompts must see the turns BEFORE the target in final turn order,
which mid-flight emission cannot guarantee under out-of-order
arrival); the parity test asserts stream ≡ batch on the same turns.

Unlike the loop detector (whose state is ~36 bytes/turn of digests),
pair assembly NEEDS the turn text, so state per conversation is the
conversation's (turn_idx, role, text) rows — the same bytes the
bucketed batch layout holds per conv_id, keyed identically, RocksDB-
backed at production scale.  Conversations are bounded (agent runs end);
for an unbounded-session deployment the watermark-window variant —
emit pairs per event-time window, carrying only the last
``context_turns`` turns forward as state — caps state at O(k) per
conversation and is the documented scale escape.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

STATE_SCHEMA = (
    "turn_idxs array<long>, roles array<string>, texts array<string>"
)
OUTPUT_SCHEMA = (
    "conv_id string, turn_idx long, n_context long,"
    " prompt string, response string"
)

_EMPTY = pd.DataFrame(
    {
        "conv_id": pd.Series(dtype="object"),
        "turn_idx": pd.Series(dtype="int64"),
        "n_context": pd.Series(dtype="int64"),
        "prompt": pd.Series(dtype="object"),
        "response": pd.Series(dtype="object"),
    }
)


def emit_pairs(
    turns: list[tuple[int, str | None, str | None]],
    context_turns: int,
    target_role: str,
) -> list[tuple[int, int, str, str]]:
    """(turn_idx, n_context, prompt, response) rows for one finished
    conversation — the batch operator's exact contract in plain
    Python: context = up to ``context_turns`` turns immediately
    before the target in turn order, rendered ``role: text`` with
    NULLs as empty strings; response = the RAW text; targets with
    NULL/empty text or no predecessor emit nothing.  Shared with the
    parity test as the single source of truth."""
    out = []
    # (conv_id, turn_idx) is the table key (stable turn ordering, the
    # north-rule input shape), so ordering by turn_idx alone is total
    ordered = sorted(turns, key=lambda x: x[0])
    for i, (idx, role, text) in enumerate(ordered):
        if role != target_role or not text or i == 0:
            continue
        ctx = ordered[max(0, i - context_turns):i]
        prompt = "\n".join(
            f"{r or ''}: {t or ''}" for _, r, t in ctx
        )
        out.append((idx, len(ctx), prompt, text))
    return out


def stream_training_pairs(
    turn_stream: DataFrame,
    context_turns: int = 4,
    target_role: str = "assistant",
    idle_timeout_ms: int = 1000,
) -> DataFrame:
    """Turn stream → training-pair stream: the conversation's
    instruct pairs, emitted once the conversation quiesces.  Same
    parameters and output schema as the batch
    ``transcripts.training_pairs``."""
    if context_turns < 1:
        raise ValueError(
            "stream_training_pairs: context_turns must be >= 1"
        )
    turns = turn_stream.select("conv_id", "turn_idx", "role", "text")

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            turn_idxs, roles, texts = state.get
            state.remove()
            rows = emit_pairs(
                list(zip(turn_idxs, roles, texts)),
                context_turns,
                target_role,
            )
            if not rows:
                yield _EMPTY
                return
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]] * len(rows),
                    "turn_idx": pd.Series(
                        [r[0] for r in rows], dtype="int64"
                    ),
                    "n_context": pd.Series(
                        [r[1] for r in rows], dtype="int64"
                    ),
                    "prompt": [r[2] for r in rows],
                    "response": [r[3] for r in rows],
                }
            )
            return
        turn_idxs: list[int] = []
        roles: list[str | None] = []
        texts: list[str | None] = []
        if state.exists:
            pi, pr, pt = state.get
            turn_idxs.extend(pi)
            roles.extend(pr)
            texts.extend(pt)
        for pdf in pdfs:
            for i, r, t in zip(pdf["turn_idx"], pdf["role"], pdf["text"]):
                if pd.isna(i):
                    continue
                turn_idxs.append(int(i))
                roles.append(None if pd.isna(r) else str(r))
                texts.append(None if pd.isna(t) else str(t))
        state.update((turn_idxs, roles, texts))
        state.setTimeoutDuration(idle_timeout_ms)
        yield _EMPTY

    return turns.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
