"""Streaming stuck-agent loop detection.

The ingest-side twin of :func:`coies_spark.ops.transcripts.agent_loops`:
turns arrive as a stream (a conversation's turns may span micro-batches,
out of order), and a loop alert is emitted per conversation on
QUIESCENCE — no new turn for ``idle_timeout_ms`` of processing time,
the same completeness rule as
``streaming.stateful.assemble_conversations_stateful``.  Detection on
completion (rather than mid-flight) keeps the semantics exactly equal
to the batch operator, which is what the parity test asserts.

State per conversation is (turn_idx, digest) pairs — the digest is the
batch operator's md5(role <US> text), computed JVM-side BEFORE the
stateful stage so Python never touches turn text and state stays ~36
bytes/turn regardless of turn length.  Keyed by conv_id, the state
store spreads exactly like the bucketed batch layout; RocksDB-backed
at production scale.

The timeout fold re-implements the batch contract in ~15 lines of
numpy-free Python (per-period lag runs, best chain, smallest-period
tiebreak) — asserted equal to the batch DataFrame operator on the same
turns in tests/test_stateful_streaming.py.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

STATE_SCHEMA = "turn_idxs array<int>, digests array<string>"
OUTPUT_SCHEMA = (
    "conv_id string, period long, chain long, loop_turns long"
)

_EMPTY = pd.DataFrame(
    {
        "conv_id": pd.Series(dtype="object"),
        "period": pd.Series(dtype="int64"),
        "chain": pd.Series(dtype="int64"),
        "loop_turns": pd.Series(dtype="int64"),
    }
)


def _best_loop(
    digests: list[str], min_chain: int, max_period: int
) -> tuple[int, int] | None:
    """(period, chain) of the longest rep-chain ≥ min_chain, ties to
    the smallest period — the batch operator's exact pick."""
    cands = []
    for p in range(1, max_period + 1):
        chain = cur = 0
        for i in range(len(digests)):
            if i >= p and digests[i] == digests[i - p]:
                cur += 1
                chain = max(chain, cur)
            else:
                cur = 0
        if chain >= min_chain:
            cands.append((chain, -p))
    if not cands:
        return None
    chain, np_ = max(cands)
    return -np_, chain


def stream_agent_loops(
    turn_stream: DataFrame,
    min_chain: int = 3,
    max_period: int = 3,
    include_tool: bool = False,
    idle_timeout_ms: int = 1000,
) -> DataFrame:
    """Turn stream → loop-alert stream: one (conv_id, period, chain,
    loop_turns) row per quiesced conversation that contains a loop
    (clean conversations emit nothing).  ``include_tool`` mirrors the
    batch parameter — both sides hash through the SAME
    ``turn_digest_col`` builder, so a batch config always has its
    streaming twin.
    """
    if min_chain < 1 or max_period < 1:
        raise ValueError(
            "stream_agent_loops: min_chain and max_period must be >= 1"
        )
    from ..ops.transcripts import turn_digest_col

    digested = turn_stream.select(
        "conv_id",
        "turn_idx",
        turn_digest_col(include_tool).alias("dg"),
    )

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            turn_idxs, digests = state.get
            pairs = sorted(zip(turn_idxs, digests))
            state.remove()
            best = _best_loop(
                [d for _, d in pairs], min_chain, max_period
            )
            if best is None:
                yield _EMPTY
                return
            period, chain = best
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "period": pd.Series([period], dtype="int64"),
                    "chain": pd.Series([chain], dtype="int64"),
                    "loop_turns": pd.Series(
                        [chain + period], dtype="int64"
                    ),
                }
            )
            return
        turn_idxs: list[int] = []
        digests: list[str] = []
        if state.exists:
            prev_idx, prev_dg = state.get
            turn_idxs.extend(prev_idx)
            digests.extend(prev_dg)
        for pdf in pdfs:
            for i, d in zip(pdf["turn_idx"], pdf["dg"]):
                if pd.isna(i) or pd.isna(d):
                    continue
                turn_idxs.append(int(i))
                digests.append(str(d))
        state.update((turn_idxs, digests))
        state.setTimeoutDuration(idle_timeout_ms)
        yield _EMPTY

    return digested.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def digest_parity_probe(
    text: str | None, role: str | None, tool: str | None = None,
    include_tool: bool = False,
) -> str:
    """The Python twin of ``turn_digest_col``, for tests: both sides
    must hash coalesce(role,'') <US> coalesce(text,'') [<US>
    coalesce(tool,'')] identically or stream and batch detection
    diverge silently."""
    s = f"{role or ''}\x1f{text or ''}"
    if include_tool:
        s += f"\x1f{tool or ''}"
    return hashlib.md5(s.encode("utf-8")).hexdigest()
