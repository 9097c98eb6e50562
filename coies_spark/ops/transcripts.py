"""Transcript-table analytics over the north-rule input shape.

The engine's input is an Iceberg-style table of multi-turn
conversation / agent transcripts with columns (conv_id, turn_idx,
role, text, tool, ts).  ``synthesize_transcripts`` derives a
deterministic transcript table from a documents table (the
``synthesize_media`` pattern — pure column expressions both engines
reproduce bit-for-bit), and ``conversation_stats`` is the monitoring
pass a transcript corpus runs before KG extraction or training-data
curation: turn/role balance, strict-alternation violations, tool-call
rate, turn length, wall span.

Plan shapes are 100 TB-safe: synthesis is explode + per-row
projection (no higher-order lambda re-evaluates a computed column —
the measured O(len²) Catalyst trap); stats are one window pass + one
groupBy, both keyed on conv_id so the exchange is shared.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col

TURN_CHARS = 80  # synthesis: one turn per 80-char slice of the doc


def _assembled_turns_col(sep: str = " "):
    """Aggregate expression reassembling grouped turns into one text:
    ``array_join(transform(array_sort(collect_list(struct(turn_idx,
    text))), s -> s.text), sep)``.  Order-deterministic regardless of
    partitioning (the struct sort pins turn order), so every consumer
    (pack_turns, conversation_neardup) reassembles identically —
    shared for the same drift-prevention reason as the PII pattern
    builders."""
    return F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
            lambda s: s["text"],
        ),
        sep,
    )


def turn_digest_col(include_tool: bool = False):
    """The turn-identity digest shared by batch loop detection
    (:func:`agent_loops`) and the streaming twin
    (``streaming.loops``): ``md5(coalesce(role,'') <US> coalesce(
    text,'') [<US> coalesce(tool,'')])``.  NULL fields hash as empty
    strings — explicitly, with ``concat`` + ``coalesce`` rather than
    ``concat_ws`` (which silently SKIPS nulls and would make a
    NULL-text turn collide with a no-separator variant while the
    NULL-propagating SQL twin saw no digest at all).  One builder so
    batch, stream, and oracle can never drift."""
    parts = [
        F.coalesce(F.col("role"), F.lit("")),
        F.lit("\x1f"),
        F.coalesce(F.col("text"), F.lit("")),
    ]
    if include_tool:
        parts += [F.lit("\x1f"), F.coalesce(F.col("tool"), F.lit(""))]
    return F.md5(F.encode(F.concat(*parts), "utf-8"))


def synthesize_transcripts(
    docs: DataFrame, tool_every: int = 4
) -> DataFrame:
    """(conv_id, turn_idx, role, text, tool, ts): deterministic fake
    transcript table derived from documents — each document becomes
    one conversation, sliced into ``TURN_CHARS``-character turns with
    alternating user/assistant roles, a tool call every
    ``tool_every``-th turn, and a monotone per-turn timestamp.  Pure
    column expressions (explode a turn-index sequence, then per-row
    ``substring``) so a DuckDB oracle reproduces every byte."""
    n_turns = F.greatest(
        F.ceil(F.length("text") / TURN_CHARS), F.lit(1)
    ).cast("int")
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx"),
        )
        .select(
            F.concat(F.lit("conv-"), F.col("doc_id").cast("string")).alias(
                "conv_id"
            ),
            "turn_idx",
            F.when(F.col("turn_idx") % 2 == 0, "user")
            .otherwise("assistant")
            .alias("role"),
            F.substring(
                "text", F.col("turn_idx") * TURN_CHARS + 1, TURN_CHARS
            ).alias("text"),
            F.when(
                F.col("turn_idx") % tool_every == tool_every - 1,
                F.element_at(
                    F.array(F.lit("search"), F.lit("code"), F.lit("browse")),
                    (F.col("turn_idx") % 3 + 1).cast("int"),
                ),
            ).alias("tool"),
            F.timestamp_seconds(
                F.col("doc_id") * 1000 + F.col("turn_idx") * 7
            ).alias("ts"),
        )
    )


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """(conv_id, n_turns, n_user, n_assistant, n_tool_calls,
    alternation_violations, avg_turn_tokens, duration_s): per-
    conversation health metrics.

    * ``alternation_violations`` counts turns whose role equals the
      previous turn's role under stable ``turn_idx`` ordering — the
      north rule's "windowed turn assembly under stable turn
      ordering" invariant, surfaced as a gauge.
    * ``avg_turn_tokens`` uses the engine tokenizer, rounded 6dp for
      cross-engine float stability.
    * ``duration_s`` is the wall span between the first and last turn.

    One window pass (lag over conv_id, turn_idx) feeding one groupBy
    on the same key — the exchange is shared, so the whole table
    costs a single shuffle at any scale."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lagged = transcripts.select(
        "conv_id",
        "role",
        "tool",
        "ts",
        F.size(tokens_col("text")).alias("n_toks"),
        (F.lag("role").over(w) == F.col("role"))
        .cast("int")
        .alias("viol"),
    )
    return lagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum((F.col("role") == "user").cast("int"))
        .cast("long")
        .alias("n_user"),
        F.sum((F.col("role") == "assistant").cast("int"))
        .cast("long")
        .alias("n_assistant"),
        F.sum(F.col("tool").isNotNull().cast("int"))
        .cast("long")
        .alias("n_tool_calls"),
        F.coalesce(F.sum("viol"), F.lit(0))
        .cast("long")
        .alias("alternation_violations"),
        F.round(F.avg("n_toks"), 6).alias("avg_turn_tokens"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("long")
        .alias("duration_s"),
    )


def _turn_token_count(
    merges: list[tuple[str, str]] | None,
) -> Column:
    """Per-turn token count for the packing/chunking ops: whitespace
    engine tokens by default, trained-tokenizer (BPE) tokens when a
    merge list is given — one shared definition so pack/chunk budgets
    can't drift from the segmenter."""
    if merges is None:
        return F.size(tokens_col("text")).cast("long")
    from .bpe import bpe_symbol_count_col

    return bpe_symbol_count_col("text", merges)


def pack_turns(
    transcripts: DataFrame,
    budget_tokens: int = 64,
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """(conv_id, chunk_id, n_turns, n_tokens, first_turn, last_turn,
    packed_text): offset-based sequence packing — each conversation's
    turns, in stable turn order, are grouped into training chunks of
    ~``budget_tokens`` engine-tokenizer tokens.

    A turn belongs to chunk ``floor(token_offset / budget)`` where
    ``token_offset`` is the cumulative token count of all PRECEDING
    turns — i.e. chunks split at fixed token offsets, never mid-turn.
    A chunk can therefore overflow the budget by up to (its last
    turn's length − 1) tokens; that is the standard streaming
    approximation of first-fit packing, whose exact form needs
    sequential bin state that cannot be expressed as a distributed
    prefix sum.  Short conversations yield one chunk; empty turns
    cost 0 tokens and ride along.

    ``packed_text`` reassembles the chunk's turns in turn order via
    ``array_sort(collect_list(struct(turn_idx, text)))`` — order-
    deterministic under any task ordering, matching DuckDB's
    ``string_agg(... ORDER BY turn_idx)``.

    With ``merges`` (a trained BPE merge list —
    ``[(r.lhs, r.rhs) for r in bpe_merges(...)...]``), token counts
    are TOKENIZER tokens (``bpe_symbol_count_col``) instead of
    whitespace words — the unit training loaders actually consume;
    whitespace budgets mis-size rows by exactly the per-language
    fertility factor.  Splits stay turn-granular either way.

    Plan: one window pass (the exclusive prefix sum) and one groupBy.
    Both key on conv_id (the groupBy adds chunk_id), so at 10¹² turns
    this is the same conv_id-clustered shape as turn assembly — on
    the bucketed transcript layout the window's exchange is satisfied
    by the storage layout and the whole pack costs one shuffle.
    """
    if budget_tokens < 1:
        raise ValueError("pack_turns: budget_tokens must be >= 1")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = transcripts.select(
        "conv_id",
        "turn_idx",
        "text",
        _turn_token_count(merges).alias("n_toks"),
    )
    offs = toks.withColumn(
        "chunk_id",
        F.floor(
            F.coalesce(F.sum("n_toks").over(w), F.lit(0))
            / F.lit(budget_tokens)
        ).cast("long"),
    )
    return (
        offs.groupBy("conv_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.min("turn_idx").cast("long").alias("first_turn"),
            F.max("turn_idx").cast("long").alias("last_turn"),
            _assembled_turns_col().alias("packed_text"),
        )
    )


def sliding_chunks(
    transcripts: DataFrame,
    window_tokens: int = 64,
    stride_tokens: int = 32,
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """(conv_id, chunk_id, n_turns, n_tokens, first_turn, last_turn,
    chunk_text): OVERLAPPING retrieval chunks — each conversation's
    token stream is covered by windows of ``window_tokens`` starting
    every ``stride_tokens``, and a turn belongs to EVERY window its
    token span ``[offset, offset+len)`` intersects.  This is the RAG
    chunking recipe (stride < window ⇒ adjacent chunks share
    boundary context, so an answer straddling a cut is whole in at
    least one chunk), where :func:`pack_turns` is the disjoint
    training-packing recipe.

    Membership is turn-granular: chunks never split mid-turn, so a
    boundary turn is duplicated into each window it touches and a
    chunk can exceed ``window_tokens`` by its edge turns' overhang —
    the standard trade for keeping turns atomic.  Zero-token turns
    span no token range and join no chunk.  Chunk ids are
    ``floor(position / stride)`` over [k_min, k_max] computed from
    pure integer token offsets, so membership is deterministic on
    any engine or partitioning:

    * ``k_min = max(0, floor((offset − window) / stride) + 1)`` —
      first window still covering the turn's first token;
    * ``k_max = floor((offset + len − 1) / stride)`` — last window
      starting at or before the turn's last token.

    With ``merges``, window/stride positions are measured in trained
    BPE tokens (``bpe_symbol_count_col``) instead of whitespace words
    — retrieval windows sized in the unit the embedder/reader model
    actually consumes.  Membership stays turn-granular either way.

    Scale: one conv_id window pass (the exclusive prefix sum — on the
    bucketed transcript layout its exchange is satisfied by storage),
    an in-row ``sequence()`` explode whose fan-out is bounded by
    ``len/stride + window/stride`` chunks per turn (≈ the overlap
    factor; a 64/32 config duplicates each turn ~2–3×), then ONE
    groupBy (conv_id, chunk_id) with the shared order-deterministic
    turn assembly.
    """
    if stride_tokens < 1 or window_tokens < stride_tokens:
        raise ValueError(
            "sliding_chunks: need 1 <= stride_tokens <= window_tokens"
        )
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = transcripts.select(
        "conv_id",
        "turn_idx",
        "text",
        _turn_token_count(merges).alias("n_toks"),
    )
    offs = toks.withColumn(
        "off", F.coalesce(F.sum("n_toks").over(w), F.lit(0))
    ).where(F.col("n_toks") > 0)
    spanned = offs.select(
        "conv_id",
        "turn_idx",
        "text",
        "n_toks",
        F.explode(
            F.sequence(
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("off") - window_tokens)
                        / F.lit(stride_tokens)
                    ).cast("long")
                    + 1,
                ),
                F.floor(
                    (F.col("off") + F.col("n_toks") - 1)
                    / F.lit(stride_tokens)
                ).cast("long"),
            )
        ).alias("chunk_id"),
    )
    return spanned.groupBy("conv_id", "chunk_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        F.min("turn_idx").cast("long").alias("first_turn"),
        F.max("turn_idx").cast("long").alias("last_turn"),
        _assembled_turns_col().alias("chunk_text"),
    )


def scrub_pii_turns(
    transcripts: DataFrame, roles: tuple[str, ...] | None = ("user",)
) -> DataFrame:
    """(conv_id, turn_idx, role, text, n_url, n_email, n_ip, n_phone):
    the PII-redaction pass at TURN granularity, gated by role — by
    default only ``user`` turns are scrubbed, because user-authored
    text is the PII risk surface while assistant/tool turns are
    model-generated (scrubbing them costs recall for no privacy win;
    pass ``roles=None`` to scrub every role).

    Reuses the shared pattern builders
    (:func:`~coies_spark.ops.textstats.scrub_cols`, the same
    ``PII_PATTERNS`` the document scrub and the fused curation pass
    compile), so turn-level and document-level redaction can never
    drift.  Non-scrubbed roles pass through byte-identical (the
    north rule's per-turn text equality holds for them) with zero
    counts.

    Scale: a pure regexp projection — codegen, zero shuffle,
    embarrassingly parallel over turns; the role gate is a CASE, not
    a filter, so the output keeps every turn and stays join-alignable
    with the input on (conv_id, turn_idx).
    """
    from .textstats import PII_PATTERNS, scrub_cols

    scrubbed, counts = scrub_cols()
    gate = (
        F.lit(True) if roles is None else F.col("role").isin(list(roles))
    )
    return transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        F.when(gate, scrubbed).otherwise(F.col("text")).alias("text"),
        *[
            F.when(gate, c)
            .otherwise(F.lit(0))
            .cast("long")
            .alias(f"n_{name}")
            for c, (name, _, _) in zip(counts, PII_PATTERNS)
        ],
    )


def conversation_neardup(
    transcripts: DataFrame,
    n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """(conv_a, conv_b): near-duplicate CONVERSATION candidates —
    MinHash+LSH at conversation granularity, the dedup unit a
    transcript training corpus actually needs (retried agent runs and
    re-asked questions duplicate whole conversations, not single
    turns).

    Each conversation's turns are assembled in stable turn order
    (``array_sort(collect_list(struct))`` — order-deterministic) into
    one token stream, THEN shingled: shingles cross turn boundaries,
    so two conversations that split the same text differently still
    collide, and a template turn repeated across otherwise-different
    conversations does not (turn-local shingling would get both
    wrong).  Candidates feed :func:`coies_spark.operators.graph
    .label_propagation` / ``kcore`` for cluster analysis, or the
    min-id survivor rule for the scrub.

    Cost: assembly is ONE conv_id-keyed groupBy — zero exchanges on
    the bucketed transcript layout — then the standard wide-signature
    aggregation + band self-join (:func:`~coies_spark.ops.dedup
    .lsh_candidate_pairs`).  Conversation rows are bounded (turns per
    conv is bounded), so the assembled row is not a skew hazard.
    """
    from . import dedup

    return dedup.lsh_candidate_pairs(
        conversation_docs(transcripts),
        n=n, num_hashes=num_hashes, band_size=band_size,
    ).select(
        F.col("doc_a").alias("conv_a"), F.col("doc_b").alias("conv_b")
    )


def conversation_docs(transcripts: DataFrame) -> DataFrame:
    """(doc_id, text): each conversation reassembled into one
    document — turns in stable order, space-joined
    (``_assembled_turns_col``, shared with pack_turns) — so any
    document-granularity operator (near-dup, decontamination,
    quality) runs at CONVERSATION granularity unchanged.  One
    conv_id-keyed groupBy, zero exchanges on the bucketed layout."""
    return transcripts.groupBy("conv_id").agg(
        _assembled_turns_col().alias("text")
    ).select(F.col("conv_id").alias("doc_id"), "text")


def boilerplate_turns(
    transcripts: DataFrame, min_convs: int = 2
) -> DataFrame:
    """(digest, n_convs, n_turns, sample_text): normalized turn texts
    that appear in at least ``min_convs`` DISTINCT conversations — the
    CCNet/RefinedWeb repeated-line boilerplate rule (Wenzek et al.
    2020 §4.1; Penedo et al. 2023) lifted from web-page lines to
    transcript turns.  In agent transcripts these are canned
    greetings, system banners, and templated tool preambles: exactly
    the content a pretraining corpus over-weights if left in.

    * normalization = lower + trim (the CCNet recipe); empty turns
      are excluded (a padding slice is not boilerplate, and at web
      scale the empty-digest group would be a mega-hot key).
    * ``digest`` is md5 of the normalized text so downstream joins
      move 32-byte keys, never the turn bodies.
    * ``sample_text`` = min(normalized text) per digest — one
      deterministic exemplar for reporting (all texts in a digest
      group are byte-identical anyway, barring md5 collision).

    Scale: one groupBy on digest (map-side combinable: the distinct
    conv_id count is a partial-aggregatable HLL-free exact count only
    after the shuffle, but rows per digest collapse map-side first via
    the (digest, conv_id) pre-distinct).  Output is the boilerplate
    dictionary — tiny relative to the corpus.
    """
    norm = F.trim(F.lower(F.col("text")))
    per_conv = (
        transcripts.where(norm != "")
        .select(
            F.md5(F.encode(norm, "utf-8")).alias("digest"),
            norm.alias("norm_text"),
            "conv_id",
        )
        # collapse within-conversation repeats BEFORE the count —
        # (digest, conv_id) distinct is itself map-side combinable
        .groupBy("digest", "conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_in_conv"),
            F.min("norm_text").alias("norm_text"),
        )
    )
    return (
        per_conv.groupBy("digest")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_convs"),
            F.sum("n_in_conv").cast("long").alias("n_turns"),
            F.min("norm_text").alias("sample_text"),
        )
        .where(F.col("n_convs") >= min_convs)
    )


def scrub_boilerplate_turns(
    transcripts: DataFrame, min_convs: int = 2
) -> DataFrame:
    """Transcripts minus boilerplate turns: drops every turn whose
    normalized text appears in ≥ ``min_convs`` distinct conversations
    (see ``boilerplate_turns``).  Schema-preserving — surviving rows
    pass through byte-identical, so the per-turn text-equality
    invariant holds for everything kept.

    Scale: LEFT ANTI join on the 32-byte digest.  The boilerplate
    side is an aggregate output orders of magnitude smaller than the
    corpus, so AQE converts the anti-join to a broadcast at runtime;
    the corpus side is never re-shuffled beyond that one join.
    """
    bp = boilerplate_turns(transcripts, min_convs).select("digest")
    norm = F.trim(F.lower(F.col("text")))
    keyed = transcripts.withColumn(
        "_digest",
        F.when(norm != "", F.md5(F.encode(norm, "utf-8"))),
    )
    return keyed.join(
        bp, keyed["_digest"] == bp["digest"], "left_anti"
    ).drop("_digest")


def tool_transitions(transcripts: DataFrame) -> DataFrame:
    """(src_tool, dst_tool, n, p): the tool-call transition graph of
    an agent-transcript corpus — for each conversation's tool-bearing
    turns under stable ``turn_idx`` ordering, an edge from the
    previous tool invoked to the next one (``'<start>'`` for a
    conversation's first tool call).  ``p`` = n / Σn over the same
    ``src_tool``, rounded 6dp: the empirical next-tool distribution.

    This is the KG-materialization move applied to agent behavior:
    the output IS a (subj=src_tool, pred='precedes', obj=dst_tool)
    weighted edge table, ready for the same partitioned triple sink
    as the extraction pipeline.

    Scale: one window pass keyed on conv_id (same exchange the other
    per-conversation passes share), then a groupBy on the edge —
    map-side combinable counts; the edge table is O(tools²), tiny.
    The final per-src normalization is a window over that tiny table.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    calls = transcripts.where(F.col("tool").isNotNull()).select(
        "conv_id",
        "turn_idx",
        F.col("tool").alias("dst_tool"),
        F.coalesce(F.lag("tool").over(w), F.lit("<start>")).alias(
            "src_tool"
        ),
    )
    edges = calls.groupBy("src_tool", "dst_tool").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wsrc = Window.partitionBy("src_tool")
    return edges.select(
        "src_tool",
        "dst_tool",
        "n",
        F.round(F.col("n") / F.sum("n").over(wsrc), 6).alias("p"),
    )


def agent_loops(
    transcripts: DataFrame,
    min_chain: int = 3,
    max_period: int = 3,
    include_tool: bool = False,
) -> DataFrame:
    """(conv_id, period, chain, loop_turns): conversations where an
    agent is STUCK IN A LOOP — the same turn content recurring with
    period p in [1, max_period] for at least ``min_chain`` consecutive
    recurrences.  Period 1 is a verbatim-retry loop (the agent
    re-emits the same turn); period 2 is the classic two-state
    try/fail oscillation; higher periods catch longer tool-retry
    cycles.  This is the transcript-native curation filter exact-span
    dedup cannot express: the repetition is WITHIN one conversation
    and periodic, not across documents.

    A turn's identity is :func:`turn_digest_col` —
    ``md5(role <US> text [<US> tool])`` with NULL fields hashing as
    empty strings (US = unit separator) — role-qualified so a user
    echoing the assistant does not count; ``include_tool=True``
    additionally requires the same tool slot.  ``chain`` counts consecutive turns
    satisfying ``digest(t) == digest(t - p)``; a chain of c with
    period p means c + p turns trapped in the cycle (``loop_turns``),
    i.e. at least ``(c + p) / p`` full cycles.  Per conversation, the
    single longest chain is reported (ties -> smallest period, so a
    pure period-1 loop is never mislabeled as its trivial period-2
    echo).

    Plan shape: ONE exchange end-to-end.  The lag comparisons for
    every period ride one (conv_id)-partitioned window; the islands
    pass (run-length via running sum of chain breaks) partitions by
    (conv_id, period) and the island/chain/argmax groupBys key on
    supersets of conv_id — hash-partitioning by conv_id satisfies
    every downstream clustering, so Catalyst inserts no further
    shuffle.  State per row is 3 small integers; nothing is
    conversation-length-quadratic.
    """
    if min_chain < 1 or max_period < 1:
        raise ValueError(
            "agent_loops: min_chain and max_period must be >= 1"
        )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    d = transcripts.select(
        "conv_id",
        "turn_idx",
        turn_digest_col(include_tool).alias("dg"),
    )
    reps = d.select(
        "conv_id",
        "turn_idx",
        *[
            F.coalesce(
                (F.col("dg") == F.lag("dg", p).over(w)).cast("int"),
                F.lit(0),
            ).alias(f"rep_{p}")
            for p in range(1, max_period + 1)
        ],
    )
    long = reps.select(
        "conv_id",
        "turn_idx",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).cast("int").alias("period"),
                        F.col(f"rep_{p}").alias("rep"),
                    )
                    for p in range(1, max_period + 1)
                ]
            )
        ).alias("pr"),
    ).select("conv_id", "turn_idx", "pr.period", "pr.rep")
    wp = Window.partitionBy("conv_id", "period").orderBy("turn_idx")
    islands = long.withColumn(
        "island", F.sum(F.lit(1) - F.col("rep")).over(wp)
    )
    chains = (
        islands.groupBy("conv_id", "period", "island")
        .agg(F.sum("rep").alias("chain"))
        .groupBy("conv_id", "period")
        .agg(F.max("chain").alias("chain"))
        .where(F.col("chain") >= min_chain)
    )
    best = chains.groupBy("conv_id").agg(
        F.max(
            F.struct(F.col("chain"), (-F.col("period")).alias("np"))
        ).alias("b")
    )
    return best.select(
        "conv_id",
        (-F.col("b.np")).cast("long").alias("period"),
        F.col("b.chain").cast("long").alias("chain"),
        (F.col("b.chain") - F.col("b.np")).cast("long").alias(
            "loop_turns"
        ),
    )


def scrub_agent_loops(
    transcripts: DataFrame,
    min_chain: int = 3,
    max_period: int = 3,
    include_tool: bool = False,
) -> DataFrame:
    """Transcripts minus looping conversations: drops every turn of a
    conversation :func:`agent_loops` flags — the apply step of loop
    detection, mirroring :func:`scrub_boilerplate_turns`.  Whole-
    conversation removal is the right curation granularity for stuck
    agents: the loop is evidence the ENTIRE trajectory is degenerate
    (an agent that spun for 40 turns is not good training data up to
    turn 39 and bad after), and it preserves the per-turn
    text-equality invariant for everything kept.

    Scale: LEFT ANTI join on conv_id.  The flagged side is one row
    per looping conversation — a tiny aggregate AQE broadcasts — and
    the corpus side is never re-shuffled beyond that join.
    """
    loops = agent_loops(
        transcripts,
        min_chain=min_chain,
        max_period=max_period,
        include_tool=include_tool,
    ).select("conv_id")
    return transcripts.join(loops, "conv_id", "left_anti")


def text_tiling(
    transcripts: DataFrame,
    w: int = 2,
    threshold: float = 0.1,
) -> DataFrame:
    """(conv_id, turn_idx, sim_next, is_boundary, segment_id): lexical
    topic segmentation of each conversation — TextTiling (Hearst,
    CL 1997) adapted to turn granularity.  Long agent transcripts mix
    episodes (plan → search → code → recover); downstream KG
    extraction and sequence packing both want episode boundaries, not
    raw conversations.

    For the GAP after turn i: ``sim_next`` = Jaccard between the
    distinct-token sets of the ``w`` turns ending at i and the ``w``
    turns following i (integer intersection/union — the only float is
    the final division, engine-exact).  Only gaps with FULL ``w``-turn
    windows on BOTH sides are scored (Hearst's rule): a partial
    window systematically deflates the similarity — a lone short
    closing turn would otherwise fire a spurious boundary before
    every conversation's tail — so edge gaps carry a NULL
    ``sim_next`` and are never boundaries.  A gap is a boundary
    (``is_boundary``) when its similarity is a STRICT local valley —
    below both neighboring gaps' similarities, a missing neighbor
    counting as infinitely high — AND below ``threshold``.
    ``segment_id`` numbers each turn's episode from 1 via the running
    boundary count (the gaps-and-islands convention of
    :func:`agent_loops`).

    Scale: ONE exchange on conv_id feeds every step — the two
    collect_list windows (each bounded by ``w`` turns — state is
    O(w · turn length), never the conversation), the lag/lead valley
    test, and the running boundary sum all share the same
    (conv_id, turn_idx) ordering, so Catalyst plans a single sort +
    window chain with no further shuffle (plan-tested).
    """
    if w < 1:
        raise ValueError("text_tiling: w must be >= 1")
    ww = Window.partitionBy("conv_id").orderBy("turn_idx")
    left_w = ww.rowsBetween(-(w - 1), 0)
    right_w = ww.rowsBetween(1, w)
    toks = transcripts.select(
        "conv_id", "turn_idx", tokens_col("text").alias("tk")
    )
    sets = toks.select(
        "conv_id",
        "turn_idx",
        F.array_distinct(F.flatten(F.collect_list("tk").over(left_w))).alias(
            "lset"
        ),
        F.array_distinct(
            F.flatten(F.collect_list("tk").over(right_w))
        ).alias("rset"),
        F.count(F.lit(1)).over(left_w).alias("n_left"),
        F.count(F.lit(1)).over(right_w).alias("n_right"),
    )
    inter = F.size(F.array_intersect("lset", "rset"))
    union = F.size(F.array_union("lset", "rset"))
    # full windows only (Hearst); empty-token full windows (punct-only
    # turns) score 0
    sim = F.when(
        (F.col("n_left") < w) | (F.col("n_right") < w), F.lit(None)
    ).otherwise(
        F.when(union == 0, F.lit(0.0)).otherwise(
            F.round(inter / union, 6)
        )
    )
    simmed = sets.select("conv_id", "turn_idx", sim.alias("sim_next"))
    prev_sim = F.lag("sim_next").over(ww)
    next_sim = F.lead("sim_next").over(ww)
    is_b = (
        F.col("sim_next").isNotNull()
        & (F.col("sim_next") < F.lit(threshold))
        & (prev_sim.isNull() | (F.col("sim_next") < prev_sim))
        & (next_sim.isNull() | (F.col("sim_next") < next_sim))
    )
    flagged = simmed.select(
        "conv_id", "turn_idx", "sim_next", is_b.alias("is_boundary")
    )
    seg = (
        F.coalesce(
            F.sum(F.col("is_boundary").cast("int")).over(
                ww.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        + 1
    )
    return flagged.select(
        "conv_id",
        "turn_idx",
        "sim_next",
        "is_boundary",
        seg.cast("long").alias("segment_id"),
    )


def training_pairs(
    transcripts: DataFrame,
    context_turns: int = 4,
    target_role: str = "assistant",
) -> DataFrame:
    """(conv_id, turn_idx, n_context, prompt, response): instruct-
    tuning example assembly — for every ``target_role`` turn with at
    least one preceding turn, the training pair (prompt = the up-to-
    ``context_turns`` preceding turns rendered ``role: text`` one per
    line, response = the turn's RAW text).  This is the terminal
    operator of the transcript curation funnel: after loop/boilerplate
    scrubbing and near-dup filtering, what ships to the trainer is
    exactly these rows.

    Semantics:

    * context = the ``context_turns`` turns immediately before the
      target under stable turn ordering, whatever their roles (tool
      and system turns are context too — the model must condition on
      them);
    * a context line renders NULL role/text as empty strings
      (explicitly, so the rendered prompt is deterministic); the
      RESPONSE is the raw ``text`` column untouched — the per-turn
      text-equality invariant holds on output rows by construction —
      and target turns with NULL/empty text are dropped (an empty
      completion trains nothing);
    * turns with no predecessor yield no pair (nothing to condition
      on).

    Plan: ONE window pass over (conv_id, turn_idx) — the context is
    ``collect_list(struct(turn_idx, role, text))`` over rows
    [-context_turns, -1], struct-sorted so assembly is deterministic
    under any task ordering (the ``pack_turns`` convention).  On the
    conv_id-bucketed layout the exchange is satisfied by storage; no
    join, no second shuffle, output is a filtered projection.
    """
    if context_turns < 1:
        raise ValueError("training_pairs: context_turns must be >= 1")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-context_turns, -1)
    )
    ctx = F.array_sort(
        F.collect_list(F.struct("turn_idx", "role", "text")).over(w)
    )
    out = transcripts.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        "role",
        "text",
        ctx.alias("__ctx"),
    )
    prompt = F.array_join(
        F.transform(
            F.col("__ctx"),
            lambda s: F.concat(
                F.coalesce(s["role"], F.lit("")),
                F.lit(": "),
                F.coalesce(s["text"], F.lit("")),
            ),
        ),
        "\n",
    )
    return (
        out.where(
            (F.col("role") == target_role)
            & F.col("text").isNotNull()
            & (F.col("text") != "")
            & (F.size("__ctx") >= 1)
        )
        .select(
            "conv_id",
            "turn_idx",
            F.size("__ctx").cast("long").alias("n_context"),
            prompt.alias("prompt"),
            F.col("text").alias("response"),
        )
    )


def tool_sequence_score(transcripts: DataFrame) -> DataFrame:
    """(conv_id, n_transitions, nll, avg_nll): how SURPRISING each
    conversation's tool-call sequence is under the corpus's own
    first-order transition model — the anomaly gauge over
    :func:`tool_transitions`' graph.  An agent run whose tool chain
    wanders off the corpus's common paths (a jailbroken loop, a
    broken harness, a new workload) scores a high average negative
    log-likelihood; routine runs score near the corpus baseline.
    This is the Markov-chain twin of ``lm.lm_perplexity``'s text
    filter, applied to agent BEHAVIOR instead of tokens.

    Semantics: transitions are (prev tool → tool) over the
    conversation's tool-bearing turns in stable turn order, with
    ``'<start>'`` before the first call (exactly
    :func:`tool_transitions`' edges); the model is the corpus MLE
    p(dst|src) = n_edge / n_src — no smoothing needed because every
    scored transition was counted into the model.

    Exactness: per-EDGE cost ``round(-ln(n_edge / n_src), 9)`` is a
    scalar over two integers (edge table is O(tools²), tiny); the
    per-conversation sum lifts those 9dp costs to decimal(28,12)
    (order-independent), then avg_nll divides by the integer count
    and rounds 6.

    Plan: the same ONE conv_id exchange as tool_transitions (window
    lag), a tiny edge-count groupBy, a broadcast join of edge costs
    back onto the transition instances, and a conv_id groupBy that
    reuses the first exchange's partitioning.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    calls = transcripts.where(F.col("tool").isNotNull()).select(
        "conv_id",
        F.col("tool").alias("dst_tool"),
        F.coalesce(F.lag("tool").over(w), F.lit("<start>")).alias(
            "src_tool"
        ),
    )
    edges = calls.groupBy("src_tool", "dst_tool").agg(
        F.count(F.lit(1)).cast("long").alias("n_edge")
    )
    srcs = edges.groupBy("src_tool").agg(
        F.sum("n_edge").cast("long").alias("n_src")
    )
    cost = edges.join(srcs, "src_tool").select(
        "src_tool",
        "dst_tool",
        F.round(
            -F.log(F.col("n_edge") / F.col("n_src")), 9
        ).alias("c"),
    )
    return (
        calls.join(F.broadcast(cost), ["src_tool", "dst_tool"])
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_transitions"),
            F.round(
                F.sum(F.col("c").cast("decimal(28,12)")).cast("double"),
                6,
            ).alias("nll"),
            F.round(
                F.sum(F.col("c").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_nll"),
        )
    )


def transcript_integrity(transcripts: DataFrame) -> DataFrame:
    """(conv_id, n_turns, dup_turn_idx, missing_turn_idx,
    ts_inversions, null_turn_idx, null_text, empty_text, null_role):
    the ingest contract check for the north-rule input shape —
    Deequ-style data-quality gauges computed per conversation, BEFORE
    any stage that assumes "stable turn ordering" (every window pass
    in this module; the per-turn text-equality invariant is only
    meaningful when (conv_id, turn_idx) is a key).

    * ``dup_turn_idx`` — turns sharing a turn_idx with another turn
      (n_turns − distinct non-null idx − null idx): the invariant
      breaker that silently corrupts window assembly.
    * ``missing_turn_idx`` — holes in the idx range (max − min + 1 −
      distinct): evidence of dropped turns upstream.
    * ``ts_inversions`` — turns whose timestamp precedes the previous
      turn's under stable (turn_idx, ts) ordering: clock skew or
      mis-merged shards.  Equal timestamps are NOT inversions, so the
      count is order-deterministic even under idx duplicates.
    * ``null_turn_idx`` / ``null_text`` / ``empty_text`` /
      ``null_role`` — plain completeness counters.

    One window pass feeding one groupBy on the same conv_id key —
    the exchange is shared (the conversation_stats plan shape), so
    the audit costs a single shuffle at any corpus size.  A healthy
    feed reports all-zero gauges; route any non-zero conversation to
    quarantine before extraction, not after.
    """
    # NULL idx sorts LAST explicitly: Spark's asc default is
    # nulls-first, DuckDB's is nulls-last — pin the DuckDB order so
    # the inversion count is engine-deterministic under null idx too
    w = Window.partitionBy("conv_id").orderBy(
        F.asc_nulls_last("turn_idx"), F.asc_nulls_last("ts")
    )
    flagged = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "ts",
        (F.lag("ts").over(w) > F.col("ts")).cast("int").alias("inv"),
    )
    return flagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        (
            F.count(F.lit(1))
            - F.count_distinct(F.col("turn_idx"))
            - F.sum(F.col("turn_idx").isNull().cast("int"))
        )
        .cast("long")
        .alias("dup_turn_idx"),
        (
            F.max("turn_idx")
            - F.min("turn_idx")
            + 1
            - F.count_distinct(F.col("turn_idx"))
        )
        .cast("long")
        .alias("missing_turn_idx"),
        F.coalesce(F.sum("inv"), F.lit(0))
        .cast("long")
        .alias("ts_inversions"),
        F.sum(F.col("turn_idx").isNull().cast("int"))
        .cast("long")
        .alias("null_turn_idx"),
        F.sum(F.col("text").isNull().cast("int"))
        .cast("long")
        .alias("null_text"),
        # per-row coalesce: (NULL = '') is NULL, and a conversation
        # whose every text is NULL must gauge 0 empties, not NULL
        F.sum(F.coalesce((F.col("text") == "").cast("int"), F.lit(0)))
        .cast("long")
        .alias("empty_text"),
        F.sum(F.col("role").isNull().cast("int"))
        .cast("long")
        .alias("null_role"),
    )


# Assistant-refusal surface forms (lowercased match).  Kept to plain
# alternation + '.'-wildcards so the SAME pattern string runs on
# Java's regex, RE2, and DuckDB — the PII_PATTERNS portability rule.
REFUSAL_PATTERN = (
    "(i cannot|i can.t|i.m sorry|i am sorry|as an ai"
    "|i.m unable|i am unable|i won.t be able)"
)


def refusal_stats(
    transcripts: DataFrame, pattern: str = REFUSAL_PATTERN
) -> DataFrame:
    """(conv_id, n_assistant, n_refusals, refusal_rate): per-
    conversation assistant-refusal gauge — the instruct-data curation
    signal every RLHF/SFT funnel filters on (a transcript whose
    assistant mostly refuses teaches refusal, not capability;
    conversely a 0%-refusal corpus teaches sycophancy — the MIXTURE
    is a training choice, so the gauge reports, the sampler decides).

    A refusal is an assistant turn whose lowercased text matches
    ``pattern`` anywhere.  ``refusal_rate`` = refusals/assistant
    turns, 6dp, NULL for conversations with no assistant turns
    (try_divide semantics — distinguishable from a true 0.0).

    Scale: one map-side-combinable groupBy on conv_id; the regex
    runs once per turn in whole-stage codegen.  Compose with
    ``training_pairs`` upstream (drop or down-weight flagged
    conversations before pair assembly).
    """
    is_a = (F.col("role") == "assistant").cast("int")
    is_r = (
        (F.col("role") == "assistant")
        & F.lower(F.col("text")).rlike(pattern)
    ).cast("int")
    return transcripts.groupBy("conv_id").agg(
        F.coalesce(F.sum(is_a), F.lit(0)).cast("long").alias(
            "n_assistant"
        ),
        F.coalesce(F.sum(is_r), F.lit(0)).cast("long").alias(
            "n_refusals"
        ),
        F.round(
            F.try_divide(
                F.coalesce(F.sum(is_r), F.lit(0)),
                F.coalesce(F.sum(is_a), F.lit(0)),
            ),
            6,
        ).alias("refusal_rate"),
    )


def central_turns(transcripts: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, centrality, n_turns): the most CENTRAL
    turn of each conversation — the turn whose mean token-Jaccard to
    every other turn is highest (ties → earliest turn).  This is the
    degree-centrality special case of TextRank's extractive-summary
    rule (Mihalcea & Tarau, EMNLP 2004): one representative turn per
    conversation, for preview cards, retrieval snippets, and cheap
    conversation-level dedup keys.

    ``centrality`` = round(mean over other turns of
    \\|A∩B\\| / \\|A∪B\\| on distinct token sets, 6) — integer set
    sizes, one final division, engine-exact.  Single-turn
    conversations are still emitted with centrality NULL (their only
    turn IS the summary; NULL says "trivially central", not
    "missing").  Empty-token pairs score NULL and drop out of the
    mean on both engines alike.

    Scale: one conv_id-keyed self-join — within-conversation
    quadratic, bounded by the turn cap the ingest contract enforces
    (the rouge-pairs family shape), never cross-conversation; then
    one window argmax on the same conv_id partitioning.
    """
    sets = transcripts.select(
        "conv_id",
        "turn_idx",
        F.array_distinct(tokens_col("text")).alias("tset"),
    )
    a = sets.alias("a")
    b = sets.select(
        "conv_id",
        F.col("turn_idx").alias("turn_b"),
        F.col("tset").alias("tset_b"),
    ).alias("b")
    jac = F.try_divide(
        F.size(F.array_intersect(F.col("a.tset"), F.col("tset_b"))),
        F.size(F.array_union(F.col("a.tset"), F.col("tset_b"))),
    )
    scored = (
        a.join(b, "conv_id")
        .where(F.col("a.turn_idx") != F.col("turn_b"))
        .groupBy("conv_id", F.col("a.turn_idx").alias("turn_idx"))
        .agg(F.round(F.avg(jac), 6).alias("centrality"))
    )
    counts = sets.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns")
    )
    ranked = (
        sets.select("conv_id", "turn_idx")
        .join(scored, ["conv_id", "turn_idx"], "left")
        .join(counts, "conv_id")
    )
    w = Window.partitionBy("conv_id").orderBy(
        F.desc_nulls_last("centrality"), F.asc("turn_idx")
    )
    return (
        ranked.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("conv_id", "turn_idx", "centrality", "n_turns")
    )


def preference_pairs(
    examples: DataFrame,
    prompt_col: str = "prompt",
    response_col: str = "response",
    score_col: str = "score",
) -> DataFrame:
    """(prompt, chosen, rejected, chosen_score, rejected_score,
    n_responses): preference-pair mining for DPO/RLHF-style training
    — wherever the SAME prompt has accumulated several distinct
    responses (multi-turn agent logs replay the same question;
    resampled generations land in the same table), emit the
    best-vs-worst pair under ``score_col`` (any quality signal:
    classifier score, length-normalized heuristic, human rating).
    Prompts with fewer than two DISTINCT responses emit nothing —
    a pair needs a contrast.

    Determinism: duplicate (prompt, response) rows collapse FIRST to
    their best score (a resampled identical generation is one
    candidate, at its best showing — this is also what guarantees
    chosen ≠ rejected); then chosen = max (score, response) struct
    and rejected = min (score, response) struct — under fully tied
    scores the pair degrades to (max response, min response), still
    distinct.  Scores are surfaced so a margin filter
    (``chosen_score - rejected_score >= m``) composes downstream
    without re-mining.

    Plan: two prompt-keyed map-side-combinable aggregates — no
    window, no self-join; at 10^10 examples the only shuffles are
    the groupBys on the prompt key (hash the prompt to a digest
    column first if prompt strings are long — same advice as the
    dedup family).
    """
    ex = (
        examples.select(
            F.col(prompt_col).alias("prompt"),
            F.col(response_col).alias("response"),
            F.col(score_col).cast("double").alias("score"),
        )
        .groupBy("prompt", "response")
        .agg(F.max("score").alias("score"))
    )
    agg = ex.groupBy("prompt").agg(
        F.max(F.struct(F.col("score"), F.col("response"))).alias("__b"),
        F.min(F.struct(F.col("score"), F.col("response"))).alias("__w"),
        F.count(F.lit(1)).cast("long").alias("n_responses"),
    )
    return agg.where(F.col("n_responses") >= 2).select(
        "prompt",
        F.col("__b.response").alias("chosen"),
        F.col("__w.response").alias("rejected"),
        F.round(F.col("__b.score"), 6).alias("chosen_score"),
        F.round(F.col("__w.score"), 6).alias("rejected_score"),
        "n_responses",
    )
