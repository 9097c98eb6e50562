"""Streaming gazetteer mention detection — the ingest-side twin of
:func:`coies_spark.ops.kg.gazetteer_mentions`.

The batch operator resolves longest-match-per-start with a window over
(conv_id, turn_idx, pos) AFTER a dictionary join; neither a window
function nor a post-join aggregation is legal on an unbounded stream.
The streaming face therefore runs the ENTIRE spot-and-resolve inside
one stateless projection: the dictionary is frozen into a map literal
(surface → entities, the :mod:`streaming.classify` frozen-weights
trick), every candidate token n-gram looks itself up in-row, and the
longest-match rule is applied per start position with array ops before
anything explodes.  Stateless projection ⇒ append mode, no watermark,
no state store — a mention feed that scales with input rate only.

Batch parity: identical output rows to ``gazetteer_mentions`` on the
same turns (same tokenizer, same normalization, same longest-match and
ambiguity semantics) — asserted in tests/test_streaming.py.

Scale: the frozen map is for BROADCAST-SCALE dictionaries (the same
contract as ``gazetteer_mentions(broadcast=True)`` and the classifier
weight map).  A 10⁷-surface gazetteer streams through ``foreachBatch``
with the batch operator instead — stream-static joins support the
spotting, but the longest-match window needs the micro-batch boundary.

Downstream, this feed composes with the engine's other streaming
faces: ``stream_triple_confidence`` folds co-mention evidence into
windowed beliefs, and the batch compaction sweep
(``ops.kg.triple_confidence`` / ``merge_beliefs``) builds the all-time
view — streaming KG construction end-to-end.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col


def frozen_dictionary_map(dictionary: DataFrame) -> Column:
    """map<surface, array<entity>> literal from a (surface, entity)
    dictionary — surfaces re-tokenized with the reference tokenizer
    and space-joined (the batch op's normalization), entities sorted
    for deterministic output order.  Driver-side collect: the
    dictionary is broadcast-scale by this face's contract."""
    norm = dictionary.select(
        F.array_join(tokens_col("surface"), " ").alias("surface"),
        "entity",
    ).distinct()
    by_surface: dict[str, list[str]] = {}
    for r in norm.collect():
        by_surface.setdefault(r.surface, []).append(r.entity)
    pairs = chain.from_iterable(
        (F.lit(s), F.array(*[F.lit(e) for e in sorted(es)]))
        for s, es in sorted(by_surface.items())
    )
    return F.create_map(*pairs)


def mention_spans_col(
    dict_map: Column, max_len: int = 3, text: str = "text"
) -> Column:
    """array<struct<pos, n_toks, surface, entity>>: every
    longest-match gazetteer hit of one turn, computed entirely
    in-row.  At each 1-based start position p the candidate n-grams
    (n ≤ ``max_len``, fitting the turn) look up the frozen map; only
    the longest matching n at that position survives; an ambiguous
    surface emits one struct per entity."""
    toks = tokens_col(text)
    n_tok = F.size(toks)
    starts = F.when(n_tok > 0, F.sequence(F.lit(1), n_tok)).otherwise(
        F.array().cast("array<int>")
    )

    def spans_at(p: Column) -> Column:
        cands = F.filter(
            F.transform(
                F.sequence(F.lit(1), F.lit(max_len)),
                lambda n: F.struct(
                    n.cast("long").alias("n_toks"),
                    F.array_join(F.slice(toks, p, n), " ").alias(
                        "surface"
                    ),
                ),
            ),
            lambda s: ((p - 1) + s["n_toks"] <= n_tok)
            & F.element_at(dict_map, s["surface"]).isNotNull(),
        )
        best = F.array_max(F.transform(cands, lambda s: s["n_toks"]))
        return F.flatten(
            F.transform(
                F.filter(cands, lambda s: s["n_toks"] == best),
                lambda s: F.transform(
                    F.element_at(dict_map, s["surface"]),
                    lambda e: F.struct(
                        (p - 1).cast("long").alias("pos"),
                        s["n_toks"].alias("n_toks"),
                        s["surface"].alias("surface"),
                        e.alias("entity"),
                    ),
                ),
            )
        )

    return F.flatten(F.transform(starts, spans_at))


def stream_mentions(
    stream: DataFrame,
    dictionary: DataFrame,
    max_len: int = 3,
) -> DataFrame:
    """(conv_id, turn_idx, pos, n_toks, surface, entity): the
    streaming mention feed — batch-identical rows to
    :func:`~coies_spark.ops.kg.gazetteer_mentions` over the same
    turns, as one stateless projection (append mode, no state)."""
    dict_map = frozen_dictionary_map(dictionary)
    return stream.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        F.explode(mention_spans_col(dict_map, max_len)).alias("m"),
    ).select(
        "conv_id", "turn_idx", "m.pos", "m.n_toks", "m.surface",
        "m.entity",
    )


def stream_comentions(
    stream: DataFrame,
    dictionary: DataFrame,
    max_len: int = 3,
) -> DataFrame:
    """(conv_id, turn_idx, subj, subj_pos, obj, obj_pos): the
    streaming co-mention evidence feed — every ordered pair of
    DISTINCT gazetteer entities co-mentioned in one turn,
    batch-identical to ``ops.kg._comention_pairs`` over the same
    turns.  The pairing, like the spotting, runs entirely in-row:
    all of a turn's mentions live in one span array, so the pair
    fan-out is a nested array transform — no self-join, no state,
    append mode.  Scored (e.g. a constant detection confidence or a
    position-decay) and stamped with the turn's event time, these
    rows are exactly what :func:`~coies_spark.streaming.kg.
    stream_triple_confidence` folds into windowed beliefs — streaming
    KG construction end-to-end."""
    dict_map = frozen_dictionary_map(dictionary)
    spans = mention_spans_col(dict_map, max_len)

    def pairs_of(ms: Column) -> Column:
        return F.flatten(
            F.transform(
                ms,
                lambda a: F.transform(
                    F.filter(ms, lambda b: b["entity"] != a["entity"]),
                    lambda b: F.struct(
                        a["entity"].alias("subj"),
                        a["pos"].alias("subj_pos"),
                        b["entity"].alias("obj"),
                        b["pos"].alias("obj_pos"),
                    ),
                ),
            )
        )

    return stream.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        F.explode(pairs_of(spans)).alias("p"),
    ).select(
        "conv_id", "turn_idx", "p.subj", "p.subj_pos", "p.obj",
        "p.obj_pos",
    )


def stream_assertion_clauses(
    stream: DataFrame,
    neg_cues=None,
    hedge_cues=None,
) -> DataFrame:
    """(conv_id, turn_idx, clause_idx, clause, negated, hedged,
    assertive): the streaming assertion-scoping feed — unlike the
    gazetteer (whose batch longest-match window is NOT stream-legal
    and needed the in-row rebuild above), the batch operator
    :func:`~coies_spark.ops.kg.assertion_clauses` is ALREADY a
    stateless projection (split + posexplode + sibling rlikes), so
    the streaming face certifies and re-exports that contract:
    append mode, no watermark, no state, batch-identical rows
    (pinned in tests/test_streaming.py)."""
    from ..ops.kg import HEDGE_CUES, NEG_CUES, assertion_clauses

    return assertion_clauses(
        stream,
        NEG_CUES if neg_cues is None else neg_cues,
        HEDGE_CUES if hedge_cues is None else hedge_cues,
    )


def stream_asserted_triples(
    stream: DataFrame,
    rules,
    neg_cues=None,
    hedge_cues=None,
) -> DataFrame:
    """(conv_id, turn_idx, pred, subj, obj): the streaming
    assertion-GATED pattern extraction feed —
    :func:`~coies_spark.ops.kg.pattern_triples_asserted` applied to
    the turn stream (every stage is a stateless projection: clause
    split, cue flags, filter, sibling regexp extracts, one explode).
    Append mode, batch-identical rows.  Composes upstream of
    :func:`~coies_spark.streaming.kg.stream_triple_confidence` the
    same way the co-mention feed does — the streaming KG now
    ingests PATTERN facts with negation/hypothetical scoping applied
    at the ingest boundary, before anything reaches the belief
    fold."""
    from ..ops.kg import HEDGE_CUES, NEG_CUES, pattern_triples_asserted

    return pattern_triples_asserted(
        stream,
        rules,
        NEG_CUES if neg_cues is None else neg_cues,
        HEDGE_CUES if hedge_cues is None else hedge_cues,
    )
