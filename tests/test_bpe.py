"""Distributed BPE tokenizer induction (ops.bpe): pure-Python greedy
replica parity, the owned-flanks replace trick on adversarial runs,
determinism across partitionings, exhaustion, and segment/trainer
state agreement."""

import pytest

from coies_spark.core.textproc import tokenize
from coies_spark.ops import bpe


# ---------------------------------------------------------------------------
# Pure-Python classic-greedy reference (Sennrich et al. 2016 semantics)
# ---------------------------------------------------------------------------


def _greedy_apply(syms, l, r):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _replica(texts, n_merges):
    """Classic greedy BPE trainer over the same tokenizer: returns
    (merge list [(rank, lhs, rhs, merged)], final word states)."""
    wc = {}
    for t in texts:
        for w in tokenize(t.lower()):
            wc[w] = wc.get(w, 0) + 1
    states = {w: list(w) for w in wc}
    merges = []
    for rank in range(n_merges):
        pc = {}
        for w, syms in states.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + wc[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, best[0], best[1], best[0] + best[1]))
        states = {w: _greedy_apply(s, *best) for w, s in states.items()}
    return merges, states, wc


def _docs(spark, texts, n_parts=None):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    return df.repartition(n_parts) if n_parts else df


CORPUS = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest",
    "the banana bandana and the cabana",
    "aaaaa aaaaaa aaaaaaa",  # repeated-symbol runs: the greedy trap
    "mississippi mississippi miss",
    "",  # empty doc survives tokenize
]


def test_merges_match_greedy_replica(spark):
    exp_merges, _, _ = _replica(CORPUS, 10)
    got = [
        (r.rank, r.lhs, r.rhs, r.merged)
        for r in bpe.bpe_merges(_docs(spark, CORPUS), 10)
        .orderBy("rank")
        .collect()
    ]
    assert got == exp_merges


def test_repeated_symbol_runs_exact_greedy(spark):
    """Runs of 5+ equal symbols are where a shared-space replace
    diverges from greedy; the owned-flanks encoding must not."""
    texts = ["aaaaa", "aaaaaa aaaaaa", "aaaaaaa"]
    exp_merges, exp_states, _ = _replica(texts, 4)
    got = [
        (r.rank, r.lhs, r.rhs, r.merged)
        for r in bpe.bpe_merges(_docs(spark, texts), 4)
        .orderBy("rank")
        .collect()
    ]
    assert got == exp_merges
    # and the segmented symbol counts match the greedy states
    merges = [(l, r) for _, l, r, _ in exp_merges]
    seg = {
        r.doc_id: r.n_bpe_symbols
        for r in bpe.bpe_segment(_docs(spark, texts), merges).collect()
    }
    for i, t in enumerate(texts):
        want = sum(len(exp_states[w]) for w in tokenize(t.lower()))
        assert seg[i] == want, (i, t)


def test_merges_deterministic_across_partitionings(spark):
    a = bpe.bpe_merges(_docs(spark, CORPUS, 1), 8).collect()
    b = bpe.bpe_merges(_docs(spark, CORPUS, 7), 8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_exhaustion_emits_short_table(spark):
    # "ab" has exactly one mergeable pair; rounds 2+ emit nothing
    rows = bpe.bpe_merges(_docs(spark, ["ab ab"]), 5).collect()
    assert [(r.rank, r.merged) for r in rows] == [(0, "ab")]


def test_n_merges_guard(spark):
    with pytest.raises(ValueError):
        bpe.bpe_merges(_docs(spark, CORPUS), 0)


def test_segment_matches_replica_and_compression(spark):
    exp_merges, exp_states, _ = _replica(CORPUS, 6)
    merges = [(l, r) for _, l, r, _ in exp_merges]
    out = {
        r.doc_id: r
        for r in bpe.bpe_segment(_docs(spark, CORPUS), merges).collect()
    }
    for i, t in enumerate(CORPUS):
        toks = tokenize(t.lower())
        row = out[i]
        assert row.n_tokens == len(toks)
        want = sum(len(exp_states[w]) for w in toks)
        assert row.n_bpe_symbols == want
        if toks:
            assert row.compression == pytest.approx(
                round(want / len(toks), 6)
            )
        else:
            assert row.compression is None and row.n_bpe_symbols == 0


def test_segment_zero_shuffle_plan(spark):
    exp_merges, _, _ = _replica(CORPUS, 4)
    merges = [(l, r) for _, l, r, _ in exp_merges]
    plan = bpe.bpe_segment(
        _docs(spark, CORPUS), merges
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
