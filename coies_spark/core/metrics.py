"""Evaluation metrics: clipped n-gram ROUGE, ROUGE-L, triple-set P/R.

* ``rouge_n`` / ``rouge_1`` — model_testing/rougescore.py:7-61 (clipped
  n-gram overlap, F_alpha with safe division).
* ``lcs_len`` / ``rouge_l`` — model_testing/rougescore.py:77-123 (LCS-
  based F; matches = Σ lcs(model, peer), recall_total = Σ len(model),
  precision_total = len(models)·len(peer)).  ``lcs_len`` is the
  Allison-Dix bit-vector algorithm (one big-int op per peer token)
  rather than the reference's rolling-row DP — same value, ~60× faster
  on 100-token documents.
* ``mention_score``         — oneshot_test.py:105-120 (``score_by_rouge``):
  flatten gold mentions of the type into one token list; full credit when
  neither gold nor prediction has anything.
* ``triple_prf``            — precision/recall/F1 over exact (subj, pred,
  obj) triple sets — the BASELINE.json gate.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable, Sequence


def _ngram_counts(tokens: Sequence[str], n: int) -> Counter:
    return Counter(
        tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
    )


def _f_alpha(matches: float, recall_total: float, precision_total: float, alpha: float) -> float:
    r = matches / recall_total if recall_total > 0 else 0.0
    p = matches / precision_total if precision_total > 0 else 0.0
    denom = (1.0 - alpha) * p + alpha * r
    return (p * r) / denom if denom > 0.0 else 0.0


def rouge_n(
    peer: Sequence[str], models: Sequence[Sequence[str]], n: int, alpha: float
) -> float:
    """Clipped n-gram overlap F-score of peer vs one or more models."""
    peer_counts = _ngram_counts(peer, n)
    matches = 0
    recall_total = 0
    for model in models:
        mc = _ngram_counts(model, n)
        matches += sum(min(c, mc[g]) for g, c in peer_counts.items())
        recall_total += max(len(model) - n + 1, 0)
    precision_total = len(models) * max(len(peer) - n + 1, 0)
    return _f_alpha(matches, recall_total, precision_total, alpha)


def rouge_1(peer: Sequence[str], models: Sequence[Sequence[str]], alpha: float = 0.5) -> float:
    return rouge_n(peer, models, 1, alpha)


def lcs_len(a: Sequence, b: Sequence) -> int:
    """Longest-common-subsequence length via the Allison-Dix bit-vector
    recurrence: the DP row lives in one Python big int, updated with
    ``V = (V + (V&M)) | (V - (V&M))`` per symbol (U = V&M ⊆ V, so the
    subtraction is borrow-free).  O(len(a) · len(b)/64) word ops."""
    if len(a) < len(b):  # fewer bits → smaller ints
        a, b = b, a
    m = len(b)
    if m == 0:
        return 0
    match: dict = {}
    for j, y in enumerate(b):
        match[y] = match.get(y, 0) | (1 << j)
    full = (1 << m) - 1
    v = full
    for x in a:
        u = v & match.get(x, 0)
        v = ((v + u) | (v - u)) & full
    return m - bin(v).count("1")


def rouge_l(
    peer: Sequence[str], models: Sequence[Sequence[str]], alpha: float = 0.5
) -> float:
    """ROUGE-L F of peer vs one or more models (rougescore.py:112-123)."""
    matches = 0
    recall_total = 0
    for model in models:
        matches += lcs_len(model, peer)
        recall_total += len(model)
    return _f_alpha(matches, recall_total, len(models) * len(peer), alpha)


def mention_score(
    found_grams: Iterable[Sequence[str]] | None,
    gold_by_type: dict[str, list[list[str]]],
    entity_type: str,
    alpha: float = 0.5,
) -> tuple[float, int]:
    """(score, count) for one example mention vs a doc's gold entities."""
    # materialize: a generator would be truthy even when empty, breaking
    # the absent-type full-credit branch below
    if found_grams is not None:
        found_grams = list(found_grams)
    if entity_type in gold_by_type:
        answer = [
            [tok for mention in gold_by_type[entity_type] for tok in mention]
        ]
        peer = (
            []
            if found_grams is None
            else [tok for gram in found_grams for tok in gram]
        )
        return rouge_1(peer, answer, alpha), 1
    if not found_grams:
        return 1.0, 1
    return 0.0, 1


def triple_prf(
    predicted: Iterable[tuple[str, str, str]],
    gold: Iterable[tuple[str, str, str]],
) -> dict[str, float]:
    """Exact-match precision/recall/F1 over (subj, pred, obj) sets."""
    p_set, g_set = set(predicted), set(gold)
    tp = len(p_set & g_set)
    precision = tp / len(p_set) if p_set else 0.0
    recall = tp / len(g_set) if g_set else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {"precision": precision, "recall": recall, "f1": f1, "tp": tp,
            "n_pred": len(p_set), "n_gold": len(g_set)}
