"""Top-k and adaptive top-group ranking (reference parity).

* ``rank_desc``     — utilities.py:35-44 (``most_common_items`` /
                      ``similar_by_vector``): stable sort by value desc,
                      ties keep insertion order, optional top-n cut.
* ``top_group``     — utilities.py:64-82 (``get_top_group``): threshold
                      filter then an adaptive cluster cut — keep the
                      prefix while each consecutive gap is < the average
                      gap ((max-min)/(n-1)).  This decides which grams
                      are emitted, so the semantics (strict ``>``
                      threshold, strict ``<`` gap test, singleton
                      passthrough) must hold exactly.
"""

from __future__ import annotations

from typing import Optional, Sequence, TypeVar

K = TypeVar("K")


def rank_desc(
    items: Sequence[tuple[K, float]], topn: Optional[int] = None
) -> list[tuple[K, float]]:
    """Stable descending sort by value; ties keep input order; cut at topn."""
    ranked = sorted(items, key=lambda kv: kv[1], reverse=True)
    return ranked if topn is None else ranked[:topn]


def top_group(
    scored: Sequence[tuple[K, float]],
    threshold: Optional[float] = None,
) -> list[tuple[K, float]]:
    """Adaptive top-cluster cut over (item, score) pairs.

    Reference quirks replicated exactly (utilities.py:66-75):

    1. A <= 1-item INPUT returns as-is — before any filtering, so a
       single item below threshold still survives.
    2. The threshold filter fires only when the threshold is TRUTHY
       (``if distance_threshold:``) — threshold=0.0 means no filter,
       not "drop scores <= 0".  Survivors keep scores > threshold
       (strict ``>``).
    3. With <= 1 survivor, return them as-is; else sort descending;
       avg_gap = (max - min) / (n - 1); walk the sorted list keeping
       items while the gap to the previous kept item is strictly <
       avg_gap; stop at the first gap >= avg_gap.

    The gaps sum to avg_gap * (n - 1), so some gap >= avg_gap always
    exists (or all gaps are 0, failing the strict ``<`` immediately) —
    the walk always terminates with a non-empty prefix.
    """
    pool = list(scored)
    if len(pool) <= 1:
        return pool
    if threshold:
        pool = [kv for kv in pool if kv[1] > threshold]
    if len(pool) <= 1:
        return pool
    pool.sort(key=lambda kv: kv[1], reverse=True)
    avg_gap = (pool[0][1] - pool[-1][1]) / (len(pool) - 1)
    kept = [pool[0]]
    for nxt in pool[1:]:
        if kept[-1][1] - nxt[1] < avg_gap:
            kept.append(nxt)
        else:
            break
    return kept
