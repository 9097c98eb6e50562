"""Sliding windows and n-gram families over token streams.

* ``windows``           — utilities.py:126-129 (stride-1 n-grams)
* ``phased_ngrams``     — utilities.py:134-139 (all phase offsets of
                          non-overlapping n-chunks; == the distinct set
                          of stride-1 windows, in phase-major order)
* ``gram_family``       — example_parsing.py:183-201 (sizes m..n)
* ``skip_windows``      — aaer_corpus.py:216-228 (every k-th window)

All return (start_position, tuple_of_tokens) so positional containment
joins stay possible downstream (SURVEY.md P8/J2).
"""

from __future__ import annotations

from typing import Iterator, Sequence


def windows(tokens: Sequence[str], n: int) -> list[tuple[int, tuple[str, ...]]]:
    """Stride-1 windows of size n: positions 0..len-n."""
    return [(i, tuple(tokens[i : i + n])) for i in range(len(tokens) - n + 1)]


def phased_ngrams(tokens: Sequence[str], n: int) -> list[tuple[int, tuple[str, ...]]]:
    """Non-overlapping n-chunks at every phase offset 0..n-1.

    Yields the same *set* of grams as ``windows`` restricted to complete
    chunks, but in phase-major order (all offset-0 chunks, then offset-1,
    ...), matching the reference's corpus/gram enumeration order.
    """
    out: list[tuple[int, tuple[str, ...]]] = []
    for phase in range(n):
        for start in range(phase, len(tokens) - n + 1, n):
            out.append((start, tuple(tokens[start : start + n])))
    return out


def gram_family(
    tokens: Sequence[str], m: int = 1, n: int = 5
) -> list[tuple[int, tuple[str, ...]]]:
    """All phased n-grams for sizes m..n concatenated (candidate mention
    grams; default 1..5 per oneshot_test.py:125)."""
    assert n >= m > 0
    out: list[tuple[int, tuple[str, ...]]] = []
    for size in range(m, n + 1):
        out.extend(phased_ngrams(tokens, size))
    return out


def skip_windows(
    tokens: Sequence[str], n: int, k: int
) -> Iterator[tuple[int, tuple[str, ...]]]:
    """Every k-th stride-1 window (corpus subsampling).

    Shape note vs AAERParserNGramsSkip (aaer_corpus.py:216-228): the
    reference flattens each selected window's tokens into ONE list
    (``ngrams += ng[i]``); this yields (start, window) pairs instead —
    flatten downstream if the reference's flat-token-stream shape is
    needed."""
    for i in range(0, len(tokens) - n + 1, k):
        yield i, tuple(tokens[i : i + n])
