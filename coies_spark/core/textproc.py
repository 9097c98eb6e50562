"""Tokenization and inline-tag parsing with reference parity.

Semantics match ling60/coies (citations are file:line into
/root/reference/):

* ``tokenize``            — common/file_tools.py:66-71 (``text_tokenizer``)
* ``split_sentences``     — common/file_tools.py:74-79
* ``mark_tags``           — text_cleaning/example_parsing.py:12-16
* ``tag_tokens``          — text_cleaning/example_parsing.py:57-92
                            (``tokens_to_tagged_tokens2``)
* ``entity_spans``        — text_cleaning/example_parsing.py:121-149
* ``ascii_clean``         — common/file_tools.py:41-51

Implementation is original; only the *behavior* is replicated.
"""

from __future__ import annotations

import re
import string
from typing import Optional

# Entity tag grammar of the tagged corpora: ``<comp.>eSafetyWorld, Inc.</>``
# (constants.py:35-47).  A start mark is ``<{type}.>``; the end mark ``</>``.
START_MARK = ".>"
END_MARK = "</>"
# Sentinel strings injected before tokenization so the punctuation-splitting
# tokenizer keeps tag boundaries attached to their neighbouring tokens.
# (constants.py:42-46 uses a project-unique prefix; ours differs by design —
# any punctuation-free unique string works.)
_START_SENT = "XqzTagStartqzX"
_END_SENT = "XqzTagEndqzX"

IN_TAG = "in"
END_TAG = "end"

# Tokenizer delimiters: every ASCII whitespace control + all of
# string.punctuation (file_tools.py:67).
_DELIMS = [" ", "\n", "\r", "\t", "\v", "\f", "\0"] + list(string.punctuation)
_TOKEN_SPLIT_RE = re.compile("|".join(re.escape(d) for d in _DELIMS))
# The same splitter as a single regex character class — used to build the
# equivalent JVM-side ``F.split`` expression (functions/tokenize.py).
TOKEN_SPLIT_CHARCLASS = "[\\s\\x00!-/:-@\\[-`{-~]"

_SENT_SPLIT_RE = re.compile("|".join(re.escape(d) for d in [".", "\n", "\r"]))


def ascii_clean(raw: bytes | str) -> str:
    """Decode bytes as ascii-ignoring-errors (file_tools.py:41-51)."""
    if isinstance(raw, str):
        raw = raw.encode("ascii", errors="ignore")
    return raw.decode("ascii", errors="ignore")


def tokenize(text: str) -> list[str]:
    """Split on whitespace + ASCII punctuation, strip, drop empties.

    Parity: file_tools.py:66-71.  Case is NOT changed here — callers
    lowercase the raw text first (example_parsing.py:99,105,111).
    """
    parts = _TOKEN_SPLIT_RE.split(text)
    return [p.strip() for p in parts if p.strip() != ""]


def split_sentences(text: str) -> list[str]:
    """Split on '.', newline, carriage return (file_tools.py:74-79)."""
    parts = _SENT_SPLIT_RE.split(text)
    return [p.strip() for p in parts if p.strip() != ""]


def sentence_tokens(text: str) -> list[list[str]]:
    """Lowercase, sentence-split, then tokenize each sentence
    (example_parsing.py:104-107)."""
    return [tokenize(s) for s in split_sentences(text.lower())]


def mark_tags(text: str) -> str:
    """Replace tag marks with punctuation-free sentinels so they survive
    tokenization (example_parsing.py:12-16)."""
    return text.replace(START_MARK, _START_SENT).replace(END_MARK, _END_SENT)


def tag_tokens(tokens: list[str]) -> list[tuple[str, Optional[str]]]:
    """Assemble (token, tag) pairs from sentinel-marked tokens.

    Tags: entity type on the first token of a span, ``in`` on interior
    tokens, ``end`` on the last (single-token spans carry just the type).
    Parity: example_parsing.py:57-92 (``tokens_to_tagged_tokens2``),
    including the quirk where an empty end-mark token promotes the
    previous ``in`` tag to ``end``.
    """
    out: list[tuple[str, Optional[str]]] = []
    current: Optional[str] = None
    for tok in tokens:
        if _START_SENT in tok:
            # reference split()[0]/[-1] semantics (example_parsing.py:62-64):
            # with TWO start marks in one token, the middle segment is
            # DROPPED and the tail becomes the token — partition() would
            # leak the second sentinel into the emitted token stream
            parts = tok.split(_START_SENT)
            current = parts[0]
            rest = parts[-1]
            if _END_SENT in rest:
                rest = rest.split(_END_SENT)[0]
            rest = rest.strip()
            if rest:
                out.append((rest, current))
            if _END_SENT in tok:
                current = None
        elif _END_SENT in tok:
            body = tok.split(_END_SENT)[0].strip()
            current = None
            if body:
                out.append((body, END_TAG))
            elif out and out[-1][1] == IN_TAG:
                out[-1] = (out[-1][0], END_TAG)
        elif current is not None:
            if not out or out[-1][1] is None:
                out.append((tok, current))
            else:
                out.append((tok, IN_TAG))
        else:
            out.append((tok, None))
    return out


def tagged_tokens_from_text(text: str) -> list[tuple[str, Optional[str]]]:
    """lowercase → mark tags → tokenize → assemble
    (example_parsing.py:110-116)."""
    return tag_tokens(tokenize(mark_tags(text.lower())))


def entity_spans(
    tagged: list[tuple[str, Optional[str]]],
) -> list[tuple[str, list[str], int, int]]:
    """Extract entity spans as (type, mention_tokens, start, end_incl).

    Positions index the tagged-token stream.  Span grouping parity:
    example_parsing.py:121-135 — a non-``in``/``end`` tag starts a new
    span of that type; ``in``/``end`` extend the currently open one.
    """
    spans: list[tuple[str, list[str], int, int]] = []
    current_type: Optional[str] = None
    for pos, (tok, tag) in enumerate(tagged):
        if tag is None:
            continue
        if tag not in (IN_TAG, END_TAG):
            current_type = tag
            spans.append((current_type, [tok], pos, pos))
        elif spans:
            typ, toks, start, _ = spans[-1]
            toks.append(tok)
            spans[-1] = (typ, toks, start, pos)
    return spans


def entity_dict(
    tagged: list[tuple[str, Optional[str]]],
) -> dict[str, list[list[str]]]:
    """{entity_type: [mention_tokens, ...]} in document order
    (example_parsing.py:140-149)."""
    d: dict[str, list[list[str]]] = {}
    for typ, toks, _, _ in entity_spans(tagged):
        d.setdefault(typ, []).append(toks)
    return d


def strip_tags_text(text: str) -> str:
    """Remove tag marks from raw text, producing the 'source'/raw twin of
    a tagged document (the reference keeps separate raw files —
    file_tools.py:103-105; we synthesize the raw twin by stripping)."""
    return re.sub(r"<[a-zA-Z]+\.>", "", text).replace(END_MARK, "")


def join_delim(tokens) -> str:
    """Join tokens with the project delimiter for containment checks
    (constants.py:43, utilities.py:142-143)."""
    return ":".join(tokens)


def is_contiguous_sublist(inner, outer) -> bool:
    """Contiguous-sublist test via delimiter-joined string containment,
    including the trailing-sentinel quirk (utilities.py:156-165): a
    trailing empty element is appended when the last element is truthy,
    making the match suffix-boundary-exact but prefix-substring-loose.
    """
    inner = list(inner)
    outer = list(outer)
    if not inner or not outer:
        return False
    if inner[-1]:
        inner = inner + [""]
    if outer[-1]:
        outer = outer + [""]
    return join_delim(inner) in join_delim(outer)
