"""Deterministic synthetic transcript corpus with COIES-style tagged gold.

Mirrors the corpus roles of the reference's evaluation data
(constants.py:7-13, SURVEY.md §1.3): one tagged *example* conversation,
a partially-tagged *test* subset whose tagged conversations have
untagged raw twins (file_tools.py:103-105 pairing), and an untagged
*corpus* remainder.  Gold mentions are marked inline with
``<comp.>…</>`` / ``<date.>…</>`` / ``<item.>…</>`` tags
(constants.py:35-47).

Everything is keyed off an integer seed → byte-identical output across
runs and machines.  A ``hot_mention`` appears in a configurable
fraction of conversations to exercise skew handling (salted joins /
AQE) downstream.

Output shape (BASELINE.json ``input_hint``):
    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from ..core import textproc

ROLES = ["user", "assistant", "tool"]

_FILLER = (
    "the commission filed findings regarding improper accounting practices "
    "during the relevant period respondent consented to entry of an order "
    "without admitting or denying the alleged conduct public interest "
    "proceedings were instituted pursuant to applicable rules of practice "
    "staff reviewed quarterly filings and annual reports for material "
    "misstatements auditors examined supporting schedules and workpapers "
    "management represented that internal controls operated effectively "
    "counsel submitted an offer of settlement which was accepted"
).split()

# Two-token company surfaces: the flagship's candidate grams come from
# bigram phrase tokens (≤2 words), matching the reference's own example
# mention shape ('esafetyworld inc').
COMP_POOL = [
    "acme holdings", "zenith industrial", "bluewater systems",
    "orchard capital", "helix biolabs", "summit retail",
    "northgate energy", "pinnacle software",
]
DATE_POOL = ["1998", "1999", "2000", "2001", "2002", "2003", "2004", "2005"]
ITEM_POOL = [
    "revenues", "profits", "net income", "operating expenses",
    "accounts receivable", "gross margin", "cash flow", "reserves",
]

# Sentence frames shared between the example and test documents — the
# one-shot method finds mentions by context similarity, so test contexts
# deliberately resemble the example's.  The words immediately adjacent
# to the mention slot ({pre}/{post}) are drawn from 8-way pools so that
# mention-adjacent bigrams stay below the phrase min_count and are never
# collocation-merged into the mention (which would change the candidate
# gram, exactly as over-aggressive gensim Phrases would in the
# reference).
_FRAMES = {
    "comp": ("the respondent {pre} {m} {post} as chairman president and "
             "chief executive officer at relevant times"),
    "date": ("the complaint alleged that {pre} {m} {post} the company "
             "violated the federal securities laws repeatedly"),
    "item": ("public filings contained false statements about {pre} {m} "
             "{post} consulting contracts and related arrangements"),
}
_PRE = {
    "comp": ["founded", "established", "controlled", "managed",
             "operated", "directed", "chaired", "led"],
    "date": ["during", "throughout", "across", "in",
             "over", "spanning", "within", "near"],
    "item": ["reported", "stated", "disclosed", "recorded",
             "booked", "claimed", "listed", "published"],
}
_POST = {
    "comp": ["serving", "acting", "presiding", "continuing",
             "remaining", "operating", "working", "persisting"],
    "date": ["when", "while", "whereupon", "thereafter",
             "wherein", "whereby", "accordingly", "moreover"],
    "item": ["from", "under", "regarding", "concerning",
             "involving", "per", "covering", "reflecting"],
}


def _tag(pred: str, mention: str) -> str:
    return f"<{pred}.>{mention}</>"


@dataclass
class SynthDoc:
    conv_id: str
    tagged_turns: list[str]
    gold: list[tuple[str, str]] = field(default_factory=list)  # (pred, mention)

    @property
    def raw_turns(self) -> list[str]:
        return [textproc.strip_tags_text(t) for t in self.tagged_turns]

    @property
    def tagged_text(self) -> str:
        return "\n".join(self.tagged_turns)

    @property
    def raw_text(self) -> str:
        return "\n".join(self.raw_turns)


@dataclass
class SynthCorpus:
    example: SynthDoc
    test_docs: list[SynthDoc]        # tagged subset of the test split
    plain_docs: list[SynthDoc]       # untagged test + corpus remainder
    seed: int

    @property
    def all_docs(self) -> list[SynthDoc]:
        return [self.example] + self.test_docs + self.plain_docs

    def gold_triples(self) -> list[tuple[str, str, str]]:
        """(subj, pred, obj) from inline tags — the P/R fixture target."""
        out = []
        for doc in self.test_docs:
            tagged = textproc.tagged_tokens_from_text(doc.tagged_text)
            for pred, toks in (
                (p, t) for p, t, _, _ in textproc.entity_spans(tagged)
            ):
                out.append((doc.conv_id, pred, " ".join(toks)))
        return out


def _filler_sentence(rng: np.random.RandomState, lo: int = 8, hi: int = 14) -> str:
    n = int(rng.randint(lo, hi))
    return " ".join(_FILLER[i] for i in rng.randint(0, len(_FILLER), n))


def _mention_sentence(
    rng: np.random.RandomState, pred: str, mention: str, tag: bool
) -> str:
    pre = _PRE[pred][int(rng.randint(0, len(_PRE[pred])))]
    post = _POST[pred][int(rng.randint(0, len(_POST[pred])))]
    return _FRAMES[pred].format(
        m=_tag(pred, mention) if tag else mention, pre=pre, post=post
    )


def make_example() -> SynthDoc:
    """The one-shot example conversation: 1 comp, 2 dates, 2 items —
    modeled on text_files/example/34-53330.txt (1 comp, 2 date, 2 item)."""
    rng = np.random.RandomState(7)
    turns = [
        "administrative proceedings before the securities commission",
        _filler_sentence(rng),
        _mention_sentence(rng, "comp", COMP_POOL[0], tag=True),
        _filler_sentence(rng),
        _mention_sentence(rng, "date", DATE_POOL[2], tag=True),
        _mention_sentence(rng, "date", DATE_POOL[3], tag=True),
        _filler_sentence(rng),
        _mention_sentence(rng, "item", ITEM_POOL[0], tag=True),
        _mention_sentence(rng, "item", ITEM_POOL[1], tag=True),
        _filler_sentence(rng),
    ]
    return SynthDoc(conv_id="conv-example", tagged_turns=turns,
                    gold=[("comp", COMP_POOL[0]), ("date", DATE_POOL[2]),
                          ("date", DATE_POOL[3]), ("item", ITEM_POOL[0]),
                          ("item", ITEM_POOL[1])])


def make_corpus(
    n_test: int = 20,
    n_plain: int = 20,
    tagged_frac: float = 0.7,
    seed: int = 42,
    hot_mention_frac: float = 0.3,
    same_surface_frac: float = 0.7,
) -> SynthCorpus:
    """Deterministic corpus.

    ``same_surface_frac`` of tagged docs reuse the example's mention
    surfaces (findable by one-shot similarity); the rest draw other pool
    entries.  ``hot_mention_frac`` of all docs additionally mention
    COMP_POOL[0] — the skew knob for salted joins/aggregations.
    """
    rng = np.random.RandomState(seed)
    example = make_example()
    test_docs: list[SynthDoc] = []
    plain_docs: list[SynthDoc] = []

    for i in range(n_test + n_plain):
        conv_id = f"conv-{i:06d}"
        is_test = i < n_test
        tagged = is_test and (rng.rand() < tagged_frac)
        turns: list[str] = [_filler_sentence(rng)]
        gold: list[tuple[str, str]] = []
        if tagged:
            same = rng.rand() < same_surface_frac
            picks = [
                ("comp", COMP_POOL[0] if same else COMP_POOL[rng.randint(1, len(COMP_POOL))]),
                # exclude the example's own dates (indices 2 and 3) so
                # the different-surface branch really draws different
                # surfaces, as the docstring promises for every type
                ("date", DATE_POOL[2] if same else DATE_POOL[
                    [0, 1, 4, 5, 6, 7][rng.randint(0, 6)]
                ]),
                ("item", ITEM_POOL[0] if same else ITEM_POOL[rng.randint(2, len(ITEM_POOL))]),
            ]
            for pred, mention in picks:
                turns.append(_filler_sentence(rng))
                turns.append(_mention_sentence(rng, pred, mention, tag=True))
                gold.append((pred, mention))
        for _ in range(int(rng.randint(3, 7))):
            turns.append(_filler_sentence(rng))
        if rng.rand() < hot_mention_frac:
            turns.append(
                _mention_sentence(rng, "comp", COMP_POOL[0], tag=False)
            )
        doc = SynthDoc(conv_id=conv_id, tagged_turns=turns, gold=gold)
        (test_docs if tagged else plain_docs).append(doc)

    return SynthCorpus(example=example, test_docs=test_docs,
                       plain_docs=plain_docs, seed=seed)


def transcripts_frame(
    docs: list[SynthDoc], use_raw: bool = False, base_ts: str = "2026-01-01"
) -> pd.DataFrame:
    """Rows (conv_id, turn_idx, role, text, tool, ts) for a doc list."""
    base = dt.datetime.fromisoformat(base_ts)
    rows = []
    for doc in docs:
        turns = doc.raw_turns if use_raw else doc.tagged_turns
        for idx, text in enumerate(turns):
            rows.append(
                {
                    "conv_id": doc.conv_id,
                    "turn_idx": np.int32(idx),
                    "role": ROLES[idx % 3],
                    "text": text,
                    "tool": "search" if idx % 7 == 3 else None,
                    "ts": base + dt.timedelta(minutes=idx),
                }
            )
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def corpus_sentences(corpus: SynthCorpus) -> list[list[str]]:
    """Sentence token lists over raw text of every doc — the phrase/
    embedding training corpus (reference trains on the full AAER dir,
    aaer_corpus.py:35-43)."""
    out: list[list[str]] = []
    for doc in corpus.all_docs:
        out.extend(textproc.sentence_tokens(doc.raw_text))
    return out
