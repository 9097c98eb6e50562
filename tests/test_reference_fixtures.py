"""Parity on COIES's OWN fixtures: the real example document
(text_files/example/34-53330.txt) and real tagged test files with their
raw aaer/ twins (file_tools.py:103-105 pairing).

These tests read the reference corpus from /root/reference (data only —
no reference code is imported) and assert:
* tag parsing reproduces the reference's documented entity dict for the
  example (example_parsing.py semantics),
* the vectorized Spark kernel emits EXACTLY what the reference-faithful
  oracle emits on real documents (P/R = 1.0 kernel↔oracle parity at the
  flagship context_size=100),
* tokenizer invariants hold on real messy SEC text.
"""

from __future__ import annotations

import os

import pytest

from coies_spark.core import textproc
from coies_spark.core.metrics import triple_prf
from coies_spark.core.oneshot import (
    ExtractionConfig,
    build_example_artifacts,
    detect_doc,
    emissions_to_triples,
    oracle_extract_doc,
)

REF = "/root/reference/text_files"
EXAMPLE = f"{REF}/example/34-53330.txt"
TEST_FILES = ["33-10053", "33-8052", "33-8259", "33-8338", "33-8755"]

pytestmark = pytest.mark.skipif(
    not os.path.exists(EXAMPLE), reason="reference corpus not mounted"
)


def read_ref(path: str) -> str:
    with open(path, "rb") as f:
        return textproc.ascii_clean(f.read())


@pytest.fixture(scope="module")
def example_text() -> str:
    return read_ref(EXAMPLE)


@pytest.fixture(scope="module")
def real_artifacts(example_text):
    # flagship context_size=100 (oneshot_test.py:16-21); hash embeddings
    # stand in for gensim vectors (FIXTURES.md §4 frozen-vector parity).
    # Untrained hash vectors carry no semantics, so absolute cosines sit
    # far below the flagship thresholds (0.9/0.6 emit nothing); parity
    # of the MACHINERY is what this fixture asserts, so thresholds are
    # lowered until both engines emit.  Extraction QUALITY comes from
    # plugging trained vectors into the same slot (MappedEmbedding,
    # ops/embedding_train — M1/M6).
    # Phrase table trained on a deterministic sample of the aaer corpus
    # (reference trains on the full dir, aaer_corpus.py:35-43).
    corpus_files = sorted(os.listdir(f"{REF}/aaer"))[:60]
    sentences = []
    for fn in corpus_files:
        sentences.extend(textproc.sentence_tokens(read_ref(f"{REF}/aaer/{fn}")))
    cfg = ExtractionConfig(
        context_size=100, dim=64, context_threshold=0.3, word_threshold=0.2
    )
    return build_example_artifacts(example_text, sentences, cfg)


def test_example_entity_dict_matches_reference(example_text):
    """The documented parse of 34-53330 (SURVEY §1.1, example_parsing
    semantics): 1 comp, 2 dates, 2 items with these exact surfaces."""
    tagged = textproc.tagged_tokens_from_text(example_text)
    assert textproc.entity_dict(tagged) == {
        "comp": [["esafetyworld", "inc"]],
        "date": [["2000"], ["2001"]],
        "item": [["revenues"], ["profits"]],
    }


def test_real_tagged_files_parse_clean():
    known = {"comp", "date", "item", "items", "itme"}  # incl. corpus typos
    for stem in TEST_FILES:
        tagged = textproc.tagged_tokens_from_text(
            read_ref(f"{REF}/test/{stem}.txt")
        )
        spans = textproc.entity_spans(tagged)
        assert spans, stem
        assert {t for t, _, _, _ in spans} <= known, stem
        assert all(toks for _, toks, _, _ in spans), stem


def test_tokenizer_invariants_on_real_text(example_text):
    import string

    toks = textproc.tokenize(example_text.lower())
    assert len(toks) > 1000
    bad = set(string.punctuation) | set(" \t\n\r\v\f\0")
    assert not any(set(t) & bad for t in toks)
    assert all(t == t.strip() and t != "" for t in toks)


def test_kernel_matches_oracle_on_real_documents(real_artifacts):
    """Spark kernel ≡ reference-faithful oracle on real SEC filings at
    the flagship window size — the P/R≥0.95 gate at 1.0."""
    got, want = [], []
    for stem in TEST_FILES:
        raw = read_ref(f"{REF}/aaer/{stem}.txt")
        ctx = read_ref(f"{REF}/test/{stem}.txt")
        want += emissions_to_triples(
            stem, oracle_extract_doc(raw, ctx, real_artifacts)
        )
        got += emissions_to_triples(stem, detect_doc(raw, ctx, real_artifacts))
    m = triple_prf(sorted(set(got)), sorted(set(want)))
    assert m["n_gold"] > 0
    assert m["precision"] >= 0.95 and m["recall"] >= 0.95, m
