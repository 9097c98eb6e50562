"""Property-based tests (hypothesis): the invariants SURVEY §5 calls
out, plus randomized kernel↔oracle equivalence — the strongest guard on
the membership-quirk and tie-breaking semantics."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from coies_spark.core import textproc
from coies_spark.core.oneshot import (
    ExtractionConfig,
    build_example_artifacts,
    detect_doc,
    emissions_to_triples,
    oracle_extract_doc,
)
from coies_spark.core.ranking import rank_desc, top_group

# --- small strategies ------------------------------------------------------

tokens_st = st.lists(
    st.text(alphabet="ab3", min_size=1, max_size=3), min_size=1, max_size=12
)


# --- is_contiguous_sublist ≡ positional-with-suffix-head model -------------

def quirk_model(inner: list[str], outer: list[str]) -> bool:
    """Independent positional model of utilities.py:156-165: inner
    matches at i iff outer[i] ENDS WITH inner[0] and outer[i+1:] starts
    with inner[1:] exactly."""
    if not inner or not outer:
        return False
    k = len(inner)
    for i in range(len(outer)):
        if i + k > len(outer):
            break
        if not outer[i].endswith(inner[0]):
            continue
        if all(outer[i + j] == inner[j] for j in range(1, k)):
            return True
    return False


@given(inner=tokens_st, outer=tokens_st)
@settings(max_examples=300, deadline=None)
def test_sublist_quirk_equivalence(inner, outer):
    assert textproc.is_contiguous_sublist(inner, outer) == quirk_model(
        inner, outer
    )


# --- top_group properties ---------------------------------------------------

scores_st = st.lists(
    st.tuples(st.integers(0, 50), st.floats(0, 2, allow_nan=False)),
    min_size=0,
    max_size=30,
)


@given(scored=scores_st, threshold=st.floats(0, 2, allow_nan=False))
@settings(max_examples=300, deadline=None)
def test_top_group_properties(scored, threshold):
    kept = top_group(scored, threshold)
    # reference quirks (utilities.py:66-75): a <=1-item INPUT returns
    # as-is before any filtering, and a falsy threshold (0.0) filters
    # nothing
    if len(scored) <= 1:
        assert kept == list(scored)
        return
    survivors = (
        [kv for kv in scored if kv[1] > threshold] if threshold else list(scored)
    )
    if survivors:
        assert kept, "top_group must keep ≥1 survivor"
    else:
        assert kept == []
    vals = [v for _, v in kept]
    if threshold:
        assert all(v > threshold for v in vals)
    assert vals == sorted(vals, reverse=True)
    if len(survivors) > 1 and kept:
        top_val = max(v for _, v in survivors)
        assert kept[0][1] == top_val


@given(scored=scores_st)
@settings(max_examples=200, deadline=None)
def test_rank_desc_stable(scored):
    ranked = rank_desc(scored)
    assert sorted(ranked, key=lambda kv: -kv[1]) == ranked
    # stability: equal values keep input order
    for v in {val for _, val in scored}:
        assert [k for k, x in ranked if x == v] == [
            k for k, x in scored if x == v
        ]


# --- tokenizer invariants ----------------------------------------------------

text_st = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80
)


@given(a=text_st, b=text_st)
@settings(max_examples=300, deadline=None)
def test_tokenize_concat_invariance(a, b):
    assert textproc.tokenize(a + " " + b) == textproc.tokenize(
        a
    ) + textproc.tokenize(b)


@given(t=text_st)
@settings(max_examples=300, deadline=None)
def test_tokenize_no_delimiters_survive(t):
    import string

    bad = set(string.punctuation) | set(" \t\n\r\v\f\0")
    for tok in textproc.tokenize(t):
        assert tok and not (set(tok) & bad)


# --- tag round-trip -----------------------------------------------------------

word_st = st.text(alphabet="abcdef", min_size=1, max_size=5)


@given(
    pre=st.lists(word_st, max_size=5),
    mention=st.lists(word_st, min_size=1, max_size=3),
    post=st.lists(word_st, max_size=5),
    typ=st.sampled_from(["comp", "date", "item"]),
)
@settings(max_examples=200, deadline=None)
def test_tag_roundtrip(pre, mention, post, typ):
    text = " ".join(pre) + f" <{typ}.>{' '.join(mention)}</> " + " ".join(post)
    tagged = textproc.tagged_tokens_from_text(text)
    d = textproc.entity_dict(tagged)
    assert d == {typ: [mention]}
    # stripping tags yields the same token stream sans markers
    assert [t for t, _ in tagged] == textproc.tokenize(
        textproc.strip_tags_text(text).lower()
    )


# --- randomized kernel ↔ oracle equivalence ----------------------------------

CFG = ExtractionConfig(
    context_size=6, dim=16, context_threshold=0.2, word_threshold=0.1,
    phrase_min_count=2, phrase_threshold=0.5,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "33", "3", "acme", "corp"]
doc_st = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=8),
    min_size=1,
    max_size=5,
)


@pytest.fixture(scope="module")
def rand_artifacts():
    example = (
        "intro words here <comp.>acme corp</> trailing context words "
        "<date.>3</> more filler tokens"
    )
    sentences = [[w] * 3 for w in VOCAB] + [VOCAB, VOCAB[::-1]]
    return build_example_artifacts(example, sentences, CFG)


@given(doc=doc_st)
@settings(max_examples=150, deadline=None)
def test_kernel_equals_oracle_on_random_docs(rand_artifacts, doc):
    text = "\n".join(" ".join(turn) for turn in doc)
    want = set(emissions_to_triples("d", oracle_extract_doc(text, text, rand_artifacts)))
    got = set(emissions_to_triples("d", detect_doc(text, text, rand_artifacts)))
    assert got == want
