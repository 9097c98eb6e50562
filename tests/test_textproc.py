"""Tokenizer / tag-parsing parity unit tests (SURVEY.md §5 vignettes)."""

import pytest

from coies_spark.core import textproc as tp


class TestTokenize:
    def test_punctuation_and_whitespace(self):
        assert tp.tokenize("Hello, world!  It's a test.") == [
            "Hello", "world", "It", "s", "a", "test",
        ]

    def test_all_punct_split(self):
        assert tp.tokenize("a.b,c;d:e(f)g[h]i{j}k") == list("abcdefghijk")

    def test_controls_and_empty(self):
        assert tp.tokenize("a\tb\nc\rd\ve\ff\0g") == list("abcdefg")
        assert tp.tokenize("...   \n\n") == []
        assert tp.tokenize("") == []

    def test_numbers_hyphens(self):
        assert tp.tokenize("rule 102(e)(3)(i) of 1934") == [
            "rule", "102", "e", "3", "i", "of", "1934",
        ]

    def test_no_case_change(self):
        # lowercasing happens upstream (example_parsing.py:99)
        assert tp.tokenize("ABC def") == ["ABC", "def"]


class TestSentences:
    def test_split_chars(self):
        assert tp.split_sentences("one. two\nthree\rfour") == [
            "one", "two", "three", "four",
        ]

    def test_sentence_tokens_roundtrip(self):
        # concatenated sentence tokens == whole-text tokens (shared delimiters)
        text = "The Cat. sat\non the MAT, twice.\r end"
        flat = [t for s in tp.sentence_tokens(text) for t in s]
        assert flat == tp.tokenize(text.lower())


class TestTags:
    def test_multi_token_mention(self):
        tagged = tp.tagged_tokens_from_text(
            "He co-founded <comp.>eSafetyWorld, Inc.</>, in Nevada."
        )
        assert ("esafetyworld", "comp") in tagged
        assert ("inc", "end") in tagged
        idx = tagged.index(("esafetyworld", "comp"))
        assert tagged[idx + 1] == ("inc", "end")

    def test_single_token_mention(self):
        tagged = tp.tagged_tokens_from_text("during <date.>2000</> and <date.>2001</>")
        assert ("2000", "date") in tagged
        assert ("2001", "date") in tagged
        assert ("and", None) in tagged

    def test_three_token_mention_in_end(self):
        tagged = tp.tagged_tokens_from_text("<comp.>acme holding corp</> settled")
        assert tagged[0] == ("acme", "comp")
        assert tagged[1] == ("holding", "in")
        assert tagged[2] == ("corp", "end")
        assert tagged[3] == ("settled", None)

    def test_empty_end_token_promotes_in_to_end(self):
        # "inc." tokenizes the mention body away from the end mark, leaving
        # an empty end token that must promote the previous 'in' to 'end'
        # (example_parsing.py:78-82).
        tagged = tp.tagged_tokens_from_text("<comp.>acme sub inc.</> was cited")
        assert tagged[:3] == [("acme", "comp"), ("sub", "in"), ("inc", "end")]

    def test_entity_dict_shape(self):
        text = (
            "He co-founded <comp.>eSafetyWorld, Inc.</> during <date.>2000</> "
            "and <date.>2001</> about <item.>revenues</> and <item.>profits</>"
        )
        d = tp.entity_dict(tp.tagged_tokens_from_text(text))
        assert d == {
            "comp": [["esafetyworld", "inc"]],
            "date": [["2000"], ["2001"]],
            "item": [["revenues"], ["profits"]],
        }

    def test_spans_have_positions(self):
        spans = tp.entity_spans(
            tp.tagged_tokens_from_text("a b <comp.>x y</> c")
        )
        assert spans == [("comp", ["x", "y"], 2, 3)]

    def test_strip_tags_roundtrip(self):
        tagged_text = "He founded <comp.>Acme, Inc.</> in <date.>2001</>."
        raw = tp.strip_tags_text(tagged_text)
        assert "<" not in raw and ">" not in raw
        # raw token stream == tagged token stream minus tags
        raw_tokens = tp.tokenize(raw.lower())
        tag_tokens = [t for t, _ in tp.tagged_tokens_from_text(tagged_text)]
        assert raw_tokens == tag_tokens


class TestSublist:
    def test_basic(self):
        assert tp.is_contiguous_sublist(["b", "c"], ["a", "b", "c", "d"])
        assert not tp.is_contiguous_sublist(["b", "d"], ["a", "b", "c", "d"])

    def test_suffix_boundary_exact(self):
        # ['ab'] is NOT a sublist of ['abc'] (sentinel semantics,
        # utilities.py:156-165)
        assert not tp.is_contiguous_sublist(["ab"], ["abc"])
        assert tp.is_contiguous_sublist(["ab"], ["x", "ab"])

    def test_empty_cases(self):
        assert not tp.is_contiguous_sublist([], ["a"])
        assert not tp.is_contiguous_sublist(["a"], [])

    def test_prefix_substring_quirk_preserved(self):
        # the reference's string-containment check matches mid-token at the
        # start: 'b:c:' in 'ab:c:' — replicated on purpose
        assert tp.is_contiguous_sublist(["b", "c"], ["ab", "c"])


@pytest.mark.spark
def test_tokens_sql_roundtrip(spark):
    """tokens_sql (SQL-literal form, double-escaped for Spark's parser)
    must tokenize identically to tokens_col on unicode + punctuation +
    whitespace-variant text."""
    from coies_spark.functions.tokenize import tokens_col, tokens_sql

    rows = [
        ("Hello, World! it's 2001-2002",),
        ("tabs\tand\nnewlines  double  spaces",),
        ("punct-only !!! ...",),
        ("",),
        ("Ünïcode café naïve",),
    ]
    df = spark.createDataFrame(rows, "text string")
    df.createOrReplaceTempView("tok_rt")
    via_col = [r.t for r in df.select(tokens_col("text").alias("t")).collect()]
    via_sql = [
        r.t
        for r in spark.sql(
            f"SELECT {tokens_sql('text')} AS t FROM tok_rt"
        ).collect()
    ]
    assert via_col == via_sql
