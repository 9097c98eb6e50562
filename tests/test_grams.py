"""Window / n-gram family tests (utilities.py:126-139)."""

from coies_spark.core.grams import gram_family, phased_ngrams, skip_windows, windows


class TestWindows:
    def test_count_is_len_minus_n_plus_1(self):
        toks = [str(i) for i in range(11)]
        assert len(windows(toks, 3)) == 9
        assert windows(toks, 3)[0] == (0, ("0", "1", "2"))
        assert windows(toks, 3)[-1] == (8, ("8", "9", "10"))

    def test_n_longer_than_doc(self):
        assert windows(["a", "b"], 5) == []

    def test_n_equals_doc(self):
        assert windows(["a", "b"], 2) == [(0, ("a", "b"))]


class TestPhased:
    def test_matches_reference_example(self):
        # utilities.py:132-133 docstring example
        toks = [str(i) for i in range(1, 12)]
        got = [g for _, g in phased_ngrams(toks, 3)]
        assert got == [
            ("1", "2", "3"), ("4", "5", "6"), ("7", "8", "9"),
            ("2", "3", "4"), ("5", "6", "7"), ("8", "9", "10"),
            ("3", "4", "5"), ("6", "7", "8"), ("9", "10", "11"),
        ]

    def test_same_set_as_stride1(self):
        toks = list("abcdefgh")
        assert {g for _, g in phased_ngrams(toks, 3)} == {
            g for _, g in windows(toks, 3)
        }


class TestFamily:
    def test_sizes_1_to_3(self):
        toks = list("abcd")
        fam = gram_family(toks, 1, 3)
        sizes = {len(g) for _, g in fam}
        assert sizes == {1, 2, 3}
        assert ("a",) in {g for _, g in fam}
        assert ("b", "c", "d") in {g for _, g in fam}


class TestSkip:
    def test_every_kth(self):
        toks = [str(i) for i in range(10)]
        got = list(skip_windows(toks, 3, 4))
        assert [p for p, _ in got] == [0, 4]


class TestStackedPhraseTable:
    """Trigram phrase family (reference AAERParserPhrases,
    aaer_corpus.py:105-134: trigrams = Phrases(bigrams[sentences])
    applied as trigrams[bigrams[sentences]])."""

    def _corpus(self):
        # "new york" is a strong bigram; "new_york city" becomes a
        # strong second-pass bigram (i.e. a trigram of raw tokens)
        sent = ["visit", "new", "york", "city", "today"]
        filler = [["the", "cat", "sat"], ["a", "dog", "ran"]]
        return [sent] * 30 + filler * 10

    def test_second_pass_builds_trigrams(self):
        from coies_spark.core.embed import StackedPhraseTable

        t = StackedPhraseTable.train(
            self._corpus(), passes=2, min_count=5, threshold=0.3
        )
        merged = t.merge(["visit", "new", "york", "city", "today"])
        # pass 1 greedily merges (visit,new) and (york,city); pass 2
        # composes the two merged tokens — a 4-raw-token phrase no
        # single pass can build (gensim stacked-Phrases behavior)
        assert "visit_new_york_city" in merged, merged
        one_pass = t.tables[0].merge(["visit", "new", "york", "city", "today"])
        assert "visit_new_york_city" not in one_pass
        assert "visit_new" in one_pass and "york_city" in one_pass

    def test_single_pass_equals_phrase_table(self):
        from coies_spark.core.embed import PhraseTable, StackedPhraseTable

        corpus = self._corpus()
        one = StackedPhraseTable.train(corpus, passes=1, min_count=5, threshold=0.3)
        flat = PhraseTable.train(corpus, min_count=5, threshold=0.3)
        for s in corpus[:3]:
            assert one.merge(s) == flat.merge(s)

    def test_rows_roundtrip(self):
        from coies_spark.core.embed import StackedPhraseTable

        t = StackedPhraseTable.train(
            self._corpus(), passes=2, min_count=5, threshold=0.3
        )
        back = StackedPhraseTable.from_rows(t.to_rows())
        sent = ["visit", "new", "york", "city", "today"]
        assert back.merge(sent) == t.merge(sent)
        assert len(back.tables) == len(t.tables)

    def test_drop_in_for_artifacts(self):
        """StackedPhraseTable slots into build_example_artifacts where
        PhraseTable is accepted (the .merge surface)."""
        from coies_spark.core.embed import StackedPhraseTable
        from coies_spark.core.oneshot import build_example_artifacts
        from coies_spark.data import synth
        from tests.conftest import FIXTURE_CONFIG

        corpus = synth.make_corpus(n_test=5, n_plain=5, seed=42)
        sentences = synth.corpus_sentences(corpus)
        tri = StackedPhraseTable.train(
            sentences, passes=2,
            min_count=FIXTURE_CONFIG.phrase_min_count,
            threshold=FIXTURE_CONFIG.phrase_threshold,
        )
        art = build_example_artifacts(
            corpus.example.tagged_text, sentences, FIXTURE_CONFIG, phrases=tri
        )
        assert art.seeds  # artifacts build cleanly under trigram phrasing
