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
