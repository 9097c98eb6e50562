"""get_top_group / ranking parity tests (utilities.py:35-44, 64-82)."""

from coies_spark.core.ranking import rank_desc, top_group


class TestRankDesc:
    def test_stable_ties_keep_insertion_order(self):
        items = [("a", 1.0), ("b", 2.0), ("c", 1.0), ("d", 2.0)]
        assert rank_desc(items) == [("b", 2.0), ("d", 2.0), ("a", 1.0), ("c", 1.0)]

    def test_topn_cut(self):
        items = [("a", 3.0), ("b", 1.0), ("c", 2.0)]
        assert rank_desc(items, topn=2) == [("a", 3.0), ("c", 2.0)]


class TestTopGroup:
    def test_empty_and_singleton_passthrough(self):
        assert top_group([]) == []
        assert top_group([("a", 0.5)]) == [("a", 0.5)]

    def test_threshold_is_strict(self):
        assert top_group([("a", 0.9), ("b", 0.91)], threshold=0.9) == [("b", 0.91)]

    def test_all_below_threshold(self):
        assert top_group([("a", 0.1), ("b", 0.2)], threshold=0.5) == []

    def test_all_equal_returns_top_only(self):
        # avg_gap = 0; strict '<' fails immediately → just the first
        # (reference behavior for degenerate input)
        got = top_group([("a", 0.8), ("b", 0.8), ("c", 0.8)])
        assert got == [("a", 0.8)]

    def test_cluster_cut(self):
        # values 1.0, 0.98, 0.95 | 0.5: avg_gap = 0.5/3 ≈ 0.1667;
        # gaps 0.02, 0.03 < avg keep; gap 0.45 >= avg stops.
        items = [("a", 1.0), ("b", 0.98), ("c", 0.95), ("d", 0.5)]
        assert top_group(items) == [("a", 1.0), ("b", 0.98), ("c", 0.95)]

    def test_cut_after_first_when_top_is_isolated(self):
        # 1.0 | 0.5, 0.49, 0.48: avg_gap ≈ 0.1733; first gap 0.5 >= avg
        items = [("a", 1.0), ("b", 0.5), ("c", 0.49), ("d", 0.48)]
        assert top_group(items) == [("a", 1.0)]

    def test_unsorted_input_is_sorted_first(self):
        items = [("d", 0.5), ("a", 1.0), ("c", 0.95), ("b", 0.98)]
        assert [k for k, _ in top_group(items)] == ["a", "b", "c"]

    def test_never_empty_after_threshold_pass(self):
        # guaranteed >= 1 survivor whenever any value clears the threshold
        for vals in ([0.99, 0.95], [0.99, 0.95, 0.91], [1.0, 1.0, 0.92]):
            items = [(str(i), v) for i, v in enumerate(vals)]
            assert len(top_group(items, threshold=0.9)) >= 1

    def test_equal_spacing_returns_top_only(self):
        # gaps all exactly equal to avg → strict '<' fails at step 1
        # (exactly-representable floats so no rounding slack)
        items = [("a", 0.75), ("b", 0.5), ("c", 0.25)]
        assert top_group(items) == [("a", 0.75)]
