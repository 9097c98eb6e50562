"""Forty-first batch: TextRank keyword extraction — the corpus
co-occurrence graph ranked by the engine's own deterministic
PageRank (Mihalcea & Tarau 2004)."""

import pytest

from coies_spark.ops.textstats import textrank_terms

pytestmark = pytest.mark.spark


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


class TestTextrankTerms:
    def test_hub_term_ranks_first(self, spark):
        d = _docs(spark, [
            "spark runs fast",
            "spark shuffles data",
            "spark joins tables",
            "spark caches blocks",
        ])
        rows = textrank_terms(d, topk=5).collect()
        assert rows[0].term == "spark" and rows[0].rank == 1
        # hub pr strictly dominates every spoke
        assert all(rows[0].pr > r.pr for r in rows[1:])

    def test_stopword_and_length_gate(self, spark):
        d = _docs(spark, ["the cat sat on a mat", "x y z cat mat"])
        terms = {r.term for r in textrank_terms(d, topk=50).collect()}
        assert "the" not in terms and "a" not in terms
        assert "x" not in terms  # single chars gated
        assert "cat" in terms and "mat" in terms

    def test_window_bounds_cooccurrence(self, spark):
        # "alpha" and "delta" are 3 apart: linked at window=3,
        # unlinked at window=2 — with window=2 the graph is a path
        # (alpha-beta, beta-gamma via w=2 skips...) — assert the
        # direct effect: at window=1 only adjacent pairs edge, so the
        # end terms have lower pr than the middle ones
        d = _docs(spark, ["alpha beta gamma delta"] * 3)
        rows = {r.term: r.pr for r in textrank_terms(
            d, window=1, topk=10).collect()}
        assert rows["beta"] > rows["alpha"]
        assert rows["gamma"] > rows["delta"]

    def test_rank_is_dense_and_ordered(self, spark):
        d = _docs(spark, ["one two three four five six seven"])
        rows = textrank_terms(d, topk=4).collect()
        assert [r.rank for r in rows] == [1, 2, 3, 4]
        prs = [r.pr for r in rows]
        assert prs == sorted(prs, reverse=True)

    def test_partitioning_invariance(self, spark):
        texts = [f"term{i} shared term{(i + 1) % 7}" for i in range(21)]
        d = _docs(spark, texts)
        a = sorted(map(tuple, textrank_terms(d, topk=10).collect()))
        b = sorted(
            map(
                tuple,
                textrank_terms(d.repartition(5), topk=10).collect(),
            )
        )
        assert a == b

    def test_window_validation(self, spark):
        with pytest.raises(ValueError):
            textrank_terms(_docs(spark, ["a b"]), window=0)
