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


class TestTextrankSentences:
    def test_central_sentence_ranks_first(self, spark):
        from coies_spark.ops.textstats import textrank_sentences

        # sentence 1 shares tokens with every other sentence; the
        # others share nothing with each other
        d = _docs(spark, [
            "spark shuffles joins caches. "
            "spark shuffles quickly. "
            "joins run distributed. "
            "caches hold blocks",
        ])
        rows = textrank_sentences(d, topk=1).collect()
        assert len(rows) == 1
        assert rows[0].sent_idx == 0 and rows[0].rank == 1

    def test_single_sentence_doc_still_ranks(self, spark):
        from coies_spark.ops.textstats import textrank_sentences

        d = _docs(spark, ["only one sentence here"])
        rows = textrank_sentences(d, topk=2).collect()
        assert len(rows) == 1
        assert rows[0].rank == 1 and rows[0].sentence.startswith("only")

    def test_per_document_independence(self, spark):
        from coies_spark.ops.textstats import textrank_sentences

        d = _docs(spark, [
            "alpha beta gamma. alpha beta delta. epsilon zeta",
            "one two three. one two four",
        ])
        rows = textrank_sentences(d, topk=2).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r.rank)
        assert sorted(by_doc[0]) == [1, 2]
        assert sorted(by_doc[1]) == [1, 2]

    def test_summary_sentences_carry_text(self, spark):
        from coies_spark.ops.textstats import textrank_sentences

        d = _docs(spark, ["first part here. second part here"])
        rows = {r.sent_idx: r.sentence for r in textrank_sentences(
            d, topk=2).collect()}
        assert rows == {0: "first part here", 1: "second part here"}

    def test_topk_validation(self, spark):
        from coies_spark.ops.textstats import textrank_sentences

        with pytest.raises(ValueError):
            textrank_sentences(_docs(spark, ["a. b"]), topk=0)
