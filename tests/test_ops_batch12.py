"""Twelfth-batch operators: trapezoidal ROC-AUC (ops.classify), the
Zipf naturalness gauge (ops.textstats), and nDCG@k (ops.relational)."""

import math

import pytest

from coies_spark.ops.classify import roc_auc
from coies_spark.ops.relational import ndcg_at_k
from coies_spark.ops.textstats import zipf_alpha

pytestmark = pytest.mark.spark


def _scored(spark, rows):
    return spark.createDataFrame(rows, "p double, y double")


class TestRocAuc:
    def test_perfect_separation(self, spark):
        rows = [(0.9, 1.0), (0.8, 1.0), (0.2, 0.0), (0.1, 0.0)]
        r = roc_auc(_scored(spark, rows)).collect()[0]
        assert (r.n_pos, r.n_neg, r.auc) == (2, 2, 1.0)

    def test_inverted_scorer_scores_zero(self, spark):
        rows = [(0.1, 1.0), (0.2, 1.0), (0.8, 0.0), (0.9, 0.0)]
        r = roc_auc(_scored(spark, rows)).collect()[0]
        assert r.auc == 0.0

    def test_random_tie_scores_half(self, spark):
        # every example shares one score: one grid level, trapezoid
        # from (0,0) to (1,1) = 0.5 — the chance diagonal
        rows = [(0.5, 1.0), (0.5, 0.0), (0.5, 1.0), (0.5, 0.0)]
        r = roc_auc(_scored(spark, rows)).collect()[0]
        assert r.auc == 0.5

    def test_matches_mann_whitney_on_mixed_case(self, spark):
        rows = [(0.9, 1.0), (0.7, 0.0), (0.6, 1.0), (0.4, 1.0),
                (0.3, 0.0), (0.2, 0.0)]
        r = roc_auc(_scored(spark, rows)).collect()[0]
        # pairwise P(pos > neg) + 0.5 P(tie): 9 pairs, wins:
        # 0.9 beats all 3; 0.6 beats 0.3,0.2; 0.4 beats 0.3? no,
        # 0.4 > 0.3, 0.2 -> 2; total 7/9
        assert abs(r.auc - round(7 / 9, 6)) < 2e-6

    def test_degenerate_all_positive(self, spark):
        r = roc_auc(_scored(spark, [(0.5, 1.0), (0.9, 1.0)])).collect()[0]
        assert r.n_neg == 0 and r.auc is None

    def test_guard(self, spark):
        with pytest.raises(ValueError):
            roc_auc(_scored(spark, [(0.5, 1.0)]), grid_dp=9)


class TestZipfAlpha:
    def test_synthetic_zipf_recovers_alpha(self, spark):
        # build a corpus whose token frequencies are EXACTLY f(r) =
        # round(1000 / r): the fit must find alpha ~ 1, r2 ~ 1
        words = []
        for r in range(1, 51):
            words += [f"w{r:03d}"] * round(1000 / r)
        docs = spark.createDataFrame(
            [(0, " ".join(words))], "doc_id long, text string"
        )
        row = zipf_alpha(docs, top_k=50).collect()[0]
        assert row.n_ranks == 50
        assert abs(row.alpha - 1.0) < 0.05, row
        assert row.r2 > 0.99

    def test_templated_corpus_flattens(self, spark):
        # 50 tokens all with equal frequency: slope 0 and no fit
        # quality — r2 is 0.0, or NULL when the variance term
        # cancels to exactly 0/0 in the decimal sums
        words = [f"t{r}" for r in range(50)] * 20
        docs = spark.createDataFrame(
            [(0, " ".join(words))], "doc_id long, text string"
        )
        row = zipf_alpha(docs, top_k=50).collect()[0]
        assert row.alpha == 0.0
        assert row.r2 is None or row.r2 == 0.0

    def test_guard(self, spark):
        docs = spark.createDataFrame(
            [(0, "a b c")], "doc_id long, text string"
        )
        with pytest.raises(ValueError):
            zipf_alpha(docs, top_k=2)


def _ranked(spark, rows):
    return spark.createDataFrame(
        rows, "query_id string, rank long, rel double"
    )


class TestNdcg:
    def test_perfect_ranking_is_one(self, spark):
        rows = [("q", 1, 3.0), ("q", 2, 2.0), ("q", 3, 1.0)]
        r = ndcg_at_k(_ranked(spark, rows), k=3).collect()[0]
        assert r.ndcg == 1.0 and r.dcg == r.idcg

    def test_hand_value(self, spark):
        # relevant doc at rank 2, ideal at rank 1:
        # dcg = 1/log2(3), idcg = 1/log2(2) = 1
        rows = [("q", 1, 0.0), ("q", 2, 1.0)]
        r = ndcg_at_k(_ranked(spark, rows), k=10).collect()[0]
        want = round(round(1.0 / math.log2(3.0), 9), 6)
        assert r.ndcg == want

    def test_truncation_at_k(self, spark):
        # the only relevant doc sits past k: pool truncates first,
        # so both dcg and idcg are 0 and ndcg is NULL
        rows = [("q", 1, 0.0), ("q", 2, 0.0), ("q", 3, 1.0)]
        r = ndcg_at_k(_ranked(spark, rows), k=2).collect()[0]
        assert r.dcg == 0.0 and r.ndcg is None

    def test_multi_query_independent(self, spark):
        rows = [("a", 1, 1.0), ("a", 2, 0.0),
                ("b", 1, 0.0), ("b", 2, 1.0)]
        got = {r.query_id: r.ndcg
               for r in ndcg_at_k(_ranked(spark, rows), k=2).collect()}
        assert got["a"] == 1.0
        assert got["b"] == round(round(1.0 / math.log2(3.0), 9), 6)

    def test_guard(self, spark):
        with pytest.raises(ValueError):
            ndcg_at_k(_ranked(spark, [("q", 1, 1.0)]), k=0)
