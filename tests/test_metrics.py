"""ROUGE / P-R metric tests (rougescore.py:7-61, oneshot_test.py:105-120)."""

import pytest

from coies_spark.core.metrics import mention_score, rouge_1, rouge_n, triple_prf


class TestRouge:
    def test_perfect_match(self):
        assert rouge_1(["a", "b"], [["a", "b"]], 0.5) == pytest.approx(1.0)

    def test_half_overlap(self):
        # peer {a,b} vs model {a,c}: matches=1, P=R=0.5 → F=0.5
        assert rouge_1(["a", "b"], [["a", "c"]], 0.5) == pytest.approx(0.5)

    def test_clipping(self):
        # peer [a,a,a] vs model [a]: matches=min(3,1)=1, P=1/3, R=1 → F=0.5
        assert rouge_1(["a", "a", "a"], [["a"]], 0.5) == pytest.approx(0.5)

    def test_empty_peer(self):
        assert rouge_1([], [["a"]], 0.5) == 0.0

    def test_rouge2_single_token_is_zero(self):
        assert rouge_n(["a"], [["a"]], 2, 0.5) == 0.0

    def test_alpha_weighting(self):
        # P=1, R=0.5; F_alpha = P*R/((1-a)*P + a*R): a=0 → R, a=1 → P
        assert rouge_1(["a"], [["a", "b"]], 0.0) == pytest.approx(0.5)
        assert rouge_1(["a"], [["a", "b"]], 1.0) == pytest.approx(1.0)


class TestMentionScore:
    def test_gold_present(self):
        gold = {"comp": [["acme", "inc"]]}
        s, c = mention_score([("acme", "inc")], gold, "comp")
        assert (s, c) == (1.0, 1)

    def test_gold_flattened_across_mentions(self):
        gold = {"date": [["2000"], ["2001"]]}
        s, c = mention_score([("2000",)], gold, "date")
        # answers = [2000, 2001]; peer=[2000]: matches=1, R=0.5, P=1 → F≈0.667
        assert s == pytest.approx(2 / 3)
        assert c == 1

    def test_both_empty_full_credit(self):
        assert mention_score([], {}, "comp") == (1.0, 1)
        assert mention_score(None, {}, "comp") == (1.0, 1)

    def test_found_but_no_gold(self):
        assert mention_score([("x",)], {}, "comp") == (0.0, 1)


class TestTriplePRF:
    def test_exact(self):
        pred = [("d1", "comp", "acme inc"), ("d1", "date", "2000")]
        gold = [("d1", "comp", "acme inc"), ("d1", "date", "2001")]
        m = triple_prf(pred, gold)
        assert m["precision"] == 0.5 and m["recall"] == 0.5
        assert m["f1"] == pytest.approx(0.5)

    def test_empty_pred(self):
        m = triple_prf([], [("a", "b", "c")])
        assert m["precision"] == 0.0 and m["recall"] == 0.0
