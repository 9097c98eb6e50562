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


class TestRougeL:
    def _lcs_dp(self, a, b):
        # reference-faithful rolling-row DP (rougescore.py:77-110
        # semantics) used only as the property-test witness
        prev = [0] * (len(b) + 1)
        for x in a:
            cur = [0]
            for j, y in enumerate(b, 1):
                cur.append(prev[j - 1] + 1 if x == y else max(cur[j - 1], prev[j]))
            prev = cur
        return prev[-1]

    def test_known_values(self):
        from coies_spark.core.metrics import lcs_len, rouge_l

        assert lcs_len("abcbdab", "bdcaba") == 4
        assert lcs_len([], ["a"]) == 0
        assert lcs_len(["a", "b"], []) == 0
        # peer == model → f = 1.0
        assert rouge_l(["a", "b", "c"], [["a", "b", "c"]]) == 1.0
        # disjoint → 0.0
        assert rouge_l(["a"], [["b"]]) == 0.0
        # lcs("a c" vs "a b c") = 2 → p=2/3 r=2/2 f=2*2/(3+2)... alpha 0.5
        got = rouge_l(["a", "b", "c"], [["a", "c"]])
        assert got == pytest.approx(2 * 2 / (3 + 2))

    def test_bitvector_matches_dp_property(self):
        from hypothesis import given, settings, strategies as st

        from coies_spark.core.metrics import lcs_len

        @settings(max_examples=300, deadline=None)
        @given(
            st.lists(st.integers(0, 4), max_size=40),
            st.lists(st.integers(0, 4), max_size=40),
        )
        def check(a, b):
            assert lcs_len(a, b) == self._lcs_dp(a, b)

        check()


class TestRwmdKernelProperties:
    """Engine-independent sanity of the RWMD construction (the full
    distributed operator is oracle-verified in test_ops_oracle)."""

    def _vec(self, tok):
        import hashlib

        h = hashlib.md5(tok.encode()).hexdigest()
        return [int(h[4 * k : 4 * k + 4], 16) / 65535.0 for k in range(8)]

    def _dist(self, t, u):
        import math

        return round(
            math.sqrt(
                sum((a - b) ** 2 for a, b in zip(self._vec(t), self._vec(u)))
            ),
            6,
        )

    def test_identical_docs_have_zero_rwmd(self, spark):
        from coies_spark.ops.wmd import rwmd_pairs

        docs = spark.createDataFrame(
            [(0, "alpha beta gamma", "s"), (1, "alpha beta gamma", "s")],
            "doc_id long, text string, source string",
        )
        rows = rwmd_pairs(docs).collect()
        assert len(rows) == 1 and rows[0].rwmd == 0.0

    def test_single_token_docs_rwmd_is_exact_distance(self, spark):
        """With one token per doc, RWMD == WMD == d(t, u) exactly."""
        from coies_spark.ops.wmd import rwmd_pairs

        docs = spark.createDataFrame(
            [(0, "alpha", "s"), (1, "beta", "s")],
            "doc_id long, text string, source string",
        )
        rows = rwmd_pairs(docs).collect()
        assert len(rows) == 1
        assert rows[0].rwmd == pytest.approx(
            self._dist("alpha", "beta"), abs=2e-6
        )

    def test_pruned_rwmd_matches_exact_on_shared_vocab_long_docs(self, spark):
        """Long documents drawn from a SHARED vocabulary: every token's
        true nearest counterpart is itself (distance 0), which always
        collides in the same LSH bucket, so the pruned RWMD equals the
        exact one bit-for-bit — the long-doc fixture for the prune
        path."""
        import random

        from coies_spark.ops.wmd import rwmd_pairs

        rnd = random.Random(7)
        vocab = [f"tok{i}" for i in range(40)]
        doc_a = " ".join(rnd.choice(vocab) for _ in range(600))
        doc_b = " ".join(rnd.choice(vocab) for _ in range(600))
        docs = spark.createDataFrame(
            [(0, doc_a, "s"), (1, doc_b, "s")],
            "doc_id long, text string, source string",
        )
        exact = rwmd_pairs(docs).collect()[0].rwmd
        pruned = rwmd_pairs(docs, prune_planes=3, prune_bands=4).collect()[
            0
        ].rwmd
        assert pruned == exact == 0.0

    def test_pruned_rwmd_is_upper_bound_and_plan_is_bucket_join(self, spark):
        """Disjoint-vocabulary docs: pruning may miss true nearest
        neighbours, so pruned >= exact (never an underestimate); and
        the pruned plan generates candidates via the (band, bucket)
        equality join, never the full per-pair token square."""
        from coies_spark.ops.wmd import rwmd_pairs

        docs = spark.createDataFrame(
            [
                (0, " ".join(f"alpha{i}" for i in range(30)), "s"),
                (1, " ".join(f"beta{i}" for i in range(30)), "s"),
            ],
            "doc_id long, text string, source string",
        )
        exact = rwmd_pairs(docs).collect()[0].rwmd
        pruned_df = rwmd_pairs(docs, prune_planes=2, prune_bands=2)
        pruned = pruned_df.collect()[0].rwmd
        assert pruned >= exact - 1e-9
        plan = pruned_df._jdf.queryExecution().toString()
        assert "bucket" in plan
        # exact path has no bucket machinery in its plan
        exact_plan = rwmd_pairs(docs)._jdf.queryExecution().toString()
        assert "bucket" not in exact_plan
