"""Fifteenth batch: exact-cosine rerank of coarse ANN candidates
(ops.similarity), k-anonymity/l-diversity audit (ops.profile), and
the Unicode-script composition profile (ops.textstats)."""

import pytest
from pyspark.sql import functions as F

from coies_spark.ops.profile import k_anonymity
from coies_spark.ops.similarity import brute_topk, rerank_topk
from coies_spark.ops.textstats import script_profile

pytestmark = pytest.mark.spark


def _emb(spark, n=20, dim=6):
    rows = [
        (i, [float((i * 5 + j * 7) % 13) - 6.0 for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


class TestRerankTopk:
    def test_rerank_of_full_candidates_equals_brute(self, spark):
        emb = _emb(spark)
        # candidate set = everything: rerank must reproduce brute force
        all_pairs = brute_topk(emb, n_queries=3, k=19)
        got = {
            (r.query_id, r.target_id, r.rank)
            for r in rerank_topk(emb, all_pairs, k=4).collect()
        }
        want = {
            (r.query_id, r.target_id, r.rank)
            for r in brute_topk(emb, n_queries=3, k=4).collect()
        }
        assert got == want

    def test_rank_recomputed_from_exact_sim(self, spark):
        emb = _emb(spark)
        # feed candidates in a deliberately wrong coarse order
        cand = spark.createDataFrame(
            [(0, 5), (0, 9), (0, 13)], "query_id long, target_id long"
        )
        out = rerank_topk(emb, cand, k=3).collect()
        assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [
            1, 2, 3,
        ]
        sims = [
            r.sim for r in sorted(out, key=lambda r: r.rank)
        ]
        assert sims == sorted(sims, reverse=True)

    def test_never_returns_outside_candidates(self, spark):
        emb = _emb(spark)
        cand = spark.createDataFrame(
            [(1, 2), (1, 3)], "query_id long, target_id long"
        )
        out = rerank_topk(emb, cand, k=5).collect()
        assert {r.target_id for r in out} <= {2, 3}
        assert len(out) == 2  # fewer candidates than k is honest

    def test_rejects_bad_k(self, spark):
        emb = _emb(spark)
        with pytest.raises(ValueError):
            rerank_topk(emb, emb.select(
                F.col("vec_id").alias("query_id"),
                F.col("vec_id").alias("target_id"),
            ), k=0)


class TestKAnonymity:
    def _df(self, spark):
        rows = (
            [("en", 1, f"s{i % 3}") for i in range(9)]   # big, diverse
            + [("fr", 1, "s0")] * 6                       # big, homogeneous
            + [("zh", 2, "s1")] * 2                       # small
        )
        return spark.createDataFrame(
            rows, "lang string, len_bin int, source string"
        )

    def test_classes_and_flags(self, spark):
        out = {
            (r.lang, r.len_bin): r
            for r in k_anonymity(
                self._df(spark), ("lang", "len_bin"),
                sensitive_col="source", k=5,
            ).collect()
        }
        en = out[("en", 1)]
        assert (en.class_size, en.l_diversity, en.at_risk) == (9, 3, False)
        fr = out[("fr", 1)]  # large but sensitive-homogeneous
        assert (fr.class_size, fr.l_diversity, fr.at_risk) == (6, 1, True)
        zh = out[("zh", 2)]  # small
        assert (zh.class_size, zh.at_risk) == (2, True)

    def test_without_sensitive_col(self, spark):
        out = {
            r.lang: r
            for r in k_anonymity(
                self._df(spark), ("lang",), k=5
            ).collect()
        }
        assert "l_diversity" not in out["en"].asDict()
        assert out["fr"].at_risk is False  # size 6 >= 5, no l-rule
        assert out["zh"].at_risk is True

    def test_rejects_bad_params(self, spark):
        with pytest.raises(ValueError):
            k_anonymity(self._df(spark), ())
        with pytest.raises(ValueError):
            k_anonymity(self._df(spark), ("lang",), k=1)


class TestScriptProfile:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                ("latin", "Hello world 42"),
                ("cjk", "你好世界"),
                ("mixed", "abc вода"),
                ("empty", ""),
                ("other", "☃☃"),  # snowmen: no named script
            ],
            "doc_id string, text string",
        )

    def test_ratios_and_dominant(self, spark):
        out = {
            r.doc_id: r for r in script_profile(self._docs(spark)).collect()
        }
        lat = out["latin"]  # "Hello world 42": 10 latin, 2 digit, 2 space
        assert lat.n_chars == 14
        assert lat.latin_ratio == pytest.approx(10 / 14, abs=1e-6)
        assert lat.digit_ratio == pytest.approx(2 / 14, abs=1e-6)
        assert lat.space_ratio == pytest.approx(2 / 14, abs=1e-6)
        assert lat.other_ratio == 0.0
        assert lat.dominant_script == "latin"
        cjk = out["cjk"]
        assert cjk.cjk_ratio == 1.0
        assert cjk.dominant_script == "cjk"
        mixed = out["mixed"]  # 3 latin vs 4 cyrillic
        assert mixed.dominant_script == "cyrillic"
        assert mixed.cyrillic_ratio == pytest.approx(4 / 8, abs=1e-6)

    def test_empty_and_unnamed_scripts(self, spark):
        out = {
            r.doc_id: r for r in script_profile(self._docs(spark)).collect()
        }
        assert out["empty"].latin_ratio is None  # 0/0 -> NULL
        assert out["empty"].dominant_script == "none"
        oth = out["other"]
        assert oth.other_ratio == 1.0
        assert oth.dominant_script == "none"

    def test_tie_breaks_to_fixed_order(self, spark):
        docs = spark.createDataFrame(
            [("tie", "abво")],  # 2 latin, 2 cyrillic
            "doc_id string, text string",
        )
        row = script_profile(docs).collect()[0]
        assert row.dominant_script == "latin"
