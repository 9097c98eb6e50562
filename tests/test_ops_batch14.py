"""Fourteenth batch: the multi-epoch mixture plan (ops.sampling) and
the Matryoshka prefix-dimension recall ladder (ops.similarity)."""

import pytest
from pyspark.sql import functions as F

from coies_spark.ops.sampling import epoch_plan
from coies_spark.ops.similarity import brute_topk, matryoshka_eval

pytestmark = pytest.mark.spark


def _docs(spark):
    # en: plentiful (sub-epoch), fr: scarce (capped), zh: mid
    rows = (
        [(f"e{i}", "en", 1000) for i in range(10)]
        + [(f"f{i}", "fr", 100) for i in range(2)]
        + [(f"z{i}", "zh", 500) for i in range(2)]
        + [("d0", "de", 700)]
    )
    return spark.createDataFrame(
        rows, "doc_id string, lang string, n_tokens int"
    )


class TestEpochPlan:
    def _plan(self, spark, budget=3000, **kw):
        return {
            r.stratum: r
            for r in epoch_plan(
                _docs(spark),
                {"en": 0.2, "fr": 0.5, "zh": 0.3},
                budget_tokens=budget,
                **kw,
            ).collect()
        }

    def test_sub_epoch_stratum(self, spark):
        p = self._plan(spark)
        en = p["en"]  # want 600 of 10000 -> 0.06 epochs, 1 pass
        assert en.available_tokens == 10000
        assert en.epochs == pytest.approx(0.06)
        assert en.n_passes == 1
        assert en.effective_tokens == 600
        assert en.deficit_tokens == 0

    def test_capped_stratum_reports_deficit(self, spark):
        p = self._plan(spark)
        fr = p["fr"]  # want 1500 of 200 -> 7.5 raw, capped at 4
        assert fr.epochs == pytest.approx(4.0)
        assert fr.n_passes == 4
        assert fr.effective_tokens == 800
        assert fr.deficit_tokens == 1500 - 800

    def test_multi_epoch_uncapped(self, spark):
        p = self._plan(spark)
        zh = p["zh"]  # want 900 of 1000 -> 0.9 epochs
        assert zh.epochs == pytest.approx(0.9)
        assert zh.deficit_tokens == 0

    def test_unnamed_stratum_gets_zero(self, spark):
        de = self._plan(spark)["de"]
        assert de.target_share == 0.0
        assert de.epochs == 0.0
        assert de.n_passes == 0
        assert de.effective_tokens == 0

    def test_fractional_cap(self, spark):
        fr = self._plan(spark, max_epochs=2.5)["fr"]
        assert fr.epochs == pytest.approx(2.5)
        assert fr.n_passes == 3  # 2 full passes + a 0.5 partial
        assert fr.effective_tokens == 500

    def test_rejects_bad_params(self, spark):
        with pytest.raises(ValueError):
            epoch_plan(_docs(spark), {"en": 1.0}, budget_tokens=0)
        with pytest.raises(ValueError):
            epoch_plan(
                _docs(spark), {"en": 1.0}, budget_tokens=10,
                max_epochs=0,
            )

    def test_absent_target_stratum_reports_full_deficit(self, spark):
        # a target language with NO corpus inventory must still emit
        # its row — that row IS the "source more data" signal
        p = {
            r.stratum: r
            for r in epoch_plan(
                _docs(spark), {"en": 0.5, "ja": 0.5},
                budget_tokens=1000,
            ).collect()
        }
        ja = p["ja"]
        assert ja.available_tokens == 0
        assert ja.epochs == 0.0
        assert ja.effective_tokens == 0
        assert ja.deficit_tokens == 500


def _emb(spark, n=24, dim=8):
    # deterministic vectors: coordinates from a fixed affine recipe
    rows = [
        (i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(dim)], i % 3)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


class TestMatryoshkaEval:
    def test_full_width_rung_is_perfect(self, spark):
        emb = _emb(spark)
        out = {
            r.dim: r
            for r in matryoshka_eval(
                emb, dims=(4, 8), n_queries=4, k=3
            ).collect()
        }
        assert set(out) == {4, 8}
        # the d = full-dim rung IS the ground truth: recall 1.0
        assert out[8].mean_recall == 1.0
        assert out[8].min_recall == 1.0
        assert out[8].exact_queries == out[8].n_queries == 4
        assert out[8].k == 3

    def test_truncation_recall_bounded(self, spark):
        emb = _emb(spark)
        out = {
            r.dim: r
            for r in matryoshka_eval(
                emb, dims=(2, 8), n_queries=4, k=3
            ).collect()
        }
        r2 = out[2]
        assert 0.0 <= r2.min_recall <= r2.mean_recall <= 1.0

    def test_matches_manual_recall(self, spark):
        emb = _emb(spark)
        exact = brute_topk(emb, n_queries=4, k=3)
        trunc = emb.select(
            "vec_id", F.slice("embedding", 1, 4).alias("embedding")
        )
        approx = brute_topk(trunc, n_queries=4, k=3)
        e = {
            (r.query_id, r.target_id) for r in exact.collect()
        }
        a = {
            (r.query_id, r.target_id) for r in approx.collect()
        }
        per_q = {}
        for q in {q for q, _ in e}:
            eq = {t for qq, t in e if qq == q}
            aq = {t for qq, t in a if qq == q}
            per_q[q] = len(eq & aq) / 3
        want = sum(per_q.values()) / len(per_q)
        got = {
            r.dim: r
            for r in matryoshka_eval(
                emb, dims=(4,), n_queries=4, k=3
            ).collect()
        }[4]
        assert got.mean_recall == pytest.approx(want, abs=1e-6)
        assert got.min_recall == pytest.approx(min(per_q.values()))

    def test_rejects_bad_dims(self, spark):
        emb = _emb(spark)
        with pytest.raises(ValueError):
            matryoshka_eval(emb, dims=())
        with pytest.raises(ValueError):
            matryoshka_eval(emb, dims=(0, 4))
