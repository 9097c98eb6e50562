"""Twenty-sixth batch: soft-dedup sampling weights (ops.dedup) and
entity salience / aboutness (ops.kg)."""

import math

import pytest

from coies_spark.ops.dedup import soft_dedup_weights
from coies_spark.ops.kg import mention_salience

pytestmark = pytest.mark.spark


class TestSoftDedupWeights:
    def test_cluster_mass_is_one(self, spark):
        docs = spark.createDataFrame(
            [(i,) for i in range(6)], "doc_id long"
        )
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (3, 4)], "doc_a long, doc_b long"
        )
        out = {
            r.doc_id: r
            for r in soft_dedup_weights(docs, pairs).collect()
        }
        # cluster {0,1,2}: each weighted 1/3
        for d in (0, 1, 2):
            assert out[d].cluster_size == 3
            assert out[d].weight == pytest.approx(round(1 / 3, 6))
        # cluster {3,4}: 1/2; singleton 5: 1.0
        assert out[3].weight == 0.5
        assert out[5].cluster_size == 1 and out[5].weight == 1.0
        total = sum(r.weight for r in out.values())
        assert total == pytest.approx(3.0, abs=1e-5)  # 3 clusters

    def test_every_doc_emitted(self, spark):
        docs = spark.createDataFrame(
            [(i,) for i in range(10)], "doc_id long"
        )
        pairs = spark.createDataFrame(
            [(0, 1)], "doc_a long, doc_b long"
        )
        assert soft_dedup_weights(docs, pairs).count() == 10


class TestMentionSalience:
    def _ev(self, spark):
        rows = (
            [("c1", "spark")] * 3 + [("c1", "table")]
            + [("c2", "spark")] + [("c3", "spark")]
            + [("c2", "vector")] * 2
        )
        return spark.createDataFrame(rows, "subj string, obj string")

    def test_tfidf_values(self, spark):
        out = {
            (r.conv_id, r.entity): r
            for r in mention_salience(self._ev(spark)).collect()
        }
        # 'spark' is in all 3 convs -> idf = ln(3/3) = 0: background
        assert out[("c1", "spark")].idf == 0.0
        assert out[("c1", "spark")].salience == 0.0
        # 'table' only in c1: idf = ln(3/1), tf = 1/4
        t = out[("c1", "table")]
        assert t.tf == pytest.approx(0.25)
        assert t.idf == pytest.approx(round(math.log(3), 6))
        assert t.salience == pytest.approx(
            round(round(0.25, 6) * round(math.log(3), 6), 6)
        )

    def test_subject_outranks_background(self, spark):
        out = {
            (r.conv_id, r.entity): r.salience
            for r in mention_salience(self._ev(spark)).collect()
        }
        # in c2, 'vector' (2 mentions, 1 conv) beats ubiquitous 'spark'
        assert out[("c2", "vector")] > out[("c2", "spark")]

    def test_mention_mass_not_distinct(self, spark):
        out = {
            (r.conv_id, r.entity): r.n_mentions
            for r in mention_salience(self._ev(spark)).collect()
        }
        assert out[("c1", "spark")] == 3  # raw evidence rows counted
