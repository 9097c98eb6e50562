"""Nineteenth batch: extractive turn centrality (ops.transcripts)
and quality-aware near-dup canonicalization (ops.dedup)."""

import pytest
from pyspark.sql import functions as F

from coies_spark.ops.dedup import dedup_representatives
from coies_spark.ops.transcripts import central_turns

pytestmark = pytest.mark.spark


def _conv(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )


class TestCentralTurns:
    def test_picks_max_mean_jaccard(self, spark):
        t = _conv(spark, [
            ("c1", 0, "alpha beta"),
            ("c1", 1, "alpha beta gamma"),   # overlaps both others most
            ("c1", 2, "gamma delta"),
        ])
        row = central_turns(t).collect()[0]
        assert row.turn_idx == 1
        assert row.n_turns == 3
        # manual: jac(1,0)=2/3, jac(1,2)=1/4 -> mean 0.458333
        assert row.centrality == pytest.approx(
            round((2 / 3 + 1 / 4) / 2, 6), abs=1e-6
        )

    def test_tie_breaks_to_earliest(self, spark):
        t = _conv(spark, [
            ("c1", 0, "a b"),
            ("c1", 1, "a b"),  # identical: symmetric tie
        ])
        row = central_turns(t).collect()[0]
        assert row.turn_idx == 0
        assert row.centrality == 1.0

    def test_single_turn_conversation(self, spark):
        t = _conv(spark, [("solo", 0, "only turn")])
        row = central_turns(t).collect()[0]
        assert (row.conv_id, row.turn_idx, row.n_turns) == ("solo", 0, 1)
        assert row.centrality is None

    def test_one_row_per_conversation(self, spark):
        t = _conv(spark, [
            ("c1", i, f"tok{i} shared") for i in range(4)
        ] + [("c2", 0, "x"), ("c2", 1, "y")])
        out = central_turns(t).collect()
        assert sorted(r.conv_id for r in out) == ["c1", "c2"]


class TestDedupRepresentatives:
    def _docs(self, spark):
        return spark.createDataFrame(
            [(1, 50), (2, 90), (3, 70), (4, 10), (5, 90)],
            "doc_id long, quality long",
        )

    def _pairs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_a long, doc_b long")

    def test_keeps_best_quality_per_cluster(self, spark):
        out = {
            r.doc_id: r
            for r in dedup_representatives(
                self._docs(spark),
                self._pairs(spark, [(1, 2), (2, 3)]),
                score_col="quality",
            ).collect()
        }
        # cluster {1,2,3}: doc 2 has max quality 90
        for d in (1, 2, 3):
            assert out[d].rep_id == "2"
            assert out[d].component == "1"  # min string id labels
        assert out[2].kept is True
        assert out[1].kept is False and out[3].kept is False

    def test_singletons_keep_themselves(self, spark):
        out = {
            r.doc_id: r
            for r in dedup_representatives(
                self._docs(spark),
                self._pairs(spark, [(1, 2)]),
                score_col="quality",
            ).collect()
        }
        assert out[4].kept is True and out[4].rep_id == "4"
        assert out[4].component == "4"

    def test_quality_tie_breaks_to_string_min_id(self, spark):
        out = {
            r.doc_id: r
            for r in dedup_representatives(
                self._docs(spark),
                self._pairs(spark, [(2, 5)]),  # both quality 90
                score_col="quality",
            ).collect()
        }
        assert out[2].rep_id == "2" and out[5].rep_id == "2"

    def test_kept_count_equals_component_count(self, spark):
        out = dedup_representatives(
            self._docs(spark),
            self._pairs(spark, [(1, 2), (3, 4)]),
            score_col="quality",
        )
        n_comp = out.select("component").distinct().count()
        n_kept = out.where("kept").count()
        assert n_comp == n_kept == 3  # {1,2}, {3,4}, {5}
