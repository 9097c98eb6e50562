"""Twenty-fifth batch: DPO preference-pair mining (ops.transcripts)."""

import pytest
from pyspark.sql import functions as F

from coies_spark.ops.transcripts import preference_pairs

pytestmark = pytest.mark.spark


def _ex(spark, rows):
    return spark.createDataFrame(
        rows, "prompt string, response string, score double"
    )


class TestPreferencePairs:
    def test_best_vs_worst(self, spark):
        out = preference_pairs(_ex(spark, [
            ("p1", "meh", 0.2),
            ("p1", "great answer", 0.9),
            ("p1", "ok", 0.5),
        ])).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.chosen, r.rejected) == ("great answer", "meh")
        assert (r.chosen_score, r.rejected_score) == (0.9, 0.2)
        assert r.n_responses == 3

    def test_single_response_prompts_emit_nothing(self, spark):
        out = preference_pairs(_ex(spark, [
            ("p1", "only", 0.5),
            ("p2", "a", 0.1), ("p2", "b", 0.9),
        ])).collect()
        assert {r.prompt for r in out} == {"p2"}

    def test_duplicate_response_keeps_best_score(self, spark):
        # the same response resampled at two scores is ONE candidate
        # at its best showing; it can win but never also lose
        out = preference_pairs(_ex(spark, [
            ("p", "A", 1.0), ("p", "A", 0.0), ("p", "B", 0.5),
        ])).collect()[0]
        assert (out.chosen, out.rejected) == ("A", "B")
        assert out.n_responses == 2

    def test_fully_tied_scores_still_distinct_pair(self, spark):
        out = preference_pairs(_ex(spark, [
            ("p", "alpha", 0.5), ("p", "beta", 0.5),
        ])).collect()[0]
        assert out.chosen == "beta" and out.rejected == "alpha"
        assert out.chosen != out.rejected

    def test_margin_filter_composes(self, spark):
        df = preference_pairs(_ex(spark, [
            ("p1", "a", 0.1), ("p1", "b", 0.9),
            ("p2", "c", 0.5), ("p2", "d", 0.55),
        ]))
        wide = df.where(
            F.col("chosen_score") - F.col("rejected_score") >= 0.3
        ).collect()
        assert [r.prompt for r in wide] == ["p1"]
