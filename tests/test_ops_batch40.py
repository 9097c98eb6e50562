"""Fortieth batch: assertion scoping — NegEx-lite clause-level
negation/hedge flags (``assertion_clauses``) and the gated pattern
extractor (``pattern_triples_asserted``) that stops rules from firing
inside negated or hypothetical clauses."""

import pytest
from pyspark.sql import functions as F

from coies_spark.ops.kg import (
    assertion_clauses,
    cue_pattern,
    pattern_triples,
    pattern_triples_asserted,
)

pytestmark = pytest.mark.spark

RULES = [("scans", r"(\w+) scan (\w+)")]


def _tt(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )


class TestAssertionClauses:
    def test_split_flags_and_indexes(self, spark):
        t = _tt(spark, [
            ("c1", 0, "alice scan table. bob did not scan index; "
                      "if carol scan log!"),
        ])
        rows = {
            r.clause_idx: r for r in assertion_clauses(t).collect()
        }
        assert rows[0].clause == "alice scan table"
        assert (rows[0].negated, rows[0].hedged, rows[0].assertive) == (
            False, False, True)
        assert rows[1].clause == "bob did not scan index"
        assert rows[1].negated and not rows[1].hedged
        assert rows[2].clause == "if carol scan log"
        assert rows[2].hedged and not rows[2].negated
        assert not rows[1].assertive and not rows[2].assertive

    def test_empty_clauses_drop_but_keep_original_index(self, spark):
        t = _tt(spark, [("c1", 0, "one..two")])
        got = sorted(
            (r.clause_idx, r.clause)
            for r in assertion_clauses(t).collect()
        )
        assert got == [(0, "one"), (2, "two")]

    def test_case_insensitive_and_word_boundary(self, spark):
        t = _tt(spark, [
            ("c1", 0, "Never trust defaults"),
            ("c2", 0, "nothing matches here"),
            ("c3", 0, "the knot held"),
        ])
        got = {
            r.conv_id: r.negated for r in assertion_clauses(t).collect()
        }
        assert got == {"c1": True, "c2": False, "c3": False}

    def test_null_text_contributes_nothing(self, spark):
        t = _tt(spark, [("c1", 0, None), ("c2", 0, "ok")])
        assert assertion_clauses(t).count() == 1

    def test_cue_pattern_rejects_metacharacters(self, spark):
        with pytest.raises(ValueError):
            cue_pattern(("no", "a.b"))
        with pytest.raises(ValueError):
            cue_pattern(("it's",))


class TestPatternTriplesAsserted:
    def test_negated_clause_emits_nothing(self, spark):
        t = _tt(spark, [
            ("c1", 0, "alice scan table. bob did not scan index."),
        ])
        got = {
            (r.subj, r.pred, r.obj)
            for r in pattern_triples_asserted(t, RULES).collect()
        }
        assert got == {("alice", "scans", "table")}
        # the ungated extractor DOES emit the negated fact
        raw = {
            (r.subj, r.pred, r.obj)
            for r in pattern_triples(t, RULES).collect()
        }
        assert ("not", "scans", "index") in raw or (
            "bob", "scans", "index") not in got

    def test_rules_cannot_match_across_clause_boundary(self, spark):
        # "alice scan" ends a clause; "table" starts the next — the
        # rule needs both sides in ONE clause to fire
        t = _tt(spark, [("c1", 0, "alice scan. table ready")])
        assert pattern_triples_asserted(t, RULES).count() == 0

    def test_hedged_clause_gated(self, spark):
        t = _tt(spark, [
            ("c1", 0, "maybe alice scan table"),
            ("c2", 0, "alice scan table"),
        ])
        got = {
            r.conv_id
            for r in pattern_triples_asserted(t, RULES).collect()
        }
        assert got == {"c2"}

    def test_plan_zero_shuffle(self, spark):
        t = _tt(spark, [("c1", 0, "alice scan table")])
        plan = (
            pattern_triples_asserted(t, RULES)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
