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


class TestNumericTriples:
    NRULES = [
        ("ships_qty", r"(\w+) ships (\d+) (units)"),
        ("waits_s", r"(\w+) waits (\d+) (ms|s|min)"),
    ]

    def _units(self, spark):
        return spark.createDataFrame(
            [("units", 1.0), ("ms", 0.001), ("s", 1.0), ("min", 60.0)],
            ["unit", "factor"],
        )

    def test_extracts_and_normalizes(self, spark):
        from coies_spark.ops.kg import numeric_triples

        t = _tt(spark, [
            ("c1", 0, "p1 ships 5 units, then p1 waits 20 ms"),
            ("c2", 0, "p2 waits 3 min"),
        ])
        got = {
            (r.conv_id, r.pred, r.subj): (r.value, r.unit)
            for r in numeric_triples(
                t, self.NRULES, self._units(spark)
            ).collect()
        }
        assert got[("c1", "ships_qty", "p1")] == (5.0, "units")
        assert got[("c1", "waits_s", "p1")] == (0.02, "ms")
        assert got[("c2", "waits_s", "p2")] == (180.0, "min")

    def test_unknown_unit_drops(self, spark):
        from coies_spark.ops.kg import numeric_triples

        t = _tt(spark, [("c1", 0, "p1 waits 9 s")])
        units = spark.createDataFrame(
            [("ms", 0.001)], ["unit", "factor"]
        )
        assert numeric_triples(t, self.NRULES, units).count() == 0

    def test_multiple_matches_per_turn(self, spark):
        from coies_spark.ops.kg import numeric_triples

        t = _tt(spark, [
            ("c1", 0, "p1 ships 2 units and p2 ships 3 units"),
        ])
        vals = sorted(
            r.value
            for r in numeric_triples(
                t, self.NRULES, self._units(spark)
            ).collect()
        )
        assert vals == [2.0, 3.0]

    def test_rule_group_validation(self, spark):
        from coies_spark.ops.kg import numeric_triples

        with pytest.raises(ValueError):
            numeric_triples(
                _tt(spark, [("c", 0, "x")]),
                [("bad", r"(\w+) ships (\d+)")],
                self._units(spark),
            )

    def test_composes_with_assertion_gate(self, spark):
        from coies_spark.ops.kg import assertion_clauses, numeric_triples

        t = _tt(spark, [
            ("c1", 0, "p1 ships 5 units. p2 did not ship, "
                      "p2 waits 10 s"),
        ])
        gated = numeric_triples(
            assertion_clauses(t)
            .where("assertive")
            .select(
                "conv_id", "turn_idx", F.col("clause").alias("text")
            ),
            self.NRULES,
            self._units(spark),
        )
        got = {(r.pred, r.subj) for r in gated.collect()}
        assert got == {("ships_qty", "p1")}
