"""Twenty-first batch: AMIE-lite path-rule mining (ops.kg) and
PMI-weighted co-occurrence edges (operators.graph)."""

import math

import pytest
from pyspark.sql import functions as F

from coies_spark.operators.graph import pmi_edges
from coies_spark.ops.kg import mine_path_rules

pytestmark = pytest.mark.spark


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )


class TestMinePathRules:
    def test_perfect_rule(self, spark):
        # born_in(x,y) ∧ capital_of^-1 ... keep simple:
        # works_at(x,y) ∧ based_in(y,z) => lives_in(x,z) for both x
        t = _triples(spark, [
            ("a", "works_at", "acme"), ("b", "works_at", "acme"),
            ("acme", "based_in", "spf"),
            ("a", "lives_in", "spf"), ("b", "lives_in", "spf"),
        ])
        rules = {
            (r.p1, r.p2, r.p3): r
            for r in mine_path_rules(t).collect()
        }
        r = rules[("works_at", "based_in", "lives_in")]
        assert (r.n_paths, r.support, r.confidence) == (2, 2, 1.0)

    def test_partial_confidence(self, spark):
        t = _triples(spark, [
            ("a", "p", "m"), ("b", "p", "m"),
            ("m", "q", "z"),
            ("a", "r", "z"),  # only a has the shortcut
        ])
        rules = {
            (r.p1, r.p2, r.p3): r
            for r in mine_path_rules(t).collect()
        }
        r = rules[("p", "q", "r")]
        assert (r.n_paths, r.support) == (2, 1)
        assert r.confidence == 0.5

    def test_min_support_filters(self, spark):
        t = _triples(spark, [
            ("a", "p", "m"), ("m", "q", "z"), ("a", "r", "z"),
        ])
        got = mine_path_rules(t, min_support=2).collect()
        assert ("p", "q", "r") not in {
            (r.p1, r.p2, r.p3) for r in got
        }
        with pytest.raises(ValueError):
            mine_path_rules(t, min_support=0)

    def test_duplicate_assertions_collapse(self, spark):
        t = _triples(spark, [
            ("a", "p", "m"), ("a", "p", "m"),
            ("m", "q", "z"), ("a", "r", "z"),
        ])
        r = {
            (x.p1, x.p2, x.p3): x for x in mine_path_rules(t).collect()
        }[("p", "q", "r")]
        assert (r.n_paths, r.support, r.confidence) == (1, 1, 1.0)


class TestPmiEdges:
    def _df(self, spark):
        # 4 groups; x,y always together (2 groups); z everywhere
        rows = [
            ("g1", "x"), ("g1", "y"), ("g1", "z"),
            ("g2", "x"), ("g2", "y"), ("g2", "z"),
            ("g3", "z"), ("g4", "z"),
        ]
        return spark.createDataFrame(rows, "g string, v string")

    def test_pmi_values(self, spark):
        out = {
            (r.a, r.b): r for r in pmi_edges(self._df(spark), "g", "v").collect()
        }
        xy = out[("x", "y")]
        assert (xy.n_ab, xy.n_a, xy.n_b) == (2, 2, 2)
        assert xy.pmi == pytest.approx(round(math.log(2 * 4 / 4), 6))
        xz = out[("x", "z")]
        # x,z co-occur exactly as chance predicts: pmi 0
        assert xz.pmi == pytest.approx(0.0)

    def test_membership_multiplicity_ignored(self, spark):
        df = spark.createDataFrame(
            [("g1", "x"), ("g1", "x"), ("g1", "y")], "g string, v string"
        )
        row = pmi_edges(df, "g", "v").collect()[0]
        assert (row.n_ab, row.n_a, row.n_b) == (1, 1, 1)

    def test_min_pairs_filter(self, spark):
        out = pmi_edges(self._df(spark), "g", "v", min_pairs=2)
        assert {(r.a, r.b) for r in out.collect()} == {
            ("x", "y"), ("x", "z"), ("y", "z"),
        }
        with pytest.raises(ValueError):
            pmi_edges(self._df(spark), "g", "v", min_pairs=0)
