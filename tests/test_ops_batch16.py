"""Sixteenth batch: RDFS-lite entailment — subclass transitive
closure (rdfs11), type inheritance (rdfs9), and inverse/symmetric
predicate materialization (owl:inverseOf / owl:SymmetricProperty)."""

import pytest
from pyspark.sql import functions as F

from coies_spark.ops.kg import (
    inherit_types,
    materialize_inverses,
    subclass_closure,
)

pytestmark = pytest.mark.spark


def _edges(spark, rows):
    return spark.createDataFrame(rows, "sub string, sup string")


class TestSubclassClosure:
    def test_chain_closure_with_min_depth(self, spark):
        # a < b < c < d: closure has all 6 ancestor pairs
        e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
        got = {
            (r.sub, r.sup): r.depth
            for r in subclass_closure(e, max_depth=4).collect()
        }
        assert got == {
            ("a", "b"): 1, ("b", "c"): 1, ("c", "d"): 1,
            ("a", "c"): 2, ("b", "d"): 2, ("a", "d"): 3,
        }

    def test_doubling_reaches_deep_chains(self, spark):
        # depth-7 chain: 3 doubling rounds must cover it
        chain = [(f"n{i}", f"n{i+1}") for i in range(7)]
        got = {
            (r.sub, r.sup): r.depth
            for r in subclass_closure(
                _edges(spark, chain), max_depth=8
            ).collect()
        }
        assert got[("n0", "n7")] == 7
        assert len(got) == 7 * 8 // 2  # all i<j pairs

    def test_max_depth_caps_output(self, spark):
        chain = [(f"n{i}", f"n{i+1}") for i in range(7)]
        got = subclass_closure(_edges(spark, chain), max_depth=2)
        assert got.agg(F.max("depth")).collect()[0][0] == 2
        assert ("n0", "n3") not in {
            (r.sub, r.sup) for r in got.collect()
        }

    def test_cycle_is_harmless_and_irreflexive(self, spark):
        e = _edges(spark, [("a", "b"), ("b", "a"), ("b", "c")])
        got = {
            (r.sub, r.sup): r.depth
            for r in subclass_closure(e, max_depth=4).collect()
        }
        assert ("a", "a") not in got and ("b", "b") not in got
        assert got[("a", "b")] == 1 and got[("b", "a")] == 1
        assert got[("a", "c")] == 2

    def test_dag_multiple_superclasses(self, spark):
        e = _edges(spark, [("x", "p1"), ("x", "p2"), ("p1", "r"),
                           ("p2", "r")])
        got = {
            (r.sub, r.sup): r.depth
            for r in subclass_closure(e, max_depth=4).collect()
        }
        assert got[("x", "r")] == 2  # min over the two paths

    def test_rejects_bad_depth(self, spark):
        with pytest.raises(ValueError):
            subclass_closure(_edges(spark, [("a", "b")]), max_depth=0)


class TestInheritTypes:
    def test_inheritance_and_provenance(self, spark):
        closure = subclass_closure(
            _edges(spark, [("cat", "mammal"), ("mammal", "animal")]),
            max_depth=4,
        )
        types = spark.createDataFrame(
            [("tom", "cat"), ("rex", "mammal")],
            "entity string, cls string",
        )
        got = {
            (r.entity, r.cls): r.direct
            for r in inherit_types(types, closure).collect()
        }
        assert got == {
            ("tom", "cat"): True,
            ("tom", "mammal"): False,
            ("tom", "animal"): False,
            ("rex", "mammal"): True,
            ("rex", "animal"): False,
        }

    def test_assertion_wins_over_derivation(self, spark):
        closure = subclass_closure(
            _edges(spark, [("cat", "mammal")]), max_depth=2
        )
        types = spark.createDataFrame(
            [("tom", "cat"), ("tom", "mammal")],  # mammal asserted too
            "entity string, cls string",
        )
        got = {
            (r.entity, r.cls): r.direct
            for r in inherit_types(types, closure).collect()
        }
        assert got[("tom", "mammal")] is True


class TestMaterializeInverses:
    def _triples(self, spark, rows):
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string"
        )

    def test_inverse_rule_mirrors(self, spark):
        t = self._triples(spark, [("c1", "mentions", "spark")])
        got = {
            (r.subj, r.pred, r.obj): r.inferred
            for r in materialize_inverses(
                t, {"mentions": "mentioned_in"}
            ).collect()
        }
        assert got == {
            ("c1", "mentions", "spark"): False,
            ("spark", "mentioned_in", "c1"): True,
        }

    def test_symmetric_predicate(self, spark):
        t = self._triples(spark, [("a", "related_to", "b")])
        got = {
            (r.subj, r.pred, r.obj): r.inferred
            for r in materialize_inverses(
                t, {}, symmetric=("related_to",)
            ).collect()
        }
        assert got[("b", "related_to", "a")] is True
        assert got[("a", "related_to", "b")] is False

    def test_asserted_mirror_stays_asserted(self, spark):
        t = self._triples(
            spark,
            [("a", "related_to", "b"), ("b", "related_to", "a")],
        )
        got = {
            (r.subj, r.pred, r.obj): r.inferred
            for r in materialize_inverses(
                t, {}, symmetric=("related_to",)
            ).collect()
        }
        assert got[("b", "related_to", "a")] is False

    def test_unruled_predicates_pass_through(self, spark):
        t = self._triples(spark, [("a", "other", "b")])
        out = materialize_inverses(t, {"mentions": "mentioned_in"})
        assert [
            (r.subj, r.pred, r.obj, r.inferred) for r in out.collect()
        ] == [("a", "other", "b", False)]

    def test_rejects_conflicting_and_empty_rules(self, spark):
        t = self._triples(spark, [("a", "p", "b")])
        with pytest.raises(ValueError):
            materialize_inverses(t, {"p": "q"}, symmetric=("p",))
        with pytest.raises(ValueError):
            materialize_inverses(t, {})
