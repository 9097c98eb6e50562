"""Thirty-ninth batch: the KG schema/path-feature layer —
``induce_signatures`` (predicate domain/range induction from a
typed-entity table, the inverse of entity_types) and
``pra_path_features`` (Lao & Cohen 2010 per-pair path-type counts
with inverse hops and the hub-midpoint degree guard)."""

import pytest
from pyspark.sql import functions as F

from coies_spark.ops.kg import induce_signatures, pra_path_features

pytestmark = pytest.mark.spark


def _t(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )


def _ty(spark, rows):
    return spark.createDataFrame(rows, "entity string, entity_type string")


class TestInduceSignatures:
    def test_planted_signatures(self, spark):
        t = _t(spark, [
            ("alice", "works_at", "acme"),
            ("bob", "works_at", "globex"),
            ("carol", "works_at", "acme"),
            ("acme", "based_in", "berlin"),
        ])
        ty = _ty(spark, [
            ("alice", "Person"), ("bob", "Person"), ("carol", "Person"),
            ("acme", "Org"), ("globex", "Org"), ("berlin", "City"),
        ])
        got = {r.pred: r for r in induce_signatures(t, ty).collect()}
        w = got["works_at"]
        assert (w.n_triples, w.domain_type, w.domain_votes,
                w.domain_conf) == (3, "Person", 3, 1.0)
        assert (w.range_type, w.range_votes, w.range_conf) == (
            "Org", 3, 1.0)
        b = got["based_in"]
        assert (b.domain_type, b.range_type) == ("Org", "City")

    def test_multi_typed_modal_and_confidence(self, spark):
        # acme is Org AND Employer: each works_at object votes twice,
        # the modal type wins and confidence reflects the split
        t = _t(spark, [
            ("alice", "works_at", "acme"),
            ("bob", "works_at", "acme"),
            ("carol", "works_at", "globex"),
        ])
        ty = _ty(spark, [
            ("acme", "Org"), ("acme", "Employer"), ("globex", "Org"),
        ])
        r = {x.pred: x for x in induce_signatures(t, ty).collect()}[
            "works_at"
        ]
        # votes: Org 3 (acme×2 + globex), Employer 2 → modal Org 3/5
        assert (r.range_type, r.range_votes) == ("Org", 3)
        assert r.range_conf == 0.6
        # subjects never typed → NULL domain side
        assert r.domain_type is None and r.domain_votes is None

    def test_tie_breaks_to_smallest_type(self, spark):
        t = _t(spark, [("a", "p", "x"), ("b", "p", "y")])
        ty = _ty(spark, [("a", "Zeta"), ("b", "Alpha")])
        r = induce_signatures(t, ty).collect()[0]
        assert r.domain_type == "Alpha" and r.domain_votes == 1

    def test_counts_distinct_triples(self, spark):
        t = _t(spark, [("a", "p", "x"), ("a", "p", "x")])
        r = induce_signatures(t, _ty(spark, [("a", "T")])).collect()[0]
        assert r.n_triples == 1 and r.domain_votes == 1


class TestPraPathFeatures:
    def test_planted_paths(self, spark):
        t = _t(spark, [
            ("a", "r1", "b"),
            ("b", "r2", "c"),
            ("a", "r3", "c"),
        ])
        rows = {
            (r.src, r.dst, r.path): r.n_paths
            for r in pra_path_features(t).collect()
        }
        # every edge and its inverse is a length-1 feature
        assert rows[("a", "b", "r1")] == 1
        assert rows[("b", "a", "^r1")] == 1
        assert rows[("c", "a", "^r3")] == 1
        # the 2-hop path a->b->c
        assert rows[("a", "c", "r1/r2")] == 1
        # inverse hops compose: c ->(^r2) b ->(^r1) a
        assert rows[("c", "a", "^r2/^r1")] == 1
        # round trips through the midpoint exist (consumers filter)
        assert rows[("a", "a", "r1/^r1")] == 1

    def test_multiplicity_counts_midpoints(self, spark):
        # two distinct midpoints with the same predicate pair → n=2
        t = _t(spark, [
            ("a", "p", "m1"), ("a", "p", "m2"),
            ("m1", "q", "c"), ("m2", "q", "c"),
        ])
        rows = {
            (r.src, r.dst, r.path): r.n_paths
            for r in pra_path_features(t).collect()
        }
        assert rows[("a", "c", "p/q")] == 2

    def test_no_inverse(self, spark):
        t = _t(spark, [("a", "r1", "b"), ("b", "r2", "c")])
        rows = pra_path_features(t, include_inverse=False).collect()
        assert all("^" not in r.path for r in rows)
        paths = {(r.src, r.dst, r.path) for r in rows}
        assert ("a", "c", "r1/r2") in paths
        assert ("b", "a", "^r1") not in paths

    def test_max_degree_drops_hub_midpoints(self, spark):
        # hub has augmented out-degree 8 (4 out + 4 inverse-in);
        # spoke-to-spoke 2-hop paths exist only through it
        t = _t(spark, [(f"s{i}", "p", "hub") for i in range(4)]) \
            .unionByName(
                _t(spark, [("hub", "q", f"t{i}") for i in range(4)])
            )
        full = pra_path_features(t)
        capped = pra_path_features(t, max_degree=7)
        assert full.where(F.col("path") == "p/q").count() == 16
        assert capped.where(F.col("path") == "p/q").count() == 0
        # length-1 features survive the cap (it gates midpoints only)
        assert capped.where(F.col("path") == "p").count() == 4

    def test_max_degree_validation(self, spark):
        with pytest.raises(ValueError):
            pra_path_features(_t(spark, [("a", "p", "b")]), max_degree=0)
