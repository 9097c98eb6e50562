"""Twentieth batch: SPARQL sequence property paths (ops.kg) and the
degree-distribution gauge (operators.graph)."""

import pytest
from pyspark.sql import functions as F

from coies_spark.operators.graph import degree_histogram
from coies_spark.ops.kg import path_query

pytestmark = pytest.mark.spark


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )


class TestPathQuery:
    def _kg(self, spark):
        return _triples(spark, [
            ("alice", "works_at", "acme"),
            ("bob", "works_at", "acme"),
            ("carol", "works_at", "globex"),
            ("acme", "based_in", "springfield"),
            ("globex", "based_in", "shelbyville"),
            ("springfield", "in_state", "ns"),
        ])

    def test_two_hop_sequence(self, spark):
        got = {
            (r.start, r.end)
            for r in path_query(
                self._kg(spark), ("works_at", "based_in")
            ).collect()
        }
        assert got == {
            ("alice", "springfield"),
            ("bob", "springfield"),
            ("carol", "shelbyville"),
        }

    def test_three_hop_and_start_filter(self, spark):
        got = path_query(
            self._kg(spark),
            ("works_at", "based_in", "in_state"),
            start="alice",
        ).collect()
        assert [(r.start, r.end) for r in got] == [("alice", "ns")]

    def test_single_hop_is_the_predicate_table(self, spark):
        got = {
            (r.start, r.end)
            for r in path_query(self._kg(spark), ("based_in",)).collect()
        }
        assert got == {
            ("acme", "springfield"), ("globex", "shelbyville"),
        }

    def test_diamond_multiplicity_collapses(self, spark):
        kg = _triples(spark, [
            ("x", "p", "m1"), ("x", "p", "m2"),
            ("m1", "q", "y"), ("m2", "q", "y"),
        ])
        got = path_query(kg, ("p", "q")).collect()
        assert [(r.start, r.end) for r in got] == [("x", "y")]

    def test_empty_path_rejected(self, spark):
        with pytest.raises(ValueError):
            path_query(self._kg(spark), ())

    def test_broken_chain_is_empty(self, spark):
        assert path_query(
            self._kg(spark), ("in_state", "works_at")
        ).count() == 0


class TestDegreeHistogram:
    def test_star_graph(self, spark):
        edges = spark.createDataFrame(
            [("hub", f"leaf{i}") for i in range(4)],
            "src string, dst string",
        )
        got = {r.degree: r.n_nodes for r in degree_histogram(edges).collect()}
        assert got == {4: 1, 1: 4}

    def test_parallel_edges_and_directions_collapse(self, spark):
        edges = spark.createDataFrame(
            [("a", "b"), ("a", "b"), ("b", "a")],
            "src string, dst string",
        )
        got = {r.degree: r.n_nodes for r in degree_histogram(edges).collect()}
        assert got == {1: 2}

    def test_self_loop_counts_once(self, spark):
        edges = spark.createDataFrame(
            [("a", "a"), ("a", "b")], "src string, dst string"
        )
        got = {r.degree: r.n_nodes for r in degree_histogram(edges).collect()}
        # a: neighbours {a, b} -> degree 2; b: {a} -> degree 1
        assert got == {2: 1, 1: 1}
