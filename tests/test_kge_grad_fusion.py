"""The fused per-epoch gradient aggregate (`_grad_sum_fused` /
`_cx_grad_sum_fused`) must be bit-identical to the two separate
`_grad_sum` / `_cx_grad_sum` shuffles it replaces — including when an
id names BOTH an entity and a relation (the tag keeps the groups
disjoint)."""

from pyspark.sql import functions as F

from coies_spark.ops.kge import (
    _cx_grad_sum,
    _cx_grad_sum_fused,
    _grad_sum,
    _grad_sum_fused,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestGradSumFused:
    def test_matches_separate_sums_with_id_collision(self, spark):
        # "x" appears as an entity AND a relation id — the fused
        # aggregate must not cross-sum the two namespaces
        ge = spark.createDataFrame(
            [
                ("x", [0.125, -0.25]),
                ("x", [1.0, 2.0]),
                ("y", [0.5, 0.5]),
            ],
            "id string, g array<double>",
        )
        gr = spark.createDataFrame(
            [("x", [10.0, 20.0]), ("p", [0.0625, -0.125])],
            "id string, g array<double>",
        )
        fe, fr = _grad_sum_fused(ge, gr, dim=2, n_triples=4)
        assert _rows(fe) == _rows(_grad_sum(ge, 2, 4))
        assert _rows(fr) == _rows(_grad_sum(gr, 2, 4))

    def test_two_channel_matches_separate_sums(self, spark):
        ge = spark.createDataFrame(
            [
                ("a", [0.25, 0.5], [-0.5, 0.125]),
                ("a", [1.0, -1.0], [2.0, -2.0]),
                ("b", [0.0, 0.0], [0.5, 0.25]),
            ],
            "id string, gr array<double>, gi array<double>",
        )
        gr = spark.createDataFrame(
            [("a", [4.0, 8.0], [16.0, 32.0])],
            "id string, gr array<double>, gi array<double>",
        )
        fe, fr = _cx_grad_sum_fused(ge, gr, dim=2, n_triples=3)
        assert _rows(fe) == _rows(_cx_grad_sum(ge, 2, 3))
        assert _rows(fr) == _rows(_cx_grad_sum(gr, 2, 3))

    def test_empty_relation_side(self, spark):
        ge = spark.createDataFrame(
            [("a", [1.0])], "id string, g array<double>"
        )
        gr = ge.where(F.lit(False))
        fe, fr = _grad_sum_fused(ge, gr, dim=1, n_triples=1)
        assert _rows(fe) == [("a", [1.0])]
        assert fr.count() == 0
