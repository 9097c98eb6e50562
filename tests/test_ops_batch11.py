"""Eleventh-batch operators: numeric profiling (ops.profile), the
binned keyless interval join (ops.relational), and the PR-curve
threshold sweep (ops.classify)."""

import pytest
from pyspark.sql import functions as F

from coies_spark.ops.classify import pr_curve
from coies_spark.ops.profile import numeric_profile
from coies_spark.ops.relational import interval_join

pytestmark = pytest.mark.spark


class TestNumericProfile:
    def test_uniform_interpolation_is_near_exact(self, spark):
        u = spark.createDataFrame(
            [(i, float(i)) for i in range(1000)],
            "id long, value double",
        )
        r = numeric_profile(u, "value").collect()[0]
        assert (r.n, r.n_null, r.mn, r.mx) == (1000, 0, 0.0, 999.0)
        assert r.mean == 499.5
        # uniform data: histogram interpolation within one bin width
        assert abs(r.p50 - 499.5) < 1e-6
        assert abs(r.p90 - 899.1) < 999.0 / 32
        assert abs(r.p99 - 989.01) < 999.0 / 32

    def test_skewed_data_within_bin_width(self, spark):
        import numpy as np

        vals = [float((i * i) % 7919) for i in range(2000)]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)],
            "id long, value double",
        )
        r = numeric_profile(df, "value", bins=64).collect()[0]
        width = (max(vals) - min(vals)) / 64
        for q, col in [(50, r.p50), (90, r.p90), (99, r.p99)]:
            exact = float(np.percentile(np.array(vals), q))
            assert abs(col - exact) <= width, (q, col, exact)

    def test_constant_column(self, spark):
        df = spark.createDataFrame(
            [(1, 5.0), (2, 5.0), (3, None)], "id long, value double"
        )
        r = numeric_profile(df, "value").collect()[0]
        assert (r.n, r.n_null) == (2, 1)
        assert r.p50 == r.p90 == r.p99 == 5.0

    def test_empty_and_all_null(self, spark):
        e = spark.createDataFrame([], "id long, value double")
        r = numeric_profile(e, "value").collect()[0]
        assert (r.n, r.n_null) == (0, 0)
        assert r.p50 is None and r.mean is None
        a = spark.createDataFrame(
            [(1, None), (2, None)], "id long, value double"
        )
        r = numeric_profile(a, "value").collect()[0]
        assert (r.n, r.n_null) == (0, 2)
        assert r.p99 is None

    def test_merge_property(self, spark):
        # histogram counts ADD: profiling the union equals profiling
        # once — the mergeable-sketch property the docstring claims
        # (same global mn/mx grid is what makes it true here)
        df = spark.createDataFrame(
            [(i, float(i % 97)) for i in range(500)],
            "id long, value double",
        )
        whole = numeric_profile(df, "value").collect()[0]
        double_scan = numeric_profile(
            df.unionByName(df), "value"
        ).collect()[0]
        assert whole.p50 == double_scan.p50
        assert whole.p99 == double_scan.p99

    def test_guards(self, spark):
        df = spark.createDataFrame([(1, 1.0)], "id long, value double")
        with pytest.raises(ValueError):
            numeric_profile(df, "value", bins=1)
        with pytest.raises(ValueError):
            numeric_profile(df, "value", quantiles=(0.0,))


def _ivs(spark, rows, side):
    return spark.createDataFrame(
        rows, f"id_{side} string, from_{side} long, to_{side} long"
    )


class TestIntervalJoin:
    def test_hand_overlaps(self, spark):
        L = _ivs(spark, [("a", 0, 100), ("b", 200, 300),
                         ("c", 250, 260)], "a")
        R = _ivs(spark, [("x", 50, 220), ("y", 500, 600),
                         ("z", 255, 256)], "b")
        got = {
            (r.id_a, r.id_b): (r.overlap_from, r.overlap_to)
            for r in interval_join(L, R, bin_s=50).collect()
        }
        assert got == {
            ("a", "x"): (50, 100),
            ("b", "x"): (200, 220),
            ("b", "z"): (255, 256),
            ("c", "z"): (255, 256),
        }

    def test_bin_width_invariance(self, spark):
        # the pair set must not depend on bin_s (only the plan does)
        import random

        rng = random.Random(3)
        L = _ivs(
            spark,
            [(f"a{i}", s, s + rng.randint(1, 50))
             for i, s in enumerate(rng.sample(range(1000), 40))],
            "a",
        )
        R = _ivs(
            spark,
            [(f"b{i}", s, s + rng.randint(1, 80))
             for i, s in enumerate(rng.sample(range(1000), 40))],
            "b",
        )
        sets = [
            {tuple(r) for r in interval_join(L, R, bin_s=w).collect()}
            for w in (7, 64, 1000)
        ]
        assert sets[0] == sets[1] == sets[2]
        assert len(sets[0]) > 0

    def test_touching_intervals_excluded(self, spark):
        L = _ivs(spark, [("a", 0, 10)], "a")
        R = _ivs(spark, [("x", 10, 20)], "b")
        assert interval_join(L, R, bin_s=5).count() == 0

    def test_empty_interval_dropped(self, spark):
        L = _ivs(spark, [("a", 10, 10), ("b", 5, 6)], "a")
        R = _ivs(spark, [("x", 0, 20)], "b")
        got = {r.id_a for r in interval_join(L, R, bin_s=4).collect()}
        assert got == {"b"}

    def test_plan_is_equi_join(self, spark):
        L = _ivs(spark, [("a", 0, 100)], "a")
        R = _ivs(spark, [("x", 50, 220)], "b")
        plan = (
            interval_join(L, R, bin_s=50)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_guard(self, spark):
        L = _ivs(spark, [("a", 0, 1)], "a")
        with pytest.raises(ValueError):
            interval_join(L, L, bin_s=0)


class TestPRCurve:
    def _scored(self, spark):
        rows = [(0.9, 1.0), (0.8, 1.0), (0.7, 0.0), (0.6, 1.0),
                (0.5, 0.0), (0.5, 0.0), (0.4, None)]
        return spark.createDataFrame(rows, "p double, y double")

    def test_hand_curve(self, spark):
        got = {
            r.threshold: (r.tp, r.fp, r.precision, r.recall)
            for r in pr_curve(self._scored(spark)).collect()
        }
        assert got[0.9] == (1, 0, 1.0, 0.333333)
        assert got[0.8] == (2, 0, 1.0, 0.666667)
        assert got[0.7] == (2, 1, 0.666667, 0.666667)
        assert got[0.6] == (3, 1, 0.75, 1.0)
        assert got[0.5] == (3, 3, 0.5, 1.0)
        assert 0.4 not in got  # unlabeled rows excluded

    def test_grid_quantization_merges_levels(self, spark):
        rows = [(0.5001, 1.0), (0.5004, 0.0), (0.9, 1.0)]
        df = spark.createDataFrame(rows, "p double, y double")
        got = {r.threshold for r in pr_curve(df, grid_dp=3).collect()}
        assert got == {0.5, 0.9}

    def test_all_negative_has_null_recall(self, spark):
        df = spark.createDataFrame(
            [(0.7, 0.0), (0.3, 0.0)], "p double, y double"
        )
        for r in pr_curve(df).collect():
            assert r.recall is None
            assert r.precision == 0.0

    def test_guard(self, spark):
        with pytest.raises(ValueError):
            pr_curve(self._scored(spark), grid_dp=0)
