"""Thirty-fourth batch: the fixed-grid histogram sketch — the
quantile member of the mergeable-summary family (HLL distinct, CMS
frequency, Bloom membership).  Mergeability, error-bound honesty,
edge-bin clamping, degenerate grids, and self-describing grid rows."""

import pytest
from pyspark.sql import functions as F

from coies_spark.ops.sketch import histogram_quantiles, histogram_registers

pytestmark = pytest.mark.spark

GRID = dict(n_bins=64, lo=0.0, hi=1000.0)


def _vals(spark, a=1, b=1001):
    return spark.range(a, b).select(
        F.col("id").cast("double").alias("value")
    )


class TestHistogramSketch:
    def test_register_count_bounded(self, spark):
        reg = histogram_registers(_vals(spark), **GRID)
        assert reg.count() <= 64
        assert reg.agg(F.sum("n")).first()[0] == 1000

    def test_merge_equals_whole(self, spark):
        v = _vals(spark)
        whole = histogram_registers(v, **GRID)
        h1 = histogram_registers(v.where("value <= 500"), **GRID)
        h2 = histogram_registers(v.where("value > 500"), **GRID)
        merged = (
            h1.unionByName(h2)
            .groupBy("bin", "lo", "hi", "n_bins")
            .agg(F.sum("n").cast("long").alias("n"))
        )
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect())
        )

    def test_estimates_within_err_bound(self, spark):
        import numpy as np

        data = sorted(float(x) for x in range(1, 1001))
        reg = histogram_registers(_vals(spark), **GRID)
        out = histogram_quantiles(reg, [0.25, 0.5, 0.9, 0.99]).collect()
        for r in out:
            exact = float(
                np.quantile(np.array(data), r.q, method="inverted_cdf")
            )
            assert abs(r.estimate - exact) <= r.err_bound + 1e-9, (
                r,
                exact,
            )

    def test_out_of_range_clamps_to_edge_bins(self, spark):
        v = spark.createDataFrame(
            [(-50.0,), (2000.0,), (500.0,)], "value double"
        )
        reg = {r.bin: r.n for r in histogram_registers(v, **GRID).collect()}
        assert reg[0] == 1 and reg[63] == 1 and reg[32] == 1

    def test_degenerate_constant_column(self, spark):
        v = spark.range(5).select(F.lit(7.0).alias("value"))
        reg = histogram_registers(v, n_bins=8)  # auto grid: lo == hi
        out = histogram_quantiles(reg, [0.5]).collect()
        assert out == [pytest.approx((0.5, 7.0, 0.0))] or (
            out[0].estimate == 7.0 and out[0].err_bound == 0.0
        )

    def test_mismatched_grids_stay_separate(self, spark):
        v = _vals(spark)
        g1 = histogram_registers(v, n_bins=64, lo=0.0, hi=1000.0)
        g2 = histogram_registers(v, n_bins=64, lo=0.0, hi=2000.0)
        merged = (
            g1.unionByName(g2)
            .groupBy("bin", "lo", "hi")
            .agg(F.sum("n").alias("n"))
        )
        # self-describing rows: the bad merge is VISIBLE as two grids
        assert merged.select("lo", "hi").distinct().count() == 2

    def test_partitioning_invariance(self, spark):
        v = _vals(spark)
        a = sorted(
            map(tuple, histogram_registers(v, **GRID).collect())
        )
        b = sorted(
            map(
                tuple,
                histogram_registers(v.repartition(7), **GRID).collect(),
            )
        )
        assert a == b

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            histogram_registers(_vals(spark), n_bins=0)
        reg = histogram_registers(_vals(spark), **GRID)
        with pytest.raises(ValueError):
            histogram_quantiles(reg, [])
        with pytest.raises(ValueError):
            histogram_quantiles(reg, [1.5])
