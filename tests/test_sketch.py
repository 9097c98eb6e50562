"""Mergeable sketches: HyperLogLog registers/estimate and Count-Min
registers/point queries (ops/sketch.py) — integer-exact builds, merge
laws, determinism across partitionings, and a pure-Python register
parity check."""

import hashlib

import pytest
from pyspark.sql import functions as F

from coies_spark.ops import sketch


def _keys(spark, n, prefix="k"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("key")
    )


def test_hll_registers_python_parity(spark):
    df = _keys(spark, 200)
    got = {
        r.bucket: r.max_rho
        for r in sketch.hll_registers(df, "key", p=8).collect()
    }
    exp = {}
    for i in range(200):
        h = hashlib.md5(f"k{i}".encode()).hexdigest()
        hi, lo = int(h[:8], 16), int(h[8:16], 16)
        rho = 33 if lo == 0 else 33 - lo.bit_length()
        b = hi % 256
        exp[b] = max(exp.get(b, 0), rho)
    assert got == exp


def test_hll_estimate_accuracy_and_small_range(spark):
    big = sketch.hll_estimate(
        sketch.hll_registers(_keys(spark, 5000), "key", p=12), p=12
    ).collect()[0]
    # standard error at p=12 is ~1.6%; allow 4 sigma
    assert abs(big.estimate - 5000) / 5000 < 0.07
    small = sketch.hll_estimate(
        sketch.hll_registers(_keys(spark, 10), "key", p=12), p=12
    ).collect()[0]
    # linear-counting regime: near-exact for 10 << 4096
    assert abs(small.estimate - 10) < 1


def test_hll_union_merge_law(spark):
    a = _keys(spark, 300, "a")
    b = _keys(spark, 300, "b").union(_keys(spark, 100, "a"))  # overlap
    merged = (
        sketch.hll_registers(a, "key", p=8)
        .unionByName(sketch.hll_registers(b, "key", p=8))
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    direct = sketch.hll_registers(a.union(b), "key", p=8)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hll_deterministic_across_partitionings(spark):
    df = _keys(spark, 500)
    a = sketch.hll_estimate(
        sketch.hll_registers(df.coalesce(1), "key")
    ).collect()
    b = sketch.hll_estimate(
        sketch.hll_registers(df.repartition(13), "key")
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_hll_empty_input_estimates_zero(spark):
    empty = spark.createDataFrame([], "key string")
    got = sketch.hll_estimate(sketch.hll_registers(empty, "key")).collect()
    assert [tuple(r) for r in got] == [(0.0, 0)]


def test_hll_guards(spark):
    df = _keys(spark, 5)
    with pytest.raises(ValueError):
        sketch.hll_registers(df, "key", p=3)
    with pytest.raises(ValueError):
        sketch.hll_estimate(df, p=19)


def test_cms_point_estimates_exact_at_low_load(spark):
    # 3 distinct keys into 4x256 registers: collisions are md5-fixed;
    # with this tiny load the estimates equal the true counts
    rows = [("x",)] * 7 + [("y",)] * 3 + [("z",)] * 1
    df = spark.createDataFrame(rows, "key string")
    regs = sketch.cms_registers(df, "key")
    probes = spark.createDataFrame(
        [("x",), ("y",), ("z",), ("absent",)], "key string"
    )
    got = {r.key: r.est for r in sketch.cms_query(regs, probes).collect()}
    assert got == {"x": 7, "y": 3, "z": 1, "absent": 0}


def test_cms_never_underestimates(spark):
    # heavy load on a narrow sketch: estimates may exceed, never trail
    df = _keys(spark, 500).withColumn("key", F.col("key"))
    regs = sketch.cms_registers(df, "key", depth=2, width=16)
    probes = _keys(spark, 20)
    got = sketch.cms_query(regs, probes, depth=2, width=16).collect()
    assert all(r.est >= 1 for r in got)


def test_cms_weighted_and_merge_law(spark):
    a = spark.createDataFrame([("x", 5), ("y", 2)], "key string, w int")
    b = spark.createDataFrame([("x", 1)], "key string, w int")
    ra = sketch.cms_registers(a, "key", weight=F.col("w"))
    rb = sketch.cms_registers(b, "key", weight=F.col("w"))
    merged = (
        ra.unionByName(rb)
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = sketch.cms_registers(
        a.union(b), "key", weight=F.col("w")
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    probes = spark.createDataFrame([("x",), ("y",)], "key string")
    got = {r.key: r.est for r in sketch.cms_query(merged, probes).collect()}
    assert got == {"x": 6, "y": 2}


def test_cms_guards(spark):
    df = spark.createDataFrame([("x",)], "key string")
    with pytest.raises(ValueError):
        sketch.cms_registers(df, "key", depth=0)
