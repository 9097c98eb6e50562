"""Eighteenth batch: embedding-level benchmark decontamination
(ops.similarity), per-language BPE fertility (ops.bpe), and the
two-phase prefix-sum shard packer (ops.maintenance)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from coies_spark.ops.bpe import bpe_fertility
from coies_spark.ops.maintenance import (
    _quantile_order_buckets,
    exclusive_prefix_sum,
    shard_plan,
)
from coies_spark.ops.similarity import semantic_contamination

pytestmark = pytest.mark.spark


class TestSemanticContamination:
    def _corpus(self, spark):
        return spark.createDataFrame(
            [
                (0, [1.0, 0.0, 0.0]),
                (1, [0.99, 0.14, 0.0]),   # near-copy of bench 10
                (2, [0.0, 1.0, 0.0]),
                (3, [0.0, 0.0, 1.0]),
            ],
            "vec_id long, embedding array<double>",
        )

    def _bench(self, spark):
        return spark.createDataFrame(
            [(10, [1.0, 0.0, 0.0])],
            "bench_id long, embedding array<double>",
        )

    def test_flags_planted_leak_and_self(self, spark):
        out = {
            (r.vec_id, r.bench_id): r.sim
            for r in semantic_contamination(
                self._corpus(spark), self._bench(spark), threshold=0.9
            ).collect()
        }
        assert set(out) == {(0, 10), (1, 10)}
        assert out[(0, 10)] == 1.0
        assert out[(1, 10)] >= 0.98

    def test_orthogonal_vectors_pass(self, spark):
        out = semantic_contamination(
            self._corpus(spark), self._bench(spark), threshold=0.9
        ).collect()
        assert all(r.vec_id not in (2, 3) for r in out)

    def test_threshold_validation(self, spark):
        with pytest.raises(ValueError):
            semantic_contamination(
                self._corpus(spark), self._bench(spark), threshold=0.0
            )


class TestBpeFertility:
    def test_per_language_ratio(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "aa aa", "en"),
                (2, "aa", "en"),
                (3, "bb cc", "fr"),
            ],
            "doc_id long, text string, lang string",
        )
        # one merge: a+a -> aa, so every "aa" word is 1 symbol
        out = {
            r.lang: r
            for r in bpe_fertility(docs, [("a", "a")]).collect()
        }
        en = out["en"]  # 3 words, each "aa" -> 1 symbol
        assert (en.n_docs, en.n_tokens, en.n_symbols) == (2, 3, 3)
        assert en.fertility == 1.0
        fr = out["fr"]  # "bb"/"cc" unmerged: 2 symbols per word
        assert (fr.n_docs, fr.n_tokens, fr.n_symbols) == (1, 2, 4)
        assert fr.fertility == 2.0

    def test_empty_language(self, spark):
        docs = spark.createDataFrame(
            [(1, "", "xx")], "doc_id long, text string, lang string"
        )
        row = bpe_fertility(docs, [("a", "a")]).collect()[0]
        assert row.n_tokens == 0
        assert row.fertility is None


class TestShardPlan:
    def _docs(self, spark, sizes):
        return spark.createDataFrame(
            [(i, s) for i, s in enumerate(sizes)],
            "doc_id long, n_chars long",
        )

    def test_equals_naive_global_scan(self, spark):
        sizes = [30, 70, 10, 90, 50, 20, 40, 60, 80, 35] * 10
        docs = self._docs(spark, sizes)
        got = {
            r.doc_id: r.shard_id
            for r in shard_plan(
                docs, target_bytes=100, n_buckets=7
            ).collect()
        }
        w = Window.orderBy("doc_id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        naive = {
            r.doc_id: r.shard
            for r in docs.select(
                "doc_id",
                F.floor(
                    (F.sum("n_chars").over(w) - F.col("n_chars"))
                    / 100
                ).cast("long").alias("shard"),
            ).collect()
        }
        assert got == naive

    def test_contiguity_and_monotonicity(self, spark):
        docs = self._docs(spark, [40] * 25)
        rows = sorted(
            shard_plan(docs, target_bytes=100, n_buckets=4).collect(),
            key=lambda r: r.doc_id,
        )
        shards = [r.shard_id for r in rows]
        assert shards == sorted(shards)  # never decreases in id order
        # 40-byte docs, 100-byte target, exclusive prefix rule:
        # prev = 0,40,80,120,160,200,... -> shards 0,0,0,1,1,2 (a
        # shard closes once the running total passes its boundary;
        # overflow bounded by one doc)
        assert shards[:6] == [0, 0, 0, 1, 1, 2]

    def test_oversized_doc_gets_own_shard_boundary(self, spark):
        docs = self._docs(spark, [10, 500, 10])
        rows = {
            r.doc_id: r.shard_id
            for r in shard_plan(
                docs, target_bytes=100, n_buckets=2
            ).collect()
        }
        assert rows[0] == 0
        assert rows[1] == 0  # starts before the boundary
        assert rows[2] == 5  # (10+500)//100 — the giant moved the clock

    def test_rejects_bad_params(self, spark):
        docs = self._docs(spark, [10])
        with pytest.raises(ValueError):
            shard_plan(docs, target_bytes=0)
        with pytest.raises(ValueError):
            shard_plan(docs, target_bytes=10, n_buckets=0)

    def test_rejects_string_ids(self, spark):
        # a string id would cast to NULL and silently join away every
        # row — the guard turns that into an explicit error
        docs = spark.createDataFrame(
            [("doc-1", 10)], "doc_id string, n_chars long"
        )
        with pytest.raises(TypeError):
            shard_plan(docs, target_bytes=10)


class TestPrefixSumBucketing:
    """Quantile bucketing inside exclusive_prefix_sum: correct for
    overflow-range and gappy id spaces, and balanced where a
    value-range split would not be."""

    def _naive(self, pairs):
        out, run = {}, 0
        for i, s in sorted(pairs):
            out[i] = run
            run += s
        return out

    def test_near_2e63_hashed_ids_exact(self, spark):
        # xxhash64-style ids cluster anywhere in [-2^63, 2^63); the
        # old floor(id*B/(max+1)) wrapped the multiply and scrambled
        # bucket order.  Mixed-sign ids cover the full long range.
        ids = [
            -(2**62) - 17, -(2**40), -3, 0, 5,
            2**31, 2**62, 2**62 + 1, 2**63 - 2, 2**63 - 1,
        ]
        pairs = [(i, 10 + k) for k, i in enumerate(ids)]
        df = spark.createDataFrame(pairs, "doc_id long, n_chars long")
        got = {
            r.doc_id: r.prev
            for r in exclusive_prefix_sum(
                df, "doc_id", "n_chars", n_buckets=4
            ).collect()
        }
        assert got == self._naive(pairs)

    def test_gappy_ids_exact(self, spark):
        # snowflake-style: two dense islands separated by a huge gap
        pairs = [(i, 7) for i in range(20)] + [
            (10**18 + i, 7) for i in range(20)
        ]
        df = spark.createDataFrame(pairs, "doc_id long, n_chars long")
        got = {
            r.doc_id: r.prev
            for r in exclusive_prefix_sum(
                df, "doc_id", "n_chars", n_buckets=8
            ).collect()
        }
        assert got == self._naive(pairs)

    def test_gappy_ids_buckets_balanced(self, spark):
        # 1000 rows in [0, 1000) plus 1000 rows near 10^18: a
        # value-range split puts each island in ONE bucket (local
        # cumsum straggler); quantile boundaries spread them.
        pairs = [(i, 1) for i in range(1000)] + [
            (10**18 + 3 * i, 1) for i in range(1000)
        ]
        df = spark.createDataFrame(pairs, "doc_id long, n_chars long")
        sized = df.select(
            F.col("doc_id").alias("__id"),
            F.col("n_chars").alias("__sz"),
        )
        counts = [
            r["n"]
            for r in _quantile_order_buckets(sized, 8)
            .groupBy("__bkt")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        assert max(counts) <= 2 * (2000 // 8)  # no straggler bucket

    def test_duplicate_ids_share_a_bucket(self, spark):
        # order-preservation with ties: equal ids must never straddle
        # a boundary, or their local cumsums would double-count
        pairs = [(5, 1)] * 50 + [(9, 2)] * 50
        df = spark.createDataFrame(pairs, "doc_id long, n_chars long")
        rows = exclusive_prefix_sum(
            df, "doc_id", "n_chars", n_buckets=8
        ).collect()
        # prev over duplicate ids is order-arbitrary WITHIN the tie
        # group, but the multiset of prevs must match some serial
        # order of the ties — i.e. the set {0,1,...,49} then offsets
        prevs_5 = sorted(r.prev for r in rows if r.doc_id == 5)
        prevs_9 = sorted(r.prev for r in rows if r.doc_id == 9)
        assert prevs_5 == list(range(50))
        assert prevs_9 == [50 + 2 * k for k in range(50)]
