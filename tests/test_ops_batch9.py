"""Ninth-batch operators: DeepWalk hash-random walks + skip-gram walk
pairs (operators.graph), SCD-2 interval alignment (ops.kg), the
transcript ingest contract check (ops.transcripts), and SQ8 scalar
quantization (ops.similarity)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from coies_spark.operators.graph import random_walks, walk_pairs
from coies_spark.ops.kg import interval_align, temporal_triples
from coies_spark.ops.similarity import (
    brute_topk,
    sq8_codes,
    sq8_stats,
    sq8_topk,
)
from coies_spark.ops.transcripts import transcript_integrity

pytestmark = pytest.mark.spark


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def _pick(start, walk, t, cur, deg):
    h = int(
        hashlib.md5(f"{start}:{walk}:{t}:{cur}".encode()).hexdigest()[:8],
        16,
    )
    return h % deg


class TestRandomWalks:
    ROWS = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")]

    def test_python_parity(self, spark):
        # replicate the hash rule in pure Python and compare the FULL
        # walk set — every step, every walker
        e = _edges(spark, self.ROWS)
        got = {
            (r.start, r.walk, r.step, r.node)
            for r in random_walks(e, length=3, walks_per_node=2).collect()
        }
        adj: dict[str, list[str]] = {}
        for s, d in self.ROWS:
            adj.setdefault(s, set()).add(d)  # type: ignore[arg-type]
            adj.setdefault(d, set()).add(s)  # type: ignore[arg-type]
        adj = {k: sorted(v) for k, v in adj.items()}
        want = set()
        for start in adj:
            for walk in range(2):
                cur = start
                want.add((start, walk, 0, start))
                for t in range(1, 4):
                    nbrs = adj[cur]
                    cur = nbrs[_pick(start, walk, t, cur, len(nbrs))]
                    want.add((start, walk, t, cur))
        assert got == want

    def test_every_step_is_an_edge(self, spark):
        e = _edges(spark, self.ROWS)
        w = random_walks(e, length=4, walks_per_node=1)
        sym = {(s, d) for s, d in self.ROWS} | {
            (d, s) for s, d in self.ROWS
        }
        rows = sorted(
            w.collect(), key=lambda r: (r.start, r.walk, r.step)
        )
        by_walk: dict[tuple, list] = {}
        for r in rows:
            by_walk.setdefault((r.start, r.walk), []).append(r.node)
        for (start, _), path in by_walk.items():
            assert path[0] == start
            assert len(path) == 5
            for a, b in zip(path, path[1:]):
                assert (a, b) in sym

    def test_deterministic_across_partitionings(self, spark):
        e = _edges(spark, self.ROWS)
        a = {
            tuple(r)
            for r in random_walks(e, length=2, walks_per_node=2).collect()
        }
        b = {
            tuple(r)
            for r in random_walks(
                e.repartition(7), length=2, walks_per_node=2
            ).collect()
        }
        assert a == b

    def test_no_cartesian_in_plan(self, spark):
        e = _edges(spark, self.ROWS)
        plan = (
            random_walks(e, length=3, walks_per_node=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        # the hub-safe index attaches its 1-row quantile-boundary
        # aggregate via a broadcast cross join (the
        # exclusive_prefix_sum pattern — O(n), benign); any OTHER
        # nested-loop join would be quadratic and is still forbidden
        assert plan.count("BroadcastNestedLoopJoin") <= 1

    def test_hub_index_ranks_match_single_window(self, spark):
        # degree-skew case the two-phase index exists for: one
        # 10^5-degree hub must get ranks identical to the naive
        # row_number build (0..deg-1 in neighbor-id order), with the
        # big rank window partitioned by (cur, bucket) — never a
        # single task holding the full neighbor list
        from pyspark.sql.window import Window as W

        from coies_spark.operators.graph import (
            _neighbor_index,
            _symmetrize,
        )

        n = 100_000
        rows = [("hub", f"s{i:06d}") for i in range(n)]
        sym = _symmetrize(_edges(spark, rows), "src", "dst")
        idx = _neighbor_index(sym, n_buckets=16)
        hub_ranks = (
            idx.where(F.col("cur") == "hub")
            .orderBy("pick")
            .select("nbr", "pick")
            .collect()
        )
        assert [r.pick for r in hub_ranks] == list(range(n))
        assert [r.nbr for r in hub_ranks] == sorted(
            f"s{i:06d}" for i in range(n)
        )
        # plan shape: the row_number window must key on (cur, __bkt)
        plan = (
            idx._jdf.queryExecution().executedPlan().toString()
        )
        import re

        rn_specs = re.findall(
            r"row_number\(\) windowspecdefinition\(([^)]*)\)", plan
        )
        assert rn_specs, plan[:2000]
        for spec in rn_specs:
            assert "__bkt" in spec, spec

    def test_hub_index_numeric_ids(self, spark):
        # integer node ids take the value-key path; gappy ids must
        # still rank correctly (quantile boundaries, not value range)
        from coies_spark.operators.graph import (
            _neighbor_index,
            _symmetrize,
        )

        rows = [(0, 10**18 + 3 * i) for i in range(500)] + [
            (0, i + 1) for i in range(500)
        ]
        e = spark.createDataFrame(rows, "src long, dst long")
        sym = _symmetrize(e, "src", "dst")
        idx = _neighbor_index(sym, n_buckets=8)
        got = [
            r.nbr
            for r in idx.where(F.col("cur") == 0)
            .orderBy("pick")
            .collect()
        ]
        assert got == sorted(got)
        assert len(got) == 1000

    def test_param_guards(self, spark):
        e = _edges(spark, self.ROWS)
        with pytest.raises(ValueError):
            random_walks(e, length=0)
        with pytest.raises(ValueError):
            random_walks(e, walks_per_node=0)

    def test_self_loop_only_node_starts_no_walk(self, spark):
        e = _edges(spark, [("a", "b"), ("z", "z")])
        starts = {
            r.start for r in random_walks(e, length=1).collect()
        }
        assert starts == {"a", "b"}


class TestWalkPairs:
    def test_hand_counts(self, spark):
        # one walk a->b->c->d, window 2: (a,b),(a,c),(b,c),(b,d),
        # (c,d) and mirrors — each exactly once
        walks = spark.createDataFrame(
            [("a", 0, s, n) for s, n in enumerate(["a", "b", "c", "d"])],
            "start string, walk long, step long, node string",
        )
        got = {
            (r.center, r.context): r.n_pairs
            for r in walk_pairs(walks, window=2).collect()
        }
        expect = {}
        seq = ["a", "b", "c", "d"]
        for i in range(4):
            for j in range(4):
                if i != j and abs(i - j) <= 2:
                    k = (seq[i], seq[j])
                    expect[k] = expect.get(k, 0) + 1
        assert got == expect

    def test_window_guard(self, spark):
        walks = spark.createDataFrame(
            [("a", 0, 0, "a")],
            "start string, walk long, step long, node string",
        )
        with pytest.raises(ValueError):
            walk_pairs(walks, window=0)

    def test_empty_input(self, spark):
        walks = spark.createDataFrame(
            [],
            "start string, walk long, step long, node string",
        )
        assert walk_pairs(walks).count() == 0


class TestIntervalAlign:
    def _hist(self, spark, rows):
        return temporal_triples(
            spark.createDataFrame(
                rows, "subj string, pred string, obj string, ts long"
            )
        )

    def test_hand_alignment(self, spark):
        left = self._hist(
            spark,
            [
                ("u1", "ev", "a", 10),
                ("u1", "ev", "b", 20),
                ("u1", "ev", "a", 40),
            ],
        )
        right = self._hist(
            spark, [("u1", "band", "lo", 5), ("u1", "band", "hi", 25)]
        )
        got = sorted(
            (r.obj_a, r.obj_b, r.valid_from, r.valid_to)
            for r in interval_align(left, right).collect()
        )
        assert got == [
            ("a", "hi", 40, None),
            ("a", "lo", 10, 20),
            ("b", "hi", 25, 40),
            ("b", "lo", 20, 25),
        ]

    def test_disjoint_keys_do_not_align(self, spark):
        left = self._hist(spark, [("u1", "ev", "a", 10)])
        right = self._hist(spark, [("u2", "band", "lo", 5)])
        assert interval_align(left, right).count() == 0

    def test_touching_intervals_do_not_overlap(self, spark):
        # [10, 20) and a history starting exactly at 20: half-open
        # semantics — closed version ends as the other begins
        left = self._hist(
            spark, [("u1", "ev", "a", 10), ("u1", "ev", "b", 20)]
        )
        right = self._hist(spark, [("u1", "band", "hi", 20)])
        got = {
            (r.obj_a, r.obj_b, r.valid_from, r.valid_to)
            for r in interval_align(left, right).collect()
        }
        assert got == {("b", "hi", 20, None)}

    def test_output_is_scd2_shaped(self, spark):
        # intervals per key are non-overlapping and ordered — the
        # output can feed interval_align again (composability)
        left = self._hist(
            spark,
            [("u1", "ev", t, ts) for t, ts in
             [("a", 1), ("b", 7), ("c", 13), ("a", 21)]],
        )
        right = self._hist(
            spark,
            [("u1", "band", t, ts) for t, ts in
             [("x", 0), ("y", 9), ("x", 17)]],
        )
        rows = sorted(
            interval_align(left, right).collect(),
            key=lambda r: r.valid_from,
        )
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to is not None and a.valid_to <= b.valid_from

    def test_multi_key_align(self, spark):
        left = self._hist(
            spark, [("u1", "p", "a", 10), ("u2", "p", "a", 10)]
        )
        right = self._hist(
            spark, [("u1", "p", "x", 15), ("u2", "p", "y", 15)]
        )
        got = {
            (r.subj, r.pred, r.obj_a, r.obj_b)
            for r in interval_align(
                left, right, keys=("subj", "pred")
            ).collect()
        }
        assert got == {("u1", "p", "a", "x"), ("u2", "p", "a", "y")}


def _turns(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


class TestTranscriptIntegrity:
    def test_clean_feed_gauges_zero(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            ("c1", i, "user" if i % 2 == 0 else "assistant",
             f"turn {i}", t0 + dt.timedelta(seconds=i))
            for i in range(4)
        ]
        r = transcript_integrity(_turns(spark, rows)).collect()[0]
        assert (
            r.dup_turn_idx, r.missing_turn_idx, r.ts_inversions,
            r.null_turn_idx, r.null_text, r.empty_text, r.null_role,
        ) == (0, 0, 0, 0, 0, 0, 0)
        assert r.n_turns == 4

    def test_each_gauge_fires(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        s = lambda k: t0 + dt.timedelta(seconds=k)  # noqa: E731
        rows = [
            ("c1", 0, "user", "a", s(0)),
            ("c1", 0, "assistant", "b", s(1)),   # dup idx 0
            ("c1", 2, None, "", s(0)),           # missing idx 1, null
                                                 # role, empty text,
                                                 # clock before idx 0
            ("c1", 3, "assistant", None, s(3)),  # null text
            ("c1", None, "user", "e", s(4)),     # null idx
        ]
        r = transcript_integrity(_turns(spark, rows)).collect()[0]
        assert r.n_turns == 5
        assert r.dup_turn_idx == 1
        assert r.missing_turn_idx == 1      # {0, 2, 3}: hole at 1
        assert r.ts_inversions == 1         # idx2's backdated clock
        assert r.null_turn_idx == 1
        assert r.null_text == 1
        assert r.empty_text == 1
        assert r.null_role == 1

    def test_all_null_text_conversation(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        rows = [("c1", 0, "user", None, t0)]
        r = transcript_integrity(_turns(spark, rows)).collect()[0]
        assert r.null_text == 1 and r.empty_text == 0
        assert r.ts_inversions == 0

    def test_shares_one_exchange(self, spark):
        import datetime as dt

        rows = [("c1", 0, "user", "a", dt.datetime(2024, 1, 1))]
        plan = (
            transcript_integrity(_turns(spark, rows))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # one shuffle total: the window pass and the groupBy share
        # the conv_id exchange
        assert plan.count("Exchange hashpartitioning") == 1


class TestSQ8:
    def _emb(self, spark):
        rows = [(i, [float((i * 7 + j * 3) % 13) for j in range(8)])
                for i in range(30)]
        # planted twin pair: 40/41 identical
        rows += [(40, [1.0] * 8), (41, [1.0] * 8)]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_codes_in_range_and_parity(self, spark):
        emb = self._emb(spark)
        stats = {
            r.pos: (r.mn, r.mx) for r in sq8_stats(emb).collect()
        }
        vecs = {r.vec_id: list(r.embedding) for r in emb.collect()}
        got = {r.vec_id: list(r.code) for r in sq8_codes(emb).collect()}
        import math

        for vid, v in vecs.items():
            for j, x in enumerate(v):
                mn, mx = stats[j]
                want = (
                    0
                    if mx <= mn
                    else max(
                        0, min(255, math.floor((x - mn) * 256.0 / (mx - mn)))
                    )
                )
                assert got[vid][j] == want, (vid, j)
                assert 0 <= got[vid][j] <= 255

    def test_constant_dimension_encodes_zero(self, spark):
        emb = spark.createDataFrame(
            [(0, [1.0, 5.0]), (1, [1.0, 7.0])],
            "vec_id long, embedding array<float>",
        )
        codes = {r.vec_id: list(r.code) for r in sq8_codes(emb).collect()}
        assert codes[0][0] == 0 and codes[1][0] == 0

    def test_planted_twin_found_at_rank_1(self, spark):
        emb = self._emb(spark)
        # query 40's nearest by quantized cosine must be its twin 41
        top = (
            sq8_topk(emb, n_queries=42, k=1)
            .where(F.col("query_id") == 40)
            .collect()
        )
        assert top[0].target_id == 41

    def test_recall_vs_brute_on_testdata(self, spark):
        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        k = 5
        exact = {
            (r.query_id, r.target_id)
            for r in brute_topk(emb, n_queries=4, k=k).collect()
        }
        approx = {
            (r.query_id, r.target_id)
            for r in sq8_topk(emb, n_queries=4, k=k).collect()
        }
        recall = len(exact & approx) / len(exact)
        # SQ8 with 256 buckets/dim barely moves cosine at d=64
        assert recall >= 0.8, recall
