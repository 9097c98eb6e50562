"""Tenth-batch operators: node2vec biased walks (operators.graph),
snapshot-expiry planning (ops.maintenance), the assistant-refusal
gauge (ops.transcripts), exponent-smoothed mixture rates
(ops.sampling), and per-entity summary cards (ops.kg)."""

import datetime as dt
import hashlib

import pytest
from pyspark.sql import functions as F

from coies_spark.operators.graph import node2vec_walks
from coies_spark.ops.kg import entity_profile
from coies_spark.ops.maintenance import snapshot_expiry
from coies_spark.ops.sampling import temperature_rates
from coies_spark.ops.transcripts import refusal_stats

pytestmark = pytest.mark.spark


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def _H(start, walk, t, cur):
    return int(
        hashlib.md5(f"{start}:{walk}:{t}:{cur}".encode()).hexdigest()[:8],
        16,
    )


class TestNode2Vec:
    ROWS = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")]

    def test_python_parity(self, spark):
        p, q = 0.5, 2.0
        got = {
            tuple(r)
            for r in node2vec_walks(
                _edges(spark, self.ROWS), length=3, walks_per_node=2,
                p=p, q=q,
            ).collect()
        }
        adj: dict = {}
        for s, d in self.ROWS:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
        adj = {k: sorted(v) for k, v in adj.items()}
        want = set()
        for start in adj:
            for walk in range(2):
                want.add((start, walk, 0, start))
                nb = adj[start]
                cur = nb[_H(start, walk, 1, start) % len(nb)]
                prev = start
                want.add((start, walk, 1, cur))
                for t in (2, 3):
                    cands = adj[cur]
                    ws = [
                        1.0 / p
                        if n == prev
                        else (1.0 if n in adj[prev] else 1.0 / q)
                        for n in cands
                    ]
                    u = _H(start, walk, t, cur) / 4294967296.0 * sum(ws)
                    cum, nxt = 0.0, None
                    for n, w in zip(cands, ws):
                        if cum <= u < cum + w:
                            nxt = n
                            break
                        cum += w
                    prev, cur = cur, nxt
                    want.add((start, walk, t, cur))
        assert got == want

    def test_outward_bias_dominates_at_tiny_q(self, spark):
        # triangle a-b-c plus pendant c-d: a walker at c arriving
        # from b sees {a: common-neighbor w=1, b: return w=1/p,
        # d: outward w=1/q}.  With 1/q overwhelming, every walker
        # that reaches c from b must continue to d.
        e = _edges(
            spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
        )
        walks = node2vec_walks(
            e, length=2, walks_per_node=4, p=1e6, q=1e-6
        ).collect()
        by = {}
        for r in walks:
            by.setdefault((r.start, r.walk), {})[r.step] = r.node
        seen = 0
        for path in by.values():
            if path[1] == "c" and path[0] in ("a", "b"):
                # prev is the start; outward from c = the one
                # non-neighbor of prev that isn't prev
                outward = {"a": "d", "b": "d"}[path[0]]
                assert path[2] == outward
                seen += 1
        assert seen > 0

    def test_return_bias_dominates_at_tiny_p(self, spark):
        e = _edges(
            spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
        )
        walks = node2vec_walks(
            e, length=2, walks_per_node=4, p=1e-6, q=1e6
        ).collect()
        by = {}
        for r in walks:
            by.setdefault((r.start, r.walk), {})[r.step] = r.node
        checked = 0
        for (start, _), path in by.items():
            assert path[2] == path[0]  # always returns to prev=start
            checked += 1
        assert checked == 16  # 4 nodes x 4 walks

    def test_non_dyadic_weights_never_kill_or_fork_walkers(self, spark):
        # p = q = 3 makes every biased weight 1/3 — non-dyadic, so a
        # float recompute of the interval's lower edge (cum - w) can
        # sit 1 ulp off the previous row's cum, leaving a gap (walker
        # dies) or an overlap (walker duplicates).  The lag-based
        # lower bound tiles exactly: every (start, walk, step) must
        # appear exactly once for the full length.
        rows = [
            (f"n{i}", f"n{j}")
            for i in range(12)
            for j in range(12)
            if i < j and (i + j) % 3 != 0
        ]
        walks = node2vec_walks(
            _edges(spark, rows), length=6, walks_per_node=4,
            p=3.0, q=3.0,
        ).collect()
        starts = {s for s, _ in rows} | {d for _, d in rows}
        seen: dict = {}
        for r in walks:
            key = (r.start, r.walk, r.step)
            assert key not in seen, f"duplicated walker row {key}"
            seen[key] = r.node
        for s in starts:
            for w in range(4):
                for t in range(7):
                    assert (s, w, t) in seen, f"walker died at {(s, w, t)}"

    def test_guards(self, spark):
        e = _edges(spark, self.ROWS)
        with pytest.raises(ValueError):
            node2vec_walks(e, p=0.0)
        with pytest.raises(ValueError):
            node2vec_walks(e, q=-1.0)
        with pytest.raises(ValueError):
            node2vec_walks(e, length=0)

    def test_no_cartesian_in_plan(self, spark):
        e = _edges(spark, self.ROWS)
        plan = (
            node2vec_walks(e, length=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan


def _snaps(spark, rows):
    return spark.createDataFrame(
        rows,
        "table_name string, snapshot_id long, parent_id long, "
        "committed_at long, ref string",
    )


class TestSnapshotExpiry:
    ROWS = [
        ("t1", 5, 4, 1000, "main"),
        ("t1", 4, 3, 900, None),
        ("t1", 3, 2, 800, None),
        ("t1", 2, 1, 200, None),
        ("t1", 1, None, 100, None),
        ("t2", 9, None, 950, None),
    ]

    def test_hand_plan(self, spark):
        got = {
            r.snapshot_id: (r.action, r.reason)
            for r in snapshot_expiry(
                _snaps(spark, self.ROWS),
                retain_last=2, retain_s=300, now=1000,
            ).collect()
        }
        assert got == {
            5: ("retain", "ref"),
            4: ("retain", "last_n"),
            3: ("retain", "recent"),   # 800 > 1000-300
            2: ("expire", None),
            1: ("expire", None),
            9: ("retain", "last_n"),   # t2's own ranking
        }

    def test_ref_beats_last_n_in_reason(self, spark):
        rows = [("t", 2, 1, 20, "tag-v1"), ("t", 1, None, 10, None)]
        got = {
            r.snapshot_id: r.reason
            for r in snapshot_expiry(
                _snaps(spark, rows), retain_last=5, retain_s=1, now=100
            ).collect()
        }
        assert got[2] == "ref" and got[1] == "last_n"

    def test_now_as_dataframe(self, spark):
        s = _snaps(spark, self.ROWS)
        now = s.agg(F.max("committed_at"))
        got = {
            r.snapshot_id: r.action
            for r in snapshot_expiry(
                s, retain_last=1, retain_s=150, now=now
            ).collect()
        }
        # now=1000: retain 5 (ref+rank1), 4 (900>850), 9 (rank1);
        # expire 3 (800<=850? 800 > 850 false), 2, 1
        assert got == {
            5: "retain", 4: "retain", 9: "retain",
            3: "expire", 2: "expire", 1: "expire",
        }

    def test_guards(self, spark):
        s = _snaps(spark, self.ROWS)
        with pytest.raises(ValueError):
            snapshot_expiry(s, retain_last=0, now=1)
        with pytest.raises(ValueError):
            snapshot_expiry(s, now=None)


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


class TestRefusalStats:
    def test_hand_counts(self, spark):
        rows = [
            ("c1", 0, "user", "please do X"),
            ("c1", 1, "assistant", "Sure, here is X"),
            ("c1", 2, "user", "now do Y"),
            ("c1", 3, "assistant", "I cannot help with that."),
            ("c2", 0, "user", "I cannot even"),  # non-assistant match
            ("c3", 0, "assistant", "I'm sorry, but no."),
        ]
        got = {
            r.conv_id: (r.n_assistant, r.n_refusals, r.refusal_rate)
            for r in refusal_stats(_turns(spark, rows)).collect()
        }
        assert got["c1"] == (2, 1, 0.5)
        assert got["c2"] == (0, 0, None)  # try_divide NULL, not 0.0
        assert got["c3"] == (1, 1, 1.0)

    def test_case_insensitive(self, spark):
        rows = [("c", 0, "assistant", "AS AN AI model, no.")]
        r = refusal_stats(_turns(spark, rows)).collect()[0]
        assert r.n_refusals == 1

    def test_null_text_is_not_a_refusal(self, spark):
        rows = [("c", 0, "assistant", None)]
        r = refusal_stats(_turns(spark, rows)).collect()[0]
        assert (r.n_assistant, r.n_refusals) == (1, 0)


class TestTemperatureRates:
    def _docs(self, spark):
        rows = [(i, "en" if i < 80 else ("fr" if i < 95 else "zh"), 10)
                for i in range(100)]
        return spark.createDataFrame(rows, "doc_id long, lang string, n_chars int")

    def test_alpha_one_is_proportional(self, spark):
        for r in temperature_rates(self._docs(spark), alpha=1.0).collect():
            assert abs(r.boost - 1.0) < 1e-8, r

    def test_alpha_zero_is_uniform(self, spark):
        got = {r.stratum: r.q
               for r in temperature_rates(self._docs(spark), alpha=0.0).collect()}
        for v in got.values():
            assert abs(v - 1.0 / 3) < 1e-6

    def test_smoothing_lifts_tail_damps_head(self, spark):
        got = {r.stratum: r.boost
               for r in temperature_rates(self._docs(spark), alpha=0.3).collect()}
        assert got["en"] < 1.0 < got["zh"]
        assert got["zh"] > got["fr"] > got["en"]

    def test_weight_col(self, spark):
        docs = spark.createDataFrame(
            [(0, "en", 900), (1, "fr", 100)],
            "doc_id long, lang string, n_chars int",
        )
        got = {r.stratum: r.p
               for r in temperature_rates(
                   docs, alpha=0.5, weight_col="n_chars").collect()}
        assert got == {"en": 0.9, "fr": 0.1}

    def test_alpha_guard(self, spark):
        with pytest.raises(ValueError):
            temperature_rates(self._docs(spark), alpha=1.5)


class TestEntityProfile:
    def test_hand_profile(self, spark):
        ev = spark.createDataFrame(
            [("c1", "p1", "e1", 10), ("c2", "p1", "e1", 20),
             ("c1", "p2", "e1", 5), ("c1", "p1", "e2", 7)],
            "subj string, pred string, obj string, ts long",
        )
        got = {r.entity: r for r in entity_profile(ev).collect()}
        e1 = got["e1"]
        assert (e1.n_evidence, e1.n_convs, e1.n_preds) == (3, 2, 2)
        assert (e1.first_seen, e1.last_seen) == (5, 20)
        assert (e1.top_pred, e1.top_pred_n) == ("p1", 2)

    def test_modal_tie_breaks_to_smallest_pred(self, spark):
        ev = spark.createDataFrame(
            [("c1", "zz", "e", 1), ("c2", "aa", "e", 2)],
            "subj string, pred string, obj string, ts long",
        )
        r = entity_profile(ev).collect()[0]
        assert r.top_pred == "aa" and r.top_pred_n == 1
