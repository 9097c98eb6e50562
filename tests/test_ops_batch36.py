"""Thirty-sixth batch: the ComplEx KG-embedding trainer (trainable
operator #6) — the Hermitian-product member of the KGE family on the
shared deterministic scaffolding (md5 init/corruption, full-batch
mean-gradient epochs, engine-identical 9dp quantizer), two-channel
(xr, xi) state.  Training health, shape, partitioning invariance,
the model-defining ability to score a pair ASYMMETRICALLY (which
DistMult cannot), a pure-Python replica of one epoch, and the shared
rank-eval protocol."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from coies_spark.ops.kge import (
    complex_rank_eval,
    complex_scores,
    complex_train,
)

pytestmark = pytest.mark.spark

CFG = dict(dim=4, lr=5.0, margin=1.0)


def _triples(spark):
    rows = set()
    for i in range(30):
        rows.add((f"p{i}", "has_brand", f"brand{i % 5}"))
        rows.add((f"brand{i % 5}", "has_type", f"type{i % 2}"))
    return spark.createDataFrame(
        sorted(rows), "subj string, pred string, obj string"
    )


def _q9(x):
    return math.floor(x * 1e9 + 0.5) / 1e9


class TestComplEx:
    def test_training_reduces_violations(self, spark):
        t = _triples(spark)
        v = {
            it: complex_scores(t, iters=it, **CFG)
            .agg(F.sum(F.col("violated").cast("int")))
            .first()[0]
            for it in (1, 4)
        }
        assert v[4] < v[1]

    def test_weights_stay_unit_scale(self, spark):
        emb = complex_train(_triples(spark), iters=4, **CFG)
        mx = emb.agg(
            F.greatest(F.max(F.abs("xr")), F.max(F.abs("xi")))
        ).first()[0]
        assert mx < 10.0

    def test_long_format_shape(self, spark):
        t = _triples(spark)
        emb = complex_train(t, iters=1, **CFG)
        ents = {r.subj for r in t.collect()} | {r.obj for r in t.collect()}
        n_e = emb.where(F.col("kind") == "entity").count()
        n_r = emb.where(F.col("kind") == "relation").count()
        assert n_e == len(ents) * CFG["dim"]
        assert n_r == 2 * CFG["dim"]

    def test_partitioning_invariance(self, spark):
        t = _triples(spark)
        a = sorted(map(tuple, complex_train(t, iters=2, **CFG).collect()))
        b = sorted(
            map(
                tuple,
                complex_train(t.repartition(7), iters=2, **CFG).collect(),
            )
        )
        assert a == b

    def test_can_score_pair_asymmetrically(self, spark):
        # the model-defining property: with a nonzero imaginary
        # relation channel, s(h, r, t) != s(t, r, h) in general —
        # DistMult is constrained to equality here (batch 35 pins
        # that), ComplEx is not.  Verify on the trained model over a
        # KG holding both orientations of the same pair.
        rows = [("a", "rel", "b"), ("b", "rel", "a"), ("a", "rel", "c")]
        t = spark.createDataFrame(
            rows, "subj string, pred string, obj string"
        )
        sc = {
            (r.subj, r.obj): r.s_pos
            for r in complex_scores(
                t, dim=3, iters=1, lr=1.0, margin=1.0
            ).collect()
        }
        assert abs(sc[("a", "b")] - sc[("b", "a")]) > 1e-9

    def test_one_epoch_replica(self, spark):
        # pure-python replica of epoch 1 for a 3-triple KG: two-channel
        # init, complex-norm entity normalization, corruption,
        # violation under the Hermitian score, mean gradient
        # (Wirtinger-style products of the OTHER factors), update
        rows = [("a", "r", "b"), ("b", "r", "c"), ("a", "r", "c")]
        t = spark.createDataFrame(
            rows, "subj string, pred string, obj string"
        )
        dim, lr, margin = 2, 5.0, 1.0
        emb = {
            (r.kind, r.id, r.i): (r.xr, r.xi)
            for r in complex_train(
                t, dim=dim, iters=1, lr=lr, margin=margin
            ).collect()
        }

        def h32(s):
            return int(
                hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16
            )

        def init(kind, eid, i, ch):
            u = h32(f"{kind}:{ch}\x1f{eid}\x1f{i}") / 4294967296.0
            return _q9(u - 0.5)

        ents = ["a", "b", "c"]
        e = {
            (x, i): [
                init("entity", x, i, "re"),
                init("entity", x, i, "im"),
            ]
            for x in ents
            for i in range(dim)
        }
        r = {
            i: [
                init("relation", "r", i, "re"),
                init("relation", "r", i, "im"),
            ]
            for i in range(dim)
        }
        for x in ents:
            nrm = math.sqrt(
                sum(
                    _q9(e[(x, i)][0] * e[(x, i)][0])
                    + _q9(e[(x, i)][1] * e[(x, i)][1])
                    for i in range(dim)
                )
            )
            if nrm > 0:
                for i in range(dim):
                    e[(x, i)] = [
                        _q9(e[(x, i)][0] / nrm),
                        _q9(e[(x, i)][1] / nrm),
                    ]
        ranked = sorted(ents)

        def corrupt(s_, p_, o_):
            i0 = h32(f"{s_}\x1f{p_}\x1f{o_}") % (len(ranked) - 1)
            return ranked[i0 + (1 if i0 >= ranked.index(o_) else 0)]

        negmap = {
            (s_, p_, o_): corrupt(s_, p_, o_)
            for (s_, p_, o_) in rows
        }

        def dimscore(s_, i, tr, ti):
            ar, ai = e[(s_, i)]
            br, bi = r[i]
            return _q9(ar * br * tr + ai * br * ti
                       + ar * bi * ti - ai * bi * tr)

        ge = {}
        gr = {}
        for (s_, p_, o_) in rows:
            no = negmap[(s_, p_, o_)]
            s_pos = sum(
                dimscore(s_, i, *e[(o_, i)]) for i in range(dim)
            )
            s_neg = sum(
                dimscore(s_, i, *e[(no, i)]) for i in range(dim)
            )
            if (margin - s_pos + s_neg) > 0:
                for i in range(dim):
                    ar, ai = e[(s_, i)]
                    br, bi = r[i]
                    cr, ci = e[(o_, i)]
                    dr, di = e[(no, i)]
                    ddr, ddi = dr - cr, di - ci

                    def acc(d, k, vr, vi):
                        pr, pi = d.get(k, (0.0, 0.0))
                        d[k] = (pr + vr, pi + vi)

                    acc(ge, (s_, i),
                        _q9(br * ddr + bi * ddi),
                        _q9(br * ddi - bi * ddr))
                    acc(ge, (o_, i),
                        _q9(ai * bi - ar * br),
                        _q9(-(ai * br + ar * bi)))
                    acc(ge, (no, i),
                        _q9(ar * br - ai * bi),
                        _q9(ai * br + ar * bi))
                    acc(gr, i,
                        _q9(ar * ddr + ai * ddi),
                        _q9(ar * ddi - ai * ddr))
        nt = len(rows)
        for x in ents:
            for i in range(dim):
                gxr, gxi = ge.get((x, i), (0.0, 0.0))
                want = (
                    _q9(e[(x, i)][0] - lr * (gxr / nt)),
                    _q9(e[(x, i)][1] - lr * (gxi / nt)),
                )
                assert want == emb[("entity", x, i)], (x, i)
        for i in range(dim):
            gxr, gxi = gr.get(i, (0.0, 0.0))
            want = (
                _q9(r[i][0] - lr * (gxr / nt)),
                _q9(r[i][1] - lr * (gxi / nt)),
            )
            assert want == emb[("relation", "r", i)], i

    def test_dim_validation(self, spark):
        with pytest.raises(ValueError):
            complex_train(_triples(spark), dim=0)


class TestComplExRankEval:
    def test_ranks_and_protocol(self, spark):
        t = _triples(spark)
        rows = complex_rank_eval(t, n_candidates=8, **CFG).collect()
        assert len(rows) == t.distinct().count()
        for r in rows:
            assert 1 <= r.rank <= r.n_cands + 1
            assert abs(r.rr - 1.0 / r.rank) < 1e-15
            assert r.hit1 == (r.rank <= 1)
            assert r.hit3 == (r.rank <= 3)
            assert r.hit10 == (r.rank <= 10)
            assert 0 <= r.n_cands <= 8

    def test_candidate_set_shared_across_family(self, spark):
        # one probe construction for every KGE eval face
        from coies_spark.ops.kge import transe_rank_eval

        t = _triples(spark)
        a = {
            (r.subj, r.pred, r.obj): r.n_cands
            for r in transe_rank_eval(t, n_candidates=8, **CFG).collect()
        }
        b = {
            (r.subj, r.pred, r.obj): r.n_cands
            for r in complex_rank_eval(
                t, n_candidates=8, **CFG
            ).collect()
        }
        assert a == b


class TestKgeModelCompare:
    def test_matches_individual_evals(self, spark):
        from coies_spark.ops.kge import kge_model_compare, transe_rank_eval

        t = _triples(spark)
        cmp_rows = {
            r.model: r
            for r in kge_model_compare(t, n_candidates=8, **CFG).collect()
        }
        assert set(cmp_rows) == {"transe", "distmult", "complex", "rotate"}
        te = transe_rank_eval(t, n_candidates=8, **CFG).collect()
        n = len(te)
        for m in cmp_rows.values():
            assert m.n_test == n
            assert 0.0 < m.mrr <= 1.0
            assert m.hits1 <= m.hits3 <= m.hits10 <= 1.0
        # the transe row must aggregate the transe eval exactly
        # (rr quantized on the 1e-12 grid, hits as integer means)
        got = cmp_rows["transe"]
        rr12 = [math.floor((1.0 / r.rank) * 1e12 + 0.5) / 1e12 for r in te]
        assert abs(got.mrr - sum(rr12) / n) < 1e-9
        assert got.hits10 == sum(1 for r in te if r.hit10) / n


class TestHeadSideEval:
    def test_head_face_protocol_and_orientation(self, spark):
        # head eval publishes ORIGINAL triple orientation with the
        # rank of the true HEAD among filtered candidates
        from coies_spark.ops.kge import complex_rank_eval

        t = _triples(spark)
        rows = complex_rank_eval(
            t, n_candidates=8, side="head", **CFG
        ).collect()
        orig = {(r.subj, r.pred, r.obj) for r in t.distinct().collect()}
        assert {(r.subj, r.pred, r.obj) for r in rows} == orig
        for r in rows:
            assert 1 <= r.rank <= r.n_cands + 1
            assert r.hit1 == (r.rank <= 1)

    def test_head_candidates_shared_across_models(self, spark):
        # the flip rides the SAME probe builder, so head candidate
        # sets are identical across models too
        from coies_spark.ops.kge import (
            distmult_rank_eval,
            transe_rank_eval,
        )

        t = _triples(spark)
        a = {
            (r.subj, r.pred, r.obj): r.n_cands
            for r in transe_rank_eval(
                t, n_candidates=8, side="head", **CFG
            ).collect()
        }
        b = {
            (r.subj, r.pred, r.obj): r.n_cands
            for r in distmult_rank_eval(
                t, n_candidates=8, side="head", **CFG
            ).collect()
        }
        assert a == b

    def test_head_filter_removes_known_heads(self, spark):
        # a candidate that is a known-true head for (pred, obj) must
        # be filtered, not counted as a negative: on a KG where EVERY
        # entity is a head of the same (pred, obj), n_cands collapses
        from coies_spark.ops.kge import transe_rank_eval

        rows = [(f"h{i}", "p", "o") for i in range(6)]
        t = spark.createDataFrame(
            rows, "subj string, pred string, obj string"
        )
        got = transe_rank_eval(
            t, n_candidates=12, side="head", dim=2, iters=1
        ).collect()
        # candidates are entities {h0..h5, o}: every OTHER hY is a
        # known-true head for (p, o) and is FILTERED; only 'o' itself
        # (never a head) can survive as a negative — so n_cands <= 1
        # for every triple, never the 5 sibling heads
        for r in got:
            assert r.n_cands <= 1 and r.rank <= 2

    def test_side_validation(self, spark):
        from coies_spark.ops.kge import distmult_rank_eval

        with pytest.raises(ValueError):
            distmult_rank_eval(_triples(spark), side="both")
