"""Thirty-third batch: the TransE KG-embedding trainer (trainable
operator #4) — full-batch mean-gradient epochs over long-format
state, md5-deterministic init and tail corruption.  Training health
(violations fall), bounded weights (the round-9 exactness guard),
face consistency, partitioning invariance, and a pure-Python replica
of one epoch."""

import math

import pytest
from pyspark.sql import functions as F

from coies_spark.ops.kge import transe_energies, transe_train

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


class TestTransE:
    def test_training_reduces_violations(self, spark):
        t = _triples(spark)
        v = {
            it: transe_energies(t, iters=it, **CFG)
            .agg(F.sum(F.col("violated").cast("int")))
            .first()[0]
            for it in (1, 4)
        }
        assert v[4] < v[1]

    def test_weights_stay_unit_scale(self, spark):
        # mean-gradient descent must keep |x| small — the guard
        # against the sum-gradient divergence that pushed round(x, 9)
        # past double precision
        emb = transe_train(_triples(spark), iters=4, **CFG)
        mx = emb.agg(F.max(F.abs("x"))).first()[0]
        assert mx < 10.0

    def test_long_format_shape(self, spark):
        t = _triples(spark)
        emb = transe_train(t, iters=1, **CFG)
        ents = {r.subj for r in t.collect()} | {r.obj for r in t.collect()}
        n_e = emb.where(F.col("kind") == "entity").count()
        n_r = emb.where(F.col("kind") == "relation").count()
        assert n_e == len(ents) * CFG["dim"]
        assert n_r == 2 * CFG["dim"]

    def test_partitioning_invariance(self, spark):
        t = _triples(spark)
        a = sorted(map(tuple, transe_train(t, iters=2, **CFG).collect()))
        b = sorted(
            map(
                tuple,
                transe_train(t.repartition(7), iters=2, **CFG).collect(),
            )
        )
        assert a == b

    def test_energies_match_weights(self, spark):
        # the energy face must be the squared-L2 residual of the
        # weight face's vectors (shared core, recomputed here in
        # plain python with the same rounding discipline)
        t = _triples(spark)
        emb = {
            (r.kind, r.id, r.i): r.x
            for r in transe_train(t, iters=2, **CFG).collect()
        }
        en = transe_energies(t, iters=2, **CFG).collect()
        for r in en:
            d_pos = sum(
                round(
                    (
                        (
                            emb[("entity", r.subj, i)]
                            + emb[("relation", r.pred, i)]
                        )
                        - emb[("entity", r.obj, i)]
                    )
                    ** 2,
                    9,
                )
                for i in range(CFG["dim"])
            )
            assert abs(r.d_pos - d_pos) < 1e-9, (r, d_pos)

    def test_one_epoch_replica(self, spark):
        # pure-python replica of epoch 1 for a 3-triple KG: init,
        # entity L2 normalization, corruption, violation, mean
        # gradient, update
        import hashlib

        rows = [("a", "r", "b"), ("b", "r", "c"), ("a", "r", "c")]
        t = spark.createDataFrame(
            rows, "subj string, pred string, obj string"
        )
        dim, lr, margin = 2, 5.0, 1.0
        emb = {
            (r.kind, r.id, r.i): r.x
            for r in transe_train(
                t, dim=dim, iters=1, lr=lr, margin=margin
            ).collect()
        }

        def h32(s):
            return int(
                hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16
            )

        def init(kind, eid, i):
            u = h32(f"{kind}\x1f{eid}\x1f{i}") / 4294967296.0
            return round(u - 0.5, 9)

        ents = sorted({"a", "b", "c"})

        def corrupt(s, p, o):
            # excluding-one corruption: idx0 = md5 mod (N-1), shifted
            # past the true tail's own rank (kge._negatives)
            i0 = h32(f"{s}\x1f{p}\x1f{o}") % (len(ents) - 1)
            return ents[i0 + (1 if i0 >= ents.index(o) else 0)]

        neg = {(s, p, o): corrupt(s, p, o) for s, p, o in rows}
        state = {}
        for e in ents:
            for i in range(dim):
                state[("entity", e, i)] = init("entity", e, i)
        for i in range(dim):
            state[("relation", "r", i)] = init("relation", "r", i)
        # epoch-start entity L2 normalization (TransE Alg. 1)
        for e in ents:
            nrm = math.sqrt(
                sum(
                    round(state[("entity", e, i)] ** 2, 9)
                    for i in range(dim)
                )
            )
            if nrm > 0:
                for i in range(dim):
                    state[("entity", e, i)] = round(
                        state[("entity", e, i)] / nrm, 9
                    )
        grads = {k: 0.0 for k in state}
        for s, p, o in rows:
            dp = [
                (state[("entity", s, i)] + state[("relation", "r", i)])
                - state[("entity", o, i)]
                for i in range(dim)
            ]
            dn = [
                (state[("entity", s, i)] + state[("relation", "r", i)])
                - state[("entity", neg[(s, p, o)], i)]
                for i in range(dim)
            ]
            d_pos = sum(round(x * x, 9) for x in dp)
            d_neg = sum(round(x * x, 9) for x in dn)
            if margin + d_pos - d_neg > 0:
                for i in range(dim):
                    grads[("entity", s, i)] += round(
                        2.0 * (dp[i] - dn[i]), 9
                    )
                    grads[("relation", "r", i)] += round(
                        2.0 * (dp[i] - dn[i]), 9
                    )
                    grads[("entity", o, i)] += round(-2.0 * dp[i], 9)
                    grads[("entity", neg[(s, p, o)], i)] += round(
                        2.0 * dn[i], 9
                    )
        for k in state:
            state[k] = round(state[k] - lr * (grads[k] / len(rows)), 9)
        for k, v in state.items():
            assert math.isclose(emb[k], v, abs_tol=1e-12), (k, emb[k], v)

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            transe_train(_triples(spark), dim=0)
        with pytest.raises(ValueError):
            transe_energies(_triples(spark), iters=0)


class TestTransERankEval:
    def test_ranks_well_formed(self, spark):
        from coies_spark.ops.kge import transe_rank_eval

        t = _triples(spark)
        out = transe_rank_eval(t, iters=2, n_candidates=10, **CFG)
        rows = out.collect()
        # one row per trained triple, none dropped by candidate
        # filtering (the LEFT-join contract)
        assert len(rows) == t.distinct().count()
        for r in rows:
            assert 1 <= r.rank <= r.n_cands + 1
            assert r.rr == 1.0 / r.rank
            assert r.hit1 == (r.rank <= 1)
            assert r.hit3 == (r.rank <= 3)
            assert r.hit10 == (r.rank <= 10)
            assert r.n_cands <= 10

    def test_training_improves_mrr(self, spark):
        from coies_spark.ops.kge import transe_rank_eval

        t = _triples(spark)
        mrr = {
            it: transe_rank_eval(t, iters=it, n_candidates=10, **CFG)
            .agg(F.avg("rr"))
            .first()[0]
            for it in (1, 4)
        }
        assert mrr[4] > mrr[1]

    def test_filtered_protocol_drops_known_true_tails(self, spark):
        from coies_spark.ops.kge import transe_rank_eval

        # brand0 has TWO true types under has_type in a 2-entity
        # tail universe: with every entity a candidate, the filtered
        # protocol must strip the other true tail from the negatives
        t = spark.createDataFrame(
            [("brand0", "has_type", "type0"),
             ("brand0", "has_type", "type1")],
            "subj string, pred string, obj string",
        )
        out = transe_rank_eval(
            t, iters=1, n_candidates=50, **CFG
        ).collect()
        # candidate universe = {brand0, type0, type1} minus the true
        # tail minus the OTHER known-true tail -> only brand0 remains
        for r in out:
            assert r.n_cands <= 1

    def test_partitioning_invariance(self, spark):
        from coies_spark.ops.kge import transe_rank_eval

        t = _triples(spark)
        a = sorted(map(tuple, transe_rank_eval(
            t, iters=1, n_candidates=8, **CFG).collect()))
        b = sorted(map(tuple, transe_rank_eval(
            t.repartition(7), iters=1, n_candidates=8, **CFG).collect()))
        assert a == b

    def test_no_allpairs_plan(self, spark):
        from coies_spark.ops.kge import transe_rank_eval

        t = _triples(spark)
        p = transe_rank_eval(t, iters=1, n_candidates=4, **CFG)._jdf \
            .queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in p
