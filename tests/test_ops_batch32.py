"""Thirty-second batch: truth discovery — TruthFinder-style joint
source-reliability / fact-confidence estimation over conflicting
claims (the Knowledge-Vault resolver face of the belief layer), with
its source-trust gauge.  Planted-reliability behavior, pinned
resolution order, partitioning invariance, and face consistency."""

import pytest
from pyspark.sql import functions as F

from coies_spark.ops.kg import source_trust, truth_discovery

pytestmark = pytest.mark.spark


def _claims(spark):
    """Two corroborating good sources assert the true value of eight
    items; one bad source asserts a lone wrong value for each.  Round
    1 favors corroboration, later rounds compound it into trust."""
    rows = []
    for i in range(8):
        for src in ("good_a", "good_b"):
            rows.append((src, f"item{i}", "value", f"true{i}"))
        rows.append(("bad", f"item{i}", "value", f"wrong{i}"))
    return spark.createDataFrame(
        rows, "source string, subj string, pred string, obj string"
    )


class TestTruthDiscovery:
    def test_resolves_corroborated_values(self, spark):
        out = truth_discovery(_claims(spark), iters=4).collect()
        winners = {
            (r.subj, r.obj) for r in out if r.is_winner
        }
        assert winners == {(f"item{i}", f"true{i}") for i in range(8)}
        # exactly one winner per (subj, pred)
        assert sum(1 for r in out if r.is_winner) == 8

    def test_trust_separates_sources(self, spark):
        t = {r.source: r.trust for r in source_trust(_claims(spark)).collect()}
        assert t["good_a"] == t["good_b"]  # symmetric claim history
        assert t["good_a"] > 0.8 > t["bad"]

    def test_confidence_monotone_in_corroboration(self, spark):
        out = truth_discovery(_claims(spark), iters=1).collect()
        two = {r.confidence for r in out if r.n_sources == 2}
        one = {r.confidence for r in out if r.n_sources == 1}
        assert len(two) == 1 and len(one) == 1
        assert max(one) < min(two)

    def test_duplicate_assertions_collapse(self, spark):
        base = _claims(spark)
        noisy = base.unionByName(
            base.where(F.col("source") == "bad")
        )  # bad source re-asserts everything twice
        a = sorted(map(tuple, truth_discovery(base).collect()))
        b = sorted(map(tuple, truth_discovery(noisy).collect()))
        assert a == b

    def test_partitioning_invariance(self, spark):
        cl = _claims(spark)
        a = sorted(map(tuple, truth_discovery(cl, iters=4).collect()))
        b = sorted(
            map(tuple, truth_discovery(cl.repartition(7), iters=4).collect())
        )
        assert a == b

    def test_winner_tiebreak_is_pinned(self, spark):
        # two singleton claims with identical support: lexicographic
        # obj breaks the tie deterministically
        cl = spark.createDataFrame(
            [("s1", "x", "p", "b"), ("s2", "x", "p", "a")],
            "source string, subj string, pred string, obj string",
        )
        out = {r.obj: r.is_winner for r in truth_discovery(cl).collect()}
        assert out == {"a": True, "b": False}

    def test_faces_share_fixed_point(self, spark):
        cl = _claims(spark)
        # recompute the fact face's round-4 confidence from the
        # round-3 trust the source face exposes at iters=3: one more
        # noisy-OR round must reproduce truth_discovery(iters=4)
        t3 = source_trust(cl, iters=3).select(
            "source", F.col("trust").alias("t")
        )
        facts4 = {
            (r.subj, r.obj): r.confidence
            for r in truth_discovery(cl, iters=4).collect()
        }
        import math

        t = {r.source: r.t for r in t3.collect()}
        cl_rows = cl.distinct().collect()
        by_fact = {}
        for r in cl_rows:
            by_fact.setdefault((r.subj, r.obj), []).append(r.source)
        for (subj, obj), srcs in by_fact.items():
            sig = sum(
                round(-math.log(1 - 0.8 * min(t[s], 1 - 1e-6)), 9)
                for s in srcs
            )
            conf = round(round(1 - math.exp(-sig), 9), 6)
            # round-9 trust feeding the check vs round-6 published
            # trust: tolerance one ulp of the 6dp grid
            assert abs(facts4[(subj, obj)] - conf) < 2e-6

    def test_iters_validation(self, spark):
        with pytest.raises(ValueError):
            truth_discovery(_claims(spark), iters=0)


class TestKgAlign:
    def _kgs(self, spark):
        # KG A and KG B describe the same 4 people under different id
        # spaces; names are unique, city is a shared confounder
        a_rows, b_rows = [], []
        for i, (name, city) in enumerate(
            [("ada", "rome"), ("bob", "rome"), ("cam", "oslo"),
             ("dee", "oslo")]
        ):
            a_rows += [(f"a{i}", "name", name), (f"a{i}", "city", city),
                       (f"a{i}", "tier", "gold" if i % 2 else "blue")]
            b_rows += [(f"b{i}", "name", name), (f"b{i}", "city", city),
                       (f"b{i}", "lang", "en")]
        mk = lambda rows: spark.createDataFrame(
            rows, "subj string, pred string, obj string"
        )
        return mk(a_rows), mk(b_rows)

    def test_recovers_identity_alignment(self, spark):
        from coies_spark.ops.kg import kg_align

        out = kg_align(*self._kgs(spark)).collect()
        aligned = {(r.entity_a, r.entity_b) for r in out if r.is_aligned}
        assert aligned == {(f"a{i}", f"b{i}") for i in range(4)}

    def test_alignment_is_one_to_one(self, spark):
        from coies_spark.ops.kg import kg_align

        winners = [r for r in kg_align(*self._kgs(spark)).collect()
                   if r.is_aligned]
        assert len({r.entity_a for r in winners}) == len(winners)
        assert len({r.entity_b for r in winners}) == len(winners)

    def test_stop_attribute_cap(self, spark):
        from coies_spark.ops.kg import kg_align

        a, b = self._kgs(spark)
        # cap 1: city (2 holders/side) and the b-side lang (4) are
        # dropped; only unique names survive as join keys, so every
        # candidate pair IS a name match
        out = kg_align(a, b, max_postings=1).collect()
        assert {(r.entity_a, r.entity_b) for r in out} == {
            (f"a{i}", f"b{i}") for i in range(4)
        }
        # denominators still count the full attribute sets
        assert all(r.n_shared == 1 and r.jaccard == 0.2 for r in out)

    def test_partitioning_invariance(self, spark):
        from coies_spark.ops.kg import kg_align

        a, b = self._kgs(spark)
        one = sorted(map(tuple, kg_align(a, b).collect()))
        two = sorted(
            map(tuple, kg_align(a.repartition(5), b.repartition(3)).collect())
        )
        assert one == two

    def test_max_postings_validation(self, spark):
        from coies_spark.ops.kg import kg_align

        a, b = self._kgs(spark)
        with pytest.raises(ValueError):
            kg_align(a, b, max_postings=0)


class TestTruthDiscoveryWarmStart:
    def test_resume_equals_full_run(self, spark):
        # rounds(2, init=rounds(2)) == rounds(4) exactly — the
        # classifier's incremental-refresh identity, for trust
        cl = _claims(spark)
        t2 = source_trust(cl, iters=2)
        resumed = sorted(
            map(tuple, truth_discovery(cl, iters=2, init=t2).collect())
        )
        full = sorted(map(tuple, truth_discovery(cl, iters=4).collect()))
        assert resumed == full
        rt = sorted(
            map(tuple, source_trust(cl, iters=2, init=t2).collect())
        )
        ft = sorted(map(tuple, source_trust(cl, iters=4).collect()))
        assert rt == ft

    def test_new_source_starts_at_prior(self, spark):
        cl = _claims(spark)
        init = source_trust(cl, iters=2)
        fresh = cl.unionByName(
            spark.createDataFrame(
                [("newbie", "item0", "value", "true0")],
                "source string, subj string, pred string, obj string",
            )
        )
        t = {
            r.source: r.trust
            for r in source_trust(fresh, iters=1, init=init).collect()
        }
        # newbie's round-1 trust derives from the 0.8 prior: it joins
        # an already-corroborated fact, so it lands ABOVE the prior —
        # the point is it participated (no drop, no null)
        assert "newbie" in t and t["newbie"] > 0
