"""Twenty-third batch: AIDA-style coherence disambiguation (ops.kg)."""

import pytest

from coies_spark.ops.kg import disambiguate_by_coherence

pytestmark = pytest.mark.spark


def _frames(spark):
    mentions = spark.createDataFrame(
        [
            ("c1", "jaguar"), ("c1", "engine"), ("c1", "brakes"),
            ("c2", "jaguar"), ("c2", "savanna"),
            ("c3", "jaguar"),  # no seeds at all
        ],
        "conv_id string, surface string",
    )
    candidates = spark.createDataFrame(
        [
            ("jaguar", "car:jaguar"), ("jaguar", "animal:jaguar"),
            ("engine", "part:engine"), ("brakes", "part:brakes"),
            ("savanna", "place:savanna"),
        ],
        "surface string, entity string",
    )
    edges = spark.createDataFrame(
        [
            ("car:jaguar", "part:engine", 5.0),
            ("car:jaguar", "part:brakes", 3.0),
            ("animal:jaguar", "place:savanna", 4.0),
        ],
        "a string, b string, weight double",
    )
    return mentions, candidates, edges


class TestDisambiguateByCoherence:
    def test_context_picks_the_sense(self, spark):
        m, c, e = _frames(spark)
        got = {
            (r.conv_id, r.surface): r
            for r in disambiguate_by_coherence(m, c, e).collect()
        }
        # c1 talks about engines/brakes -> the car sense, score 5+3
        r1 = got[("c1", "jaguar")]
        assert r1.entity == "car:jaguar"
        assert r1.coherence == 8.0
        assert r1.n_candidates == 2
        # c2 talks about the savanna -> the animal sense
        assert got[("c2", "jaguar")].entity == "animal:jaguar"
        assert got[("c2", "jaguar")].coherence == 4.0

    def test_unsupported_mention_falls_back_deterministically(self, spark):
        m, c, e = _frames(spark)
        got = {
            (r.conv_id, r.surface): r
            for r in disambiguate_by_coherence(m, c, e).collect()
        }
        r3 = got[("c3", "jaguar")]  # no seeds in c3
        assert r3.entity == "animal:jaguar"  # smallest entity string
        assert r3.coherence is None

    def test_unambiguous_pass_through(self, spark):
        m, c, e = _frames(spark)
        got = {
            (r.conv_id, r.surface): r
            for r in disambiguate_by_coherence(m, c, e).collect()
        }
        assert got[("c1", "engine")].entity == "part:engine"
        assert got[("c1", "engine")].coherence is None
        assert got[("c1", "engine")].n_candidates == 1

    def test_one_row_per_mention(self, spark):
        m, c, e = _frames(spark)
        out = disambiguate_by_coherence(m, c, e)
        assert out.count() == 6
        assert (
            out.select("conv_id", "surface").distinct().count() == 6
        )

    def test_duplicate_dictionary_rows_do_not_fake_ambiguity(self, spark):
        m, c, e = _frames(spark)
        doubled = c.unionByName(c)  # merged dictionaries repeat rows
        a = {
            (r.conv_id, r.surface): (r.entity, r.n_candidates)
            for r in disambiguate_by_coherence(m, c, e).collect()
        }
        b = {
            (r.conv_id, r.surface): (r.entity, r.n_candidates)
            for r in disambiguate_by_coherence(m, doubled, e).collect()
        }
        assert a == b
        assert b[("c1", "engine")][1] == 1  # still a seed

    def test_edge_direction_irrelevant(self, spark):
        m, c, e = _frames(spark)
        flipped = e.selectExpr("b as a", "a as b", "weight")
        a = {
            (r.conv_id, r.surface): r.entity
            for r in disambiguate_by_coherence(m, c, e).collect()
        }
        b = {
            (r.conv_id, r.surface): r.entity
            for r in disambiguate_by_coherence(m, c, flipped).collect()
        }
        assert a == b
