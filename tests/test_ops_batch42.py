"""Forty-second batch: definite-NP (nominal) coreference —
``resolve_nominals``, the type-aware second anaphora class next to
the recency pronoun baseline."""

import pytest

from coies_spark.ops.kg import resolve_nominals

pytestmark = pytest.mark.spark


def _tt(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )


def _dict(spark):
    return spark.createDataFrame(
        [("spark", "eng:spark"), ("table", "obj:table"),
         ("postgres", "eng:pg")],
        ["surface", "entity"],
    )


def _types(spark):
    return spark.createDataFrame(
        [("eng:spark", "engine"), ("eng:pg", "engine"),
         ("obj:table", "object")],
        ["entity", "entity_type"],
    )


class TestResolveNominals:
    def test_resolves_to_last_mention_of_type(self, spark):
        t = _tt(spark, [
            ("c1", 0, "we started spark today"),
            ("c1", 1, "later postgres joined"),
            ("c1", 2, "the engine crashed"),
        ])
        rows = resolve_nominals(t, _dict(spark), _types(spark)).collect()
        assert len(rows) == 1
        r = rows[0]
        # nearest PRECEDING engine-typed mention is postgres (turn 1)
        assert (r.type_word, r.entity, r.entity_turn, r.distance) == (
            "engine", "eng:pg", 1, 1)

    def test_dictionary_surface_is_not_an_anaphor(self, spark):
        # "the table": table IS a dictionary surface — direct mention
        # outranks the anaphoric reading, no anaphor row
        t = _tt(spark, [("c1", 0, "we scanned the table")])
        types = spark.createDataFrame(
            [("obj:table", "table")], ["entity", "entity_type"]
        )
        assert resolve_nominals(t, _dict(spark), types).count() == 0

    def test_no_preceding_mention_is_null(self, spark):
        t = _tt(spark, [("c1", 0, "the engine hums")])
        r = resolve_nominals(t, _dict(spark), _types(spark)).collect()[0]
        assert r.entity is None and r.entity_turn is None

    def test_determiner_required(self, spark):
        t = _tt(spark, [("c1", 0, "spark ran and engine hums")])
        assert resolve_nominals(
            t, _dict(spark), _types(spark)
        ).count() == 0

    def test_multi_typed_entity_serves_both_types(self, spark):
        types = spark.createDataFrame(
            [("eng:spark", "engine"), ("eng:spark", "framework")],
            ["entity", "entity_type"],
        )
        t = _tt(spark, [
            ("c1", 0, "spark started"),
            ("c1", 1, "the engine hummed and the framework scaled"),
        ])
        rows = {
            r.type_word: r.entity
            for r in resolve_nominals(t, _dict(spark), types).collect()
        }
        assert rows == {"engine": "eng:spark", "framework": "eng:spark"}

    def test_types_are_case_normalized(self, spark):
        types = spark.createDataFrame(
            [("eng:spark", "Engine")], ["entity", "entity_type"]
        )
        t = _tt(spark, [
            ("c1", 0, "spark started"), ("c1", 1, "the engine hums"),
        ])
        rows = resolve_nominals(t, _dict(spark), types).collect()
        assert len(rows) == 1 and rows[0].entity == "eng:spark"

    def test_conversations_are_independent(self, spark):
        t = _tt(spark, [
            ("c1", 0, "spark started"),
            ("c2", 0, "the engine hums"),
        ])
        r = resolve_nominals(t, _dict(spark), _types(spark)).collect()[0]
        assert r.conv_id == "c2" and r.entity is None


class TestSignedConfidence:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "subj string, pred string, obj string, ts long,"
            " score double, negated boolean",
        )

    def test_refutation_lowers_belief(self, spark):
        from coies_spark.ops.kg import signed_confidence

        ev = self._ev(spark, [
            ("a", "p", "x", 1, 0.5, False),
            ("a", "p", "x", 2, 0.5, False),
            ("a", "p", "x", 3, 0.5, True),
        ])
        r = signed_confidence(ev).collect()[0]
        assert (r.n_support, r.n_refute) == (2, 1)
        assert (r.first_ts, r.last_ts) == (1, 3)
        assert r.support == 0.75 and r.refute == 0.5
        # confidence = support * (1 - refute)
        assert r.confidence == 0.375

    def test_only_refutations_is_zero(self, spark):
        from coies_spark.ops.kg import signed_confidence

        ev = self._ev(spark, [("a", "p", "x", 1, 0.9, True)])
        r = signed_confidence(ev).collect()[0]
        assert r.support == 0.0 and r.confidence == 0.0
        assert r.refute == 0.9

    def test_unrefuted_equals_plain_noisy_or(self, spark):
        from coies_spark.ops.kg import signed_confidence, triple_confidence

        rows = [("a", "p", "x", i, 0.1 * (i + 1), False)
                for i in range(4)]
        ev = self._ev(spark, rows)
        signed = signed_confidence(ev).collect()[0]
        plain = triple_confidence(
            ev.select("subj", "pred", "obj", "ts", "score")
        ).collect()[0]
        assert signed.confidence == plain.confidence
        assert signed.support == plain.confidence


class TestApplyRules:
    def _b(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "subj string, pred string, obj string, confidence double",
        )

    def _r(self, spark, rows):
        return spark.createDataFrame(
            rows, "p1 string, p2 string, p3 string, confidence double"
        )

    def test_derives_product_tnorm_confidence(self, spark):
        from coies_spark.ops.kg import apply_rules

        b = self._b(spark, [
            ("a", "r1", "b", 0.8),
            ("b", "r2", "c", 0.5),
        ])
        r = self._r(spark, [("r1", "r2", "r3", 0.5)])
        got = apply_rules(b, r).collect()
        assert len(got) == 1
        row = got[0]
        assert (row.subj, row.pred, row.obj) == ("a", "r3", "c")
        assert row.n_derivations == 1
        assert row.confidence == 0.2  # 0.5 * 0.8 * 0.5

    def test_max_over_derivations(self, spark):
        from coies_spark.ops.kg import apply_rules

        b = self._b(spark, [
            ("a", "r1", "m1", 1.0), ("m1", "r2", "c", 0.4),
            ("a", "r1", "m2", 1.0), ("m2", "r2", "c", 0.9),
        ])
        r = self._r(spark, [("r1", "r2", "r3", 1.0)])
        row = apply_rules(b, r).collect()[0]
        assert row.n_derivations == 2
        assert row.confidence == 0.9

    def test_existing_facts_are_not_emitted(self, spark):
        from coies_spark.ops.kg import apply_rules

        b = self._b(spark, [
            ("a", "r1", "b", 1.0),
            ("b", "r2", "c", 1.0),
            ("a", "r3", "c", 1.0),  # the derivable fact already held
        ])
        r = self._r(spark, [("r1", "r2", "r3", 1.0)])
        assert apply_rules(b, r).count() == 0

    def test_min_confidence_filters_derivations(self, spark):
        from coies_spark.ops.kg import apply_rules

        b = self._b(spark, [
            ("a", "r1", "b", 0.3), ("b", "r2", "c", 0.3),
        ])
        r = self._r(spark, [("r1", "r2", "r3", 1.0)])
        assert apply_rules(b, r, min_confidence=0.5).count() == 0
        assert apply_rules(b, r, min_confidence=0.05).count() == 1

    def test_composes_with_mined_rules(self, spark):
        from coies_spark.ops.kg import apply_rules, mine_path_rules
        from pyspark.sql import functions as F

        # catalog KG with the direct shortcut on SOME parts: the
        # mined rule completes the others
        rows = (
            [(f"p{i}", "has_brand", "b1") for i in range(4)]
            + [("b1", "has_type", "t1")]
            + [(f"p{i}", "part_type", "t1") for i in range(2)]
        )
        t = spark.createDataFrame(
            rows, "subj string, pred string, obj string"
        )
        beliefs = t.select(
            "subj", "pred", "obj", F.lit(1.0).alias("confidence")
        )
        new = apply_rules(
            beliefs, mine_path_rules(t, min_support=2)
        )
        derived = {
            (r.subj, r.pred, r.obj)
            for r in new.where("pred = 'part_type'").collect()
        }
        # exactly the parts MISSING the shortcut get it derived
        assert derived == {("p2", "part_type", "t1"),
                           ("p3", "part_type", "t1")}


class TestForwardChain:
    def test_multi_round_closure_with_decaying_confidence(self, spark):
        from coies_spark.ops.kg import forward_chain

        b = spark.createDataFrame(
            [("a", "sub", "b", 1.0), ("b", "sub", "c", 1.0),
             ("c", "sub", "d", 1.0)],
            "subj string, pred string, obj string, confidence double",
        )
        r = spark.createDataFrame(
            [("sub", "sub", "sub", 0.5)],
            "p1 string, p2 string, p3 string, confidence double",
        )
        rows = {
            (x.subj, x.obj): (x.round, x.confidence)
            for x in forward_chain(b, r, rounds=3).collect()
        }
        # round 1: grandparents at 0.5; round 2: the 3-hop closure —
        # best derivation chains a round-1 fact (conf 0.5) with a
        # base fact: 0.5 * 0.5 * 1.0 = 0.25
        assert rows[("a", "c")] == (1, 0.5)
        assert rows[("b", "d")] == (1, 0.5)
        assert rows[("a", "d")] == (2, 0.25)
        # round 3 derives nothing new (chain exhausted)
        assert len(rows) == 3

    def test_first_round_wins_emission(self, spark):
        from coies_spark.ops.kg import forward_chain

        # (a,c) derivable in round 1 stays tagged round 1 even though
        # round 2 could re-derive it
        b = spark.createDataFrame(
            [("a", "sub", "b", 1.0), ("b", "sub", "c", 1.0)],
            "subj string, pred string, obj string, confidence double",
        )
        r = spark.createDataFrame(
            [("sub", "sub", "sub", 1.0)],
            "p1 string, p2 string, p3 string, confidence double",
        )
        rows = forward_chain(b, r, rounds=2).collect()
        assert [(x.subj, x.obj, x.round) for x in rows] == [
            ("a", "c", 1)
        ]

    def test_rounds_validation(self, spark):
        from coies_spark.ops.kg import forward_chain

        b = spark.createDataFrame(
            [("a", "p", "b", 1.0)],
            "subj string, pred string, obj string, confidence double",
        )
        r = spark.createDataFrame(
            [("p", "p", "p", 1.0)],
            "p1 string, p2 string, p3 string, confidence double",
        )
        import pytest as _pt

        with _pt.raises(ValueError):
            forward_chain(b, r, rounds=0)


class TestCorefMentions:
    def test_all_three_routes_feed_one_table(self, spark):
        from coies_spark.ops.kg import coref_mentions

        t = _tt(spark, [
            ("c1", 0, "spark crashed"),
            ("c1", 1, "it restarted"),
            ("c1", 2, "the engine recovered"),
        ])
        d = spark.createDataFrame(
            [("spark", "eng:spark")], ["surface", "entity"]
        )
        ty = spark.createDataFrame(
            [("eng:spark", "engine")], ["entity", "entity_type"]
        )
        rows = coref_mentions(t, d, ty).collect()
        by_src = {r.source: r for r in rows}
        assert set(by_src) == {"direct", "pronoun", "nominal"}
        assert all(r.entity == "eng:spark" for r in rows)
        assert by_src["direct"].score == 1.0
        # pronoun at turn 1 (distance 1) and nominal at turn 2
        # (distance 2): rational recency decay
        assert by_src["pronoun"].score == 0.5
        assert round(by_src["nominal"].score, 6) == 0.333333

    def test_unresolved_anaphors_contribute_nothing(self, spark):
        from coies_spark.ops.kg import coref_mentions

        t = _tt(spark, [("c1", 0, "it hums and the engine sings")])
        d = spark.createDataFrame(
            [("spark", "eng:spark")], ["surface", "entity"]
        )
        ty = spark.createDataFrame(
            [("eng:spark", "engine")], ["entity", "entity_type"]
        )
        assert coref_mentions(t, d, ty).count() == 0
