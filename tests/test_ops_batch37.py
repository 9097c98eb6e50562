"""Thirty-seventh batch: the relation-extraction bootstrap
(ops/relext.py) — distant labels train a hashed-feature logistic
detector (trainable op #7, the first trained ON another operator's
output), which then scores the unlabeled complement pairs into a
KG-completion proposal queue.  Label integrity, text equality of the
evidence, detector learning signal, proposal-set disjointness from
the seed, and partitioning invariance."""

import pytest
from pyspark.sql import functions as F

from coies_spark.ops.relext import (
    relation_detector_train,
    relation_proposals,
    relation_training_table,
)

pytestmark = pytest.mark.spark


@pytest.fixture()
def fixture(spark):
    turns = []
    # conversations where the seeded relations have textual evidence,
    # plus noise turns co-mentioning unrelated entities
    for c in range(8):
        turns.append((f"c{c}", 0, "user",
                      f"please scan the table for batch {c}", None))
        turns.append((f"c{c}", 1, "agent",
                      "the merge join consumes the hash output", None))
        turns.append((f"c{c}", 2, "user",
                      f"hash and table appear here together {c}", None))
    t = spark.createDataFrame(
        turns,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string",
    )
    d = spark.createDataFrame(
        [("table", "obj:table"), ("hash", "obj:hash"),
         ("merge join", "act:merge-join"), ("scan", "act:scan")],
        ["surface", "entity"],
    )
    s = spark.createDataFrame(
        [("act:merge-join", "consumes", "obj:hash"),
         ("act:scan", "reads", "obj:table")],
        ["subj", "pred", "obj"],
    )
    return t, d, s


class TestRelationTrainingTable:
    def test_labels_match_seed(self, spark, fixture):
        t, d, s = fixture
        tbl = relation_training_table(t, d, s, rate=1.0, max_len=2)
        rows = tbl.collect()
        seed_pairs = {(r.subj, r.obj) for r in s.collect()}
        for r in rows:
            assert (r.y == 1.0) == ((r.subj, r.obj) in seed_pairs)
        assert any(r.y == 1.0 for r in rows)
        assert any(r.y == 0.0 for r in rows)

    def test_text_is_the_evidence_turn_verbatim(self, spark, fixture):
        t, d, s = fixture
        tbl = relation_training_table(t, d, s, rate=1.0, max_len=2)
        src = {
            (r.conv_id, r.turn_idx): r.text for r in t.collect()
        }
        for r in tbl.collect():
            conv_id, turn_idx = r.pair_id.split("\x1f")[:2]
            assert r.text == src[(conv_id, int(turn_idx))]

    def test_pair_ids_unique(self, spark, fixture):
        t, d, s = fixture
        ids = [
            r.pair_id
            for r in relation_training_table(
                t, d, s, rate=1.0, max_len=2
            ).collect()
        ]
        assert len(ids) == len(set(ids))

    def test_na_sampling_nested(self, spark, fixture):
        # raising the rate keeps every previously emitted NA row
        t, d, s = fixture
        low = {
            r.pair_id
            for r in relation_training_table(
                t, d, s, rate=0.25, max_len=2
            ).collect()
        }
        high = {
            r.pair_id
            for r in relation_training_table(
                t, d, s, rate=1.0, max_len=2
            ).collect()
        }
        assert low <= high


class TestRelationDetector:
    def test_detector_separates_classes(self, spark, fixture):
        # after training, mean p over positives must exceed mean p
        # over negatives ON THE TRAINING SET (convex model, full-batch
        # GD — separation on seen data is the minimal health bar);
        # score with the trained weights directly (the _scores face
        # the detector itself publishes through relation_proposals)
        from coies_spark.ops.classify import _scores, hashed_counts

        t, d, s = fixture
        tbl = relation_training_table(
            t, d, s, rate=1.0, max_len=2
        ).cache()
        w = relation_detector_train(t, d, s, rate=1.0, max_len=2)
        docs = tbl.select(F.col("pair_id").alias("doc_id"), "text")
        scored = _scores(hashed_counts(docs), w).join(
            tbl.select(F.col("pair_id").alias("doc_id"), "y"), "doc_id"
        )
        m = {
            r.y: r.mp
            for r in scored.groupBy("y")
            .agg(F.avg("p").alias("mp"))
            .collect()
        }
        assert m[1.0] > m[0.0]

    def test_weights_deterministic_under_partitioning(
        self, spark, fixture
    ):
        t, d, s = fixture
        a = sorted(
            map(
                tuple,
                relation_detector_train(
                    t, d, s, rate=1.0, max_len=2
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                relation_detector_train(
                    t.repartition(7), d, s, rate=1.0, max_len=2
                ).collect(),
            )
        )
        assert a == b


class TestRelationProposals:
    def test_no_seed_pair_proposed(self, spark, fixture):
        t, d, s = fixture
        props = relation_proposals(t, d, s, rate=1.0, max_len=2)
        got = {(r.subj, r.obj) for r in props.collect()}
        seed_pairs = {(r.subj, r.obj) for r in s.collect()}
        assert got and not (got & seed_pairs)

    def test_proposed_flag_consistent(self, spark, fixture):
        t, d, s = fixture
        rows = relation_proposals(
            t, d, s, threshold=0.2, rate=1.0, max_len=2
        ).collect()
        for r in rows:
            assert r.proposed == (r.score >= 0.2)
            assert r.n_evidence >= 1
            assert 0.0 <= r.score <= 1.0
