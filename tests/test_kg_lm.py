"""Unit tests for the KG evidence→belief layer (ops.kg) and the
CCNet-style bigram-LM perplexity filter (ops.lm)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from coies_spark.ops import kg, lm

pytestmark = pytest.mark.spark


# ---------------------------------------------------------------------------
# temporal_triples
# ---------------------------------------------------------------------------

EV_SCHEMA = "subj string, pred string, obj string, ts long"


def test_temporal_triples_intervals(spark):
    ev = spark.createDataFrame(
        [
            # u1: a a b a  → three versions
            ("u1", "p", "a", 10),
            ("u1", "p", "a", 20),
            ("u1", "p", "b", 30),
            ("u1", "p", "a", 40),
            # u2: single run
            ("u2", "p", "x", 5),
        ],
        EV_SCHEMA,
    )
    rows = {
        (r.subj, r.version): r
        for r in kg.temporal_triples(ev).collect()
    }
    assert len(rows) == 4
    v1, v2, v3 = rows[("u1", 1)], rows[("u1", 2)], rows[("u1", 3)]
    assert (v1.obj, v1.valid_from, v1.valid_to, v1.is_current) == (
        "a", 10, 30, False)
    assert (v2.obj, v2.valid_from, v2.valid_to, v2.is_current) == (
        "b", 30, 40, False)
    assert (v3.obj, v3.valid_from, v3.valid_to, v3.is_current) == (
        "a", 40, None, True)
    u2 = rows[("u2", 1)]
    assert (u2.obj, u2.valid_from, u2.valid_to, u2.is_current) == (
        "x", 5, None, True)


def test_temporal_triples_same_ts_tiebreak(spark):
    # equal timestamps order by obj → 'a' run then 'b' run, always
    ev = spark.createDataFrame(
        [("u", "p", "b", 7), ("u", "p", "a", 7)], EV_SCHEMA
    )
    out = kg.temporal_triples(ev).orderBy("version").collect()
    assert [(r.obj, r.version) for r in out] == [("a", 1), ("b", 2)]
    assert out[0].valid_to == 7 and out[1].is_current


# ---------------------------------------------------------------------------
# triple_confidence
# ---------------------------------------------------------------------------


def test_triple_confidence_noisy_or(spark):
    ev = spark.createDataFrame(
        [
            ("s", "p", "o", 1, 0.5),
            ("s", "p", "o", 9, 0.25),
            ("s", "p", "o2", 4, 0.1),
        ],
        EV_SCHEMA + ", score double",
    )
    out = {r.obj: r for r in kg.triple_confidence(ev).collect()}
    o = out["o"]
    assert o.n_evidence == 2 and (o.first_ts, o.last_ts) == (1, 9)
    assert o.confidence == pytest.approx(1 - 0.5 * 0.75, abs=1e-6)
    assert out["o2"].confidence == pytest.approx(0.1, abs=1e-6)


def test_triple_confidence_clamps_perfect_score(spark):
    # score = 1.0 must not produce log(0) → NULL; clamp keeps it ~1
    ev = spark.createDataFrame([("s", "p", "o", 1, 1.0)],
                               EV_SCHEMA + ", score double")
    [r] = kg.triple_confidence(ev).collect()
    assert r.confidence is not None and r.confidence >= 0.999999


# ---------------------------------------------------------------------------
# khop_reachability
# ---------------------------------------------------------------------------


def test_khop_min_hops_on_chain(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")],
        "src string, dst string",
    )
    out = {(r.src, r.dst): r.hops for r in
           kg.khop_reachability(e, k=3).collect()}
    # a→c is reachable in 2 hops but the DIRECT edge wins (min)
    assert out[("a", "c")] == 1
    assert out[("a", "d")] == 2  # a→c→d beats a→b→c→d
    assert out[("b", "d")] == 2
    assert out[("a", "b")] == 1
    assert ("d", "a") not in out


def test_khop_k1_is_edge_set(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "b")], "src string, dst string"
    )
    out = kg.khop_reachability(e, k=1).collect()
    # dedup + self-loop filter
    assert [(r.src, r.dst, r.hops) for r in out] == [("a", "b", 1)]
    with pytest.raises(ValueError):
        kg.khop_reachability(e, k=0)


# ---------------------------------------------------------------------------
# entity_degrees / mention_evidence
# ---------------------------------------------------------------------------


def test_entity_degrees(spark):
    tr = spark.createDataFrame(
        [
            ("s1", "p1", "o1"),
            ("s1", "p1", "o2"),
            ("s1", "p2", "o1"),
            ("s2", "p1", "o1"),
        ],
        "subj string, pred string, obj string",
    )
    out = {r.entity: r for r in kg.entity_degrees(tr).collect()}
    assert (out["s1"].out_degree, out["s1"].in_degree,
            out["s1"].n_preds) == (3, 0, 2)
    assert (out["o1"].out_degree, out["o1"].in_degree,
            out["o1"].n_preds) == (0, 3, 2)
    assert (out["s2"].out_degree, out["o2"].in_degree) == (1, 1)


def test_mention_evidence_contains_match(spark):
    t = spark.createDataFrame(
        [
            ("c1", 0, "user", "we ran a Table Scan today", None, None),
            ("c1", 1, "assistant", "nothing relevant", None, None),
            ("c2", 2, "user", "table scan and hash join", None, None),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    d = spark.createDataFrame(
        [("table scan", "mentions_op"), ("hash join", "mentions_op")],
        ["surface", "pred"],
    )
    out = kg.mention_evidence(t, d).collect()
    got = {(r.conv_id, r.obj) for r in out}
    # case-insensitive contains; no match on the clean turn
    assert got == {("c1", "table scan"), ("c2", "table scan"),
                   ("c2", "hash join")}
    s = {r.conv_id: r.score for r in out if r.obj == "table scan"}
    assert s["c1"] == pytest.approx(0.5) and s["c2"] == pytest.approx(0.25)


# ---------------------------------------------------------------------------
# lm_perplexity
# ---------------------------------------------------------------------------


def test_lm_perplexity_hand_computed(spark):
    # train slice = doc 0 only (train_mod=2): bigrams of "a b a b c"
    #   c(a b)=2  c(b a)=1  c(b c)=1 ; unigram-over-w1: a:2 b:2
    #   N=4, V=2
    docs = spark.createDataFrame(
        [(0, "a b a b c"), (1, "a b c d")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in
           lm.lm_perplexity(docs, alpha=0.4, train_mod=2).collect()}

    d0 = out[0]
    # scored: (a,b)=ln(2/2)=0, (b,a)=ln(1/2), (a,b)=0, (b,c)=ln(1/2)
    exp_nll0 = -(0 + math.log(0.5) + 0 + math.log(0.5)) / 4
    assert d0.n_scored == 4 and d0.n_backoff == 0
    assert d0.nll == pytest.approx(exp_nll0, abs=1e-6)
    assert d0.ppl == pytest.approx(math.exp(exp_nll0), abs=1e-5)

    d1 = out[1]
    # (a,b) seen → ln(1); (b,c) seen → ln(1/2);
    # (c,d): unseen bigram, d OOV → ln(0.4 * (0+1) / (4+2))
    back = math.log(0.4 * 1 / 6)
    exp_nll1 = -(0 + math.log(0.5) + back) / 3
    assert d1.n_scored == 3 and d1.n_backoff == 1
    assert d1.nll == pytest.approx(exp_nll1, abs=1e-6)


def test_lm_perplexity_buckets_and_short_docs(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b a b a b"), (1, "a b"), (2, "solo"), (3, "")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in
           lm.lm_perplexity(docs, head_ppl=1.5, tail_ppl=3.0).collect()}
    # <2-token docs produce no bigram and drop out
    assert set(out) == {0, 1}
    assert out[0].bucket in {"head", "middle", "tail"}
    # doc 0 is pure training text → ppl close to the bigram entropy
    assert out[0].ppl < 3.0


def test_lm_perplexity_plan_shapes(spark):
    """Scale guards: totals are broadcast (no shuffled join for the
    1-row table) and the count aggregations run map-side partials."""
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "b c d")], ["doc_id", "text"]
    )
    df = lm.lm_perplexity(docs)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "BroadcastNestedLoopJoin" in plan  # 1-row totals crossJoin
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan or "partial_sum" in plan


# ---------------------------------------------------------------------------
# alias_candidates
# ---------------------------------------------------------------------------


def test_alias_candidates_blocked_pairs(spark):
    surf = spark.createDataFrame(
        [("acme holdings",), ("acme holding",), ("acme hldings",),
         ("zenith",), ("zenith!",), ("unrelated",), ("a",)],
        ["surface"],
    )
    out = {(r.a, r.b): r.dist for r in
           kg.alias_candidates(surf, max_dist=2).collect()}
    assert out[("acme holding", "acme holdings")] == 1
    assert out[("acme hldings", "acme holdings")] == 1
    assert out[("zenith", "zenith!")] == 1
    # dist 2 via two edits, shared prefix block
    assert out[("acme hldings", "acme holding")] == 2
    assert not any("unrelated" in k for k in out)
    # canonical ordering + no self pairs
    assert all(a < b for a, b in out)


def test_alias_candidates_blocking_miss_documented(spark):
    # edits inside BOTH affixes escape the blocking (documented trade)
    surf = spark.createDataFrame([("xxcorexx",), ("yycoreyy",)], ["surface"])
    assert kg.alias_candidates(surf, max_dist=2).count() == 0
    with pytest.raises(ValueError):
        kg.alias_candidates(surf, max_dist=0)


def test_aqe_skew_join_splits_hot_key(spark):
    """The north rule names AQE skew-join handling for hot entities:
    force a skewed shuffle join and assert AQE actually splits the
    hot partition (skew=true in the executed adaptive plan)."""
    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8KB",
        "spark.sql.shuffle.partitions": "8",
    }
    import pyspark.sql.functions as F
    old = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        # one hot entity carries ~90% of the fact rows
        fact = spark.range(200_000).select(
            F.when(F.col("id") % 10 != 0, "hot-entity")
            .otherwise(F.concat(F.lit("e"), F.col("id")))
            .alias("subj"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        dim = spark.range(50_000).select(
            F.when(F.col("id") == 0, "hot-entity")
            .otherwise(F.concat(F.lit("e"), F.col("id")))
            .alias("subj"),
            F.col("id").alias("meta"),
        )
        # collect on THE SAME DataFrame whose query execution we
        # inspect (count() would spawn its own execution and leave
        # this one un-finalized)
        joined = fact.join(dim, "subj").select("meta")
        assert len(joined.collect()) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# merge_beliefs (belief compaction)
# ---------------------------------------------------------------------------

SNAP_SCHEMA = (
    "subj string, pred string, obj string, n_evidence long, "
    "first_ts long, last_ts long, confidence double"
)


def test_merge_beliefs_noisy_or_fold(spark):
    snaps = spark.createDataFrame(
        [
            ("s", "p", "o", 2, 10, 20, 0.5),
            ("s", "p", "o", 3, 30, 40, 0.25),
            ("s", "p", "other", 1, 5, 5, 0.4),
        ],
        SNAP_SCHEMA,
    )
    rows = {r.obj: r for r in kg.merge_beliefs(snaps).collect()}
    o = rows["o"]
    assert (o.n_windows, o.n_evidence, o.first_ts, o.last_ts) == (
        2, 5, 10, 40,
    )
    assert o.confidence == round(1 - 0.5 * 0.75, 6)
    assert rows["other"].n_windows == 1
    assert rows["other"].confidence == 0.4


def test_merge_beliefs_is_incremental(spark):
    """merge(old_compacted ∪ new_windows) == merge(all windows):
    the upsert/resume property of the belief store."""
    windows = [
        ("s", "p", "o", 2, 10, 20, 0.5),
        ("s", "p", "o", 3, 30, 40, 0.25),
        ("s", "p", "o", 1, 50, 60, 0.125),
    ]
    all_at_once = kg.merge_beliefs(
        spark.createDataFrame(windows, SNAP_SCHEMA)
    ).collect()[0]
    old = kg.merge_beliefs(
        spark.createDataFrame(windows[:2], SNAP_SCHEMA)
    )
    # the compacted view feeds back in: confidence in, confidence out
    merged = kg.merge_beliefs(
        old.unionByName(
            spark.createDataFrame(windows[2:], SNAP_SCHEMA).withColumn(
                "n_windows", F.lit(1).cast("long")
            ).select(old.columns)
        )
    ).collect()[0]
    assert merged.n_evidence == all_at_once.n_evidence == 6
    # the compacted row carries its window count through re-compaction
    assert merged.n_windows == all_at_once.n_windows == 3
    assert merged.first_ts == 10 and merged.last_ts == 60
    # one intermediate 6dp rounding step: equal to 1e-6
    assert abs(merged.confidence - all_at_once.confidence) <= 1e-6
    assert all_at_once.confidence == round(
        1 - (1 - 0.5) * (1 - 0.25) * (1 - 0.125), 6
    )


def test_merge_beliefs_matches_stream_then_fold(spark):
    """Batch triple_confidence over all evidence ≡ window-then-merge
    (up to the intermediate 6dp rounding)."""
    ev_rows = [
        ("s", "p", "o", t, 0.2 + 0.05 * (t % 4)) for t in range(1, 9)
    ]
    ev = spark.createDataFrame(
        ev_rows, "subj string, pred string, obj string, ts long, score double"
    )
    direct = kg.triple_confidence(ev).collect()[0]
    s = F.least(F.col("score"), F.lit(1.0 - 1e-6))
    windows = (
        ev.withColumn("w", F.col("ts") % 2)
        .select(
            "w", "subj", "pred", "obj", "ts",
            F.log(F.lit(1.0) - s).alias("lg"),
        )
        .groupBy("w", "subj", "pred", "obj")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_evidence"),
            F.min("ts").cast("long").alias("first_ts"),
            F.max("ts").cast("long").alias("last_ts"),
            F.round(F.lit(1.0) - F.exp(F.sum("lg")), 6).alias("confidence"),
        )
    )
    folded = kg.merge_beliefs(windows).collect()[0]
    assert folded.n_evidence == direct.n_evidence == 8
    assert folded.first_ts == direct.first_ts
    assert folded.last_ts == direct.last_ts
    assert abs(folded.confidence - direct.confidence) < 2e-6


def test_merge_beliefs_without_ts_columns(spark):
    snaps = spark.createDataFrame(
        [("s", "p", "o", 2, 0.5), ("s", "p", "o", 1, 0.5)],
        "subj string, pred string, obj string, n_evidence long, confidence double",
    )
    row = kg.merge_beliefs(snaps).collect()[0]
    assert row.first_ts is None and row.last_ts is None
    assert row.confidence == 0.75


def test_functional_conflicts_resolution_order(spark):
    # subj s1/pred born_in has three objs: confidence ranks first,
    # last_ts breaks the belief tie, obj asc would break exact ties
    beliefs = spark.createDataFrame(
        [
            ("s1", "born_in", "paris", 3, 100, 0.9),
            ("s1", "born_in", "london", 2, 200, 0.8),
            ("s1", "born_in", "rome", 1, 300, 0.8),
            ("s2", "born_in", "oslo", 5, 100, 0.99),  # no conflict
        ],
        "subj string, pred string, obj string, n_evidence long,"
        " last_ts long, confidence double",
    )
    rows = kg.functional_conflicts(beliefs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.subj, r.pred, r.n_objs, r.total_evidence) == (
        "s1", "born_in", 3, 6)
    assert (r.winner_obj, r.winner_conf) == ("paris", 0.9)
    # 0.8 tie between london/rome: later last_ts (rome) wins rank 2
    assert r.runner_up_obj == "rome"
    assert abs(r.margin - 0.1) < 1e-9


def test_functional_conflicts_exact_tie_breaks_on_obj(spark):
    beliefs = spark.createDataFrame(
        [
            ("s", "p", "bbb", 1, 50, 0.7),
            ("s", "p", "aaa", 1, 50, 0.7),
        ],
        "subj string, pred string, obj string, n_evidence long,"
        " last_ts long, confidence double",
    )
    r = kg.functional_conflicts(beliefs).collect()[0]
    assert r.winner_obj == "aaa" and r.runner_up_obj == "bbb"
    assert r.margin == 0.0


def test_functional_conflicts_empty_when_functional(spark):
    beliefs = spark.createDataFrame(
        [("s1", "p", "x", 1, 1, 0.5), ("s2", "p", "y", 1, 1, 0.5)],
        "subj string, pred string, obj string, n_evidence long,"
        " last_ts long, confidence double",
    )
    assert kg.functional_conflicts(beliefs).count() == 0


def _mk_transcripts(spark, rows):
    return spark.createDataFrame(
        [(c, i, "user", t, None, None) for c, i, t in rows],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )


def test_resolve_pronouns_nearest_preceding(spark):
    d = spark.createDataFrame(
        [("acme", "org:acme"), ("zorg", "org:zorg")],
        ["surface", "entity"],
    )
    rows = [
        ("c1", 0, "acme shipped and it broke"),
        ("c1", 1, "zorg fixed it quickly"),
        ("c2", 0, "it has no antecedent"),
    ]
    got = {(r.conv_id, r.turn_idx, r.pos): r for r in
           kg.resolve_pronouns(_mk_transcripts(spark, rows), d,
                               pronouns=("it",)).collect()}
    # turn 0: "it" at pos 3 resolves to acme (pos 0, same turn)
    r0 = got[("c1", 0, 3)]
    assert (r0.entity, r0.entity_turn, r0.entity_pos, r0.distance) == (
        "org:acme", 0, 0, 0)
    # turn 1: "it" resolves to zorg (same turn), not the older acme
    r1 = got[("c1", 1, 2)]
    assert (r1.entity, r1.distance) == ("org:zorg", 0)
    # no antecedent -> NULL entity, NULL distance
    r2 = got[("c2", 0, 0)]
    assert r2.entity is None and r2.distance is None


def test_resolve_pronouns_mention_in_same_turn_after_pronoun(spark):
    d = spark.createDataFrame([("acme", "org:acme")], ["surface", "entity"])
    rows = [("c", 0, "it precedes acme here"),
            ("c", 1, "now it follows")]
    got = {(r.turn_idx, r.pos): r for r in
           kg.resolve_pronouns(_mk_transcripts(spark, rows), d,
                               pronouns=("it",)).collect()}
    # pos-0 "it" precedes the mention -> unresolved
    assert got[(0, 0)].entity is None
    # next turn's "it" sees the turn-0 mention, distance 1
    assert got[(1, 1)].entity == "org:acme"
    assert got[(1, 1)].distance == 1


def test_resolve_pronouns_partition_invariant(spark):
    d = spark.createDataFrame([("acme", "org:acme")], ["surface", "entity"])
    rows = [("c", i, "acme then it" if i % 2 == 0 else "just it")
            for i in range(8)]
    df1 = _mk_transcripts(spark, rows).repartition(7)
    df2 = _mk_transcripts(spark, rows).repartition(2)
    r1 = sorted(map(tuple, kg.resolve_pronouns(df1, d, ("it",)).collect()))
    r2 = sorted(map(tuple, kg.resolve_pronouns(df2, d, ("it",)).collect()))
    assert r1 == r2 and len(r1) == 8


# ---------------------------------------------------------------------------
# kg_negatives (corrupted-tail training pairs)
# ---------------------------------------------------------------------------

def _mk_triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )


def test_kg_negatives_shape_and_constraints(spark):
    rows = [("s%d" % i, "p", "o%d" % (i % 4)) for i in range(8)]
    out = kg.kg_negatives(_mk_triples(spark, rows), k=2).collect()
    # every negative is type-consistent (same pred domain) and != obj
    dom = {"o0", "o1", "o2", "o3"}
    for r in out:
        assert r.neg_obj in dom and r.neg_obj != r.obj
    # k negatives per positive (m=4 > 1, so no drops)
    assert len(out) == 8 * 2
    assert {r.neg_rank for r in out} == {0, 1}


def test_kg_negatives_deterministic_and_partition_invariant(spark):
    rows = [("s%d" % i, "p%d" % (i % 2), "o%d" % (i % 5))
            for i in range(20)]
    a = sorted(map(tuple, kg.kg_negatives(
        _mk_triples(spark, rows).repartition(7), k=2).collect()))
    b = sorted(map(tuple, kg.kg_negatives(
        _mk_triples(spark, rows).repartition(2), k=2).collect()))
    assert a == b and len(a) > 0


def test_kg_negatives_single_object_domain_drops(spark):
    # a predicate with one distinct object cannot be corrupted
    rows = [("s1", "solo", "only"), ("s2", "solo", "only"),
            ("s1", "multi", "a"), ("s2", "multi", "b")]
    out = kg.kg_negatives(_mk_triples(spark, rows), k=3).collect()
    assert all(r.pred == "multi" for r in out)
    # m=2: the only valid negative is the other object, every rank
    assert all(r.neg_obj != r.obj for r in out)
    assert len(out) == 2 * 3


def test_kg_negatives_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        kg.kg_negatives(_mk_triples(spark, [("s", "p", "o")]), k=0)


# ---------------------------------------------------------------------------
# mention_bursts (ingest control chart)
# ---------------------------------------------------------------------------

def _mk_mentions(spark, rows):
    return spark.createDataFrame(rows, "entity string, ts long")


def test_mention_bursts_hand_computed(spark):
    day = 86400
    # entity e: days 0,1,2 -> n=2 each; day 3 -> n=10 (burst)
    rows = (
        [("e", d * day), ("e", d * day + 5)] * 1 for d in range(3)
    )
    flat = [r for pair in rows for r in pair]
    flat += [("e", 3 * day + i) for i in range(10)]
    out = {r.day: r for r in
           kg.mention_bursts(_mk_mentions(spark, flat)).collect()}
    assert len(out) == 4
    # day 0: no baseline -> not a burst, NULL stats
    assert out[0].mu is None and out[0].is_burst is False
    # day 1: 1 prior observation -> mu exists, sigma NULL, no burst
    assert out[1].mu == 2.0 and out[1].sigma is None
    assert out[1].is_burst is False
    # day 3: mu=2, sigma=0 -> threshold 2; n=10 bursts
    assert out[3].mu == 2.0 and out[3].sigma == 0.0
    assert out[3].n == 10 and out[3].is_burst is True


def test_mention_bursts_trailing_is_row_based(spark):
    day = 86400
    # observed days 0 and 100: day 100's baseline is day 0 (previous
    # OBSERVED day), not an empty calendar window
    rows = [("e", 0), ("e", 1), ("e", 100 * day)]
    out = {r.day: r for r in
           kg.mention_bursts(_mk_mentions(spark, rows)).collect()}
    assert out[100].mu == 2.0 and out[100].is_burst is False


def test_mention_bursts_z_and_guard(spark):
    day = 86400
    # baseline 1,3 (mu=2, sigma~1.414): n=5 bursts at z=2
    # (thr=4.83) but not at z=3 (thr=6.24)
    rows = ([("e", 0)] + [("e", day + i) for i in range(3)]
            + [("e", 2 * day + i) for i in range(5)])
    lo = {r.day: r for r in kg.mention_bursts(
        _mk_mentions(spark, rows), z=2.0).collect()}
    hi = {r.day: r for r in kg.mention_bursts(
        _mk_mentions(spark, rows), z=3.0).collect()}
    assert lo[2].is_burst is True and hi[2].is_burst is False
    with pytest.raises(ValueError):
        kg.mention_bursts(_mk_mentions(spark, rows), trailing=0)


# ---------------------------------------------------------------------------
# kg_at_time (point-in-time snapshot)
# ---------------------------------------------------------------------------

def test_kg_at_time_half_open_boundaries(spark):
    ev = spark.createDataFrame(
        [("u1", "p", "a", 10), ("u1", "p", "b", 20),
         ("u2", "p", "x", 15)],
        EV_SCHEMA,
    )
    hist = kg.temporal_triples(ev)

    def snap(ts):
        return {(r.subj, r.obj)
                for r in kg.kg_at_time(hist, ts).collect()}

    assert snap(9) == set()                       # before any version
    assert snap(10) == {("u1", "a")}              # valid_from inclusive
    assert snap(19) == {("u1", "a"), ("u2", "x")}
    # at the instant a new version starts, the old one is already out
    assert snap(20) == {("u1", "b"), ("u2", "x")}
    assert snap(10**9) == {("u1", "b"), ("u2", "x")}  # open versions


def test_kg_at_time_in_plan_instant(spark):
    # a 1-row DataFrame instant behaves exactly like the plain int
    ev = spark.createDataFrame(
        [("u1", "p", "a", 10), ("u1", "p", "b", 20)], EV_SCHEMA
    )
    hist = kg.temporal_triples(ev)
    t = spark.createDataFrame([(15,)], "t0 long")
    got = [(r.subj, r.obj, r.version, r.valid_from)
           for r in kg.kg_at_time(hist, t).collect()]
    assert got == [("u1", "a", 1, 10)]


# ---------------------------------------------------------------------------
# merge_temporal (incremental SCD-2 upsert)
# ---------------------------------------------------------------------------

def test_merge_temporal_equals_recompute_append_only(spark):
    ev_rows = [
        ("u", "p", "a", 10), ("u", "p", "a", 20), ("u", "p", "b", 30),
        ("u", "p", "b", 40), ("u", "p", "a", 50),
        ("v", "p", "x", 5), ("v", "p", "x", 45),
    ]
    ev = spark.createDataFrame(ev_rows, EV_SCHEMA)
    full = sorted(map(tuple, kg.temporal_triples(ev).collect()))
    old = kg.temporal_triples(ev.where(F.col("ts") < 35))
    merged = kg.merge_temporal(old, ev.where(F.col("ts") >= 35))
    assert sorted(map(tuple, merged.collect())) == full


def test_merge_temporal_extends_open_run(spark):
    # new evidence with the SAME obj as the current version must
    # extend that version (valid_from unchanged), not fork a new one
    ev = spark.createDataFrame([("u", "p", "a", 10)], EV_SCHEMA)
    old = kg.temporal_triples(ev)
    new = spark.createDataFrame([("u", "p", "a", 99)], EV_SCHEMA)
    [r] = kg.merge_temporal(old, new).collect()
    assert (r.version, r.valid_from, r.is_current) == (1, 10, True)


# ---------------------------------------------------------------------------
# constraint_violations (SHACL-lite gate)
# ---------------------------------------------------------------------------

RULES_SCHEMA = "pred string, subj_pattern string, obj_pattern string"


def test_constraint_violations_kinds_and_precedence(spark):
    tr = _mk_triples(spark, [
        ("conv-1", "p1", "spark"),    # clean
        ("conv-2", "p1", "vector"),   # obj fails
        ("BAD", "p1", "vector"),      # subj AND obj fail -> subj wins
        ("conv-3", "p9", "x"),        # no rule -> unknown_pred
    ])
    rules = spark.createDataFrame(
        [("p1", "^conv-[0-9]+$", "^(spark|stream)$")], RULES_SCHEMA
    )
    got = {(r.subj, r.pred): r.violation for r in
           kg.constraint_violations(tr, rules).collect()}
    assert got == {
        ("conv-2", "p1"): "obj_pattern",
        ("BAD", "p1"): "subj_pattern",
        ("conv-3", "p9"): "unknown_pred",
    }


def test_constraint_violations_null_pattern_unconstrained(spark):
    tr = _mk_triples(spark, [("anything", "p", "goes")])
    rules = spark.createDataFrame([("p", None, None)], RULES_SCHEMA)
    assert kg.constraint_violations(tr, rules).count() == 0


def test_constraint_violations_broadcasts_rules(spark):
    tr = _mk_triples(spark, [("s", "p", "o")])
    rules = spark.createDataFrame([("p", None, "^o$")], RULES_SCHEMA)
    plan = kg.constraint_violations(tr, rules)._jdf.queryExecution().toString()
    assert "broadcast" in plan.lower()


def test_constraint_violations_null_term_and_dup_rule_guard(spark):
    tr = _mk_triples(spark, [(None, "p", "o"), ("s", "p", None)])
    rules = spark.createDataFrame([("p", None, None)], RULES_SCHEMA)
    out = kg.constraint_violations(tr, rules).collect()
    # NULL terms are flagged even under an unconstrained rule
    assert [r.violation for r in out] == ["null_term", "null_term"]
    # duplicate rules for one predicate fail loudly
    dup = spark.createDataFrame(
        [("p", "^a$", None), ("p", None, "^x$")], RULES_SCHEMA
    )
    with pytest.raises(Exception, match="duplicate rule"):
        kg.constraint_violations(_mk_triples(spark, [("s", "p", "o")]),
                                 dup).collect()


def test_kg_negatives_uniform_skip_is_unbiased(spark):
    # m=3 domain: across many positives, no object may be sampled at
    # ~2x the rate of the others (the successor-fallback bias the
    # index-skip scheme eliminates); exact uniformity over the 2
    # non-true objects per positive
    rows = [("s%d" % i, "p", "o%d" % (i % 3)) for i in range(300)]
    out = kg.kg_negatives(_mk_triples(spark, rows), k=1).collect()
    from collections import Counter

    per_true = {}
    for r in out:
        assert r.neg_obj != r.obj
        per_true.setdefault(r.obj, Counter())[r.neg_obj] += 1
    # for each true object, both alternatives appear (hash-split),
    # and totals over all positives are within 2x of each other
    tot = Counter()
    for c in per_true.values():
        assert len(c) == 2
        tot.update(c)
    lo, hi = min(tot.values()), max(tot.values())
    assert hi <= 2 * lo, tot


def test_predicate_implications_counts_and_gates(spark):
    # subjects: s1 has p,q ; s2 has p,q ; s3 has p only ; s4 has q,r
    tr = _mk_triples(spark, [
        ("s1", "p", "x"), ("s1", "q", "y"),
        ("s2", "p", "x"), ("s2", "q", "z"), ("s2", "q", "w"),
        ("s3", "p", "x"),
        ("s4", "q", "y"), ("s4", "r", "y"),
    ])
    got = {(r.antecedent, r.consequent): r for r in
           kg.predicate_implications(tr, min_support=2,
                                     min_confidence=0.1).collect()}
    # p => q: 2 of 3 p-subjects also have q
    r = got[("p", "q")]
    assert (r.support, r.body_size, r.confidence) == (2, 3, 0.666667)
    # q => p: 2 of 3 q-subjects (duplicate evidence collapses to
    # distinct (subj, pred) first)
    assert got[("q", "p")].confidence == 0.666667
    # r co-occurs with q once -> below min_support, absent
    assert ("q", "r") not in got and ("r", "q") not in got
    with pytest.raises(ValueError):
        kg.predicate_implications(tr, min_support=0)


class TestPatternTriples:
    def _turns(self, spark, rows):
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string"
        )

    def test_extraction_and_multiple_matches(self, spark):
        t = self._turns(spark, [
            ("c1", 0, "alice works at acme and bob works at globex"),
            ("c1", 1, "nothing relevant here"),
            ("c2", 0, "carol works at initech"),
        ])
        got = sorted(
            (r.conv_id, r.turn_idx, r.pred, r.subj, r.obj)
            for r in kg.pattern_triples(
                t, [("employed_by", r"(\w+) works at (\w+)")]
            ).collect()
        )
        assert got == [
            ("c1", 0, "employed_by", "alice", "acme"),
            ("c1", 0, "employed_by", "bob", "globex"),
            ("c2", 0, "employed_by", "carol", "initech"),
        ]

    def test_nonoverlapping_leftmost(self, spark):
        # "a scan b scan c": the first match consumes "a scan b";
        # the remainder " scan c" has no leading subject -> ONE match
        # (java.util.regex and RE2 agree on leftmost non-overlap)
        t = self._turns(spark, [("c", 0, "a scan b scan c")])
        got = [(r.subj, r.obj) for r in kg.pattern_triples(
            t, [("scans", r"(\w+) scan (\w+)")]).collect()]
        assert got == [("a", "b")]

    def test_multiple_rules_and_null_text(self, spark):
        t = self._turns(spark, [
            ("c", 0, "x scan y then p hash q"),
            ("c", 1, None),
        ])
        got = sorted(
            (r.pred, r.subj, r.obj)
            for r in kg.pattern_triples(
                t,
                [("scans", r"(\w+) scan (\w+)"),
                 ("hashes", r"(\w+) hash (\w+)")],
            ).collect()
        )
        assert got == [("hashes", "p", "q"), ("scans", "x", "y")]

    def test_rule_validation(self, spark):
        t = self._turns(spark, [("c", 0, "x")])
        with pytest.raises(ValueError):
            kg.pattern_triples(t, [])
        with pytest.raises(ValueError):
            kg.pattern_triples(t, [("one_group", r"(\w+) scan")])
        with pytest.raises(ValueError):
            kg.pattern_triples(
                t, [("three", r"(\w+) (\w+) scan (\w+)")]
            )

    def test_dialect_wider_than_python_re(self, spark):
        # \p{L} compiles in java.util.regex AND RE2 but not in
        # Python's re — validation must defer to the engines, not
        # reject a dialect-conforming rule at plan-build time
        t = self._turns(spark, [("c", 0, "naïve scan résumé")])
        got = [(r.subj, r.obj) for r in kg.pattern_triples(
            t, [("scans", r"(\p{L}+) scan (\p{L}+)")]).collect()]
        assert got == [("naïve", "résumé")]

    def test_zero_shuffles(self, spark):
        t = self._turns(spark, [("c", 0, "a scan b")])
        p = t.sparkSession._jvm  # noqa: F841  (force lazy init)
        plan = kg.pattern_triples(
            t, [("scans", r"(\w+) scan (\w+)")]
        )._jdf.queryExecution().executedPlan().toString()
        # one projection + explode over the input partitioning: a
        # shuffle here would mean the rule evaluation lost its
        # embarrassingly-parallel shape
        assert "Exchange" not in plan
