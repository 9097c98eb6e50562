"""Sixth-batch operators: positional gazetteer spotting
(kg.gazetteer_mentions), asymmetric containment dedup
(dedup.containment_pairs), the hot-key skew gauge
(operators.salted.skew_report), and the Bloom membership screen
(dedup.bloom_build / bloom_probe)."""

import pytest
from pyspark.sql import functions as F

from coies_spark.operators.salted import skew_report
from coies_spark.ops import dedup
from coies_spark.ops.kg import gazetteer_mentions


def _transcripts(spark, rows):
    return spark.createDataFrame(
        [(c, i, "user", t, None, 0) for c, i, t in rows],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts long",
    )


GAZ = [
    ("table", "obj:table"),
    ("hash", "obj:hash"),
    ("Table Hash", "obj:table-hash"),
    ("merge group", "act:merge-group"),
    ("scan", "act:scan"),
    ("scan", "obj:scan"),
]


def _gaz(spark):
    return spark.createDataFrame(GAZ, ["surface", "entity"])


def test_gazetteer_longest_match_per_start(spark):
    t = _transcripts(
        spark, [("c1", 0, "the Table  hash, merge group table")]
    )
    got = sorted(
        tuple(r)
        for r in gazetteer_mentions(t, _gaz(spark), max_len=3).collect()
    )
    assert got == [
        # pos 1: bigram "table hash" beats unigram "table"
        ("c1", 0, 1, 2, "table hash", "obj:table-hash"),
        # pos 2: "hash" is a DIFFERENT start — still reported
        ("c1", 0, 2, 1, "hash", "obj:hash"),
        ("c1", 0, 3, 2, "merge group", "act:merge-group"),
        ("c1", 0, 5, 1, "table", "obj:table"),
    ]


def test_gazetteer_ambiguous_surface_emits_all_entities(spark):
    t = _transcripts(spark, [("c1", 0, "scan now")])
    got = sorted(
        r.entity
        for r in gazetteer_mentions(t, _gaz(spark), max_len=2).collect()
    )
    assert got == ["act:scan", "obj:scan"]


def test_gazetteer_tokenizes_dictionary_surfaces(spark):
    # "Table Hash" in the dict matched lowercased, punctuated text
    t = _transcripts(spark, [("c1", 0, "TABLE-HASH!")])
    got = gazetteer_mentions(t, _gaz(spark), max_len=2).collect()
    assert any(r.entity == "obj:table-hash" and r.pos == 0 for r in got)


def test_gazetteer_empty_and_no_match_turns(spark):
    t = _transcripts(spark, [("c1", 0, ""), ("c1", 1, "zz yy xx")])
    assert gazetteer_mentions(t, _gaz(spark)).count() == 0


def test_gazetteer_max_len_guard_and_truncation(spark):
    with pytest.raises(ValueError):
        gazetteer_mentions(
            _transcripts(spark, [("c1", 0, "x")]), None, max_len=0
        )
    # a 2-token surface can't match at max_len=1, but unigrams still do
    t = _transcripts(spark, [("c1", 0, "merge group")])
    got = gazetteer_mentions(t, _gaz(spark), max_len=1).collect()
    assert got == []


def test_gazetteer_plan_no_cartesian(spark):
    t = _transcripts(spark, [("c1", 0, "table")])
    plan = (
        gazetteer_mentions(t, _gaz(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )


def test_containment_directed_subset(spark):
    docs = _docs(
        spark,
        [
            "a b c d e f g h i j k l",  # superset
            "a b c d e",  # contained in 0
            "z y x w v u",  # unrelated
        ],
    )
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in dedup.containment_pairs(
            docs, n=3, max_df=10, threshold=0.5
        ).collect()
    }
    # doc 1 has 3 shingles, all inside doc 0's 10 → containment 1.0;
    # the reverse direction is 3/10 and below threshold
    assert got == {(1, 0): 1.0}


def test_containment_mutual_near_equal(spark):
    docs = _docs(spark, ["a b c d e", "a b c d e x"])
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in dedup.containment_pairs(
            docs, n=3, max_df=10, threshold=0.5
        ).collect()
    }
    assert got[(0, 1)] == 1.0  # all 3 of doc 0's shingles in doc 1
    assert got[(1, 0)] == 0.75  # 3 of doc 1's 4


def test_containment_respects_df_cap(spark):
    # shingle shared by ALL docs is df-capped out of numerator AND
    # denominator: with max_df=2 the common shingle of 3 docs vanishes
    docs = _docs(spark, ["a b c", "a b c x", "a b c y z w"])
    got = dedup.containment_pairs(
        docs, n=3, max_df=2, threshold=0.01
    ).collect()
    # "a b c" (df=3) dropped; doc 0 then has NO surviving shingles →
    # never appears; docs 1/2 share nothing else
    assert got == []


def test_skew_report_values(spark):
    rows = [(k,) for k in ["hot"] * 50 + ["warm"] * 10 + ["c1", "c2", "c3", "c4"] + [None] * 6]
    df = spark.createDataFrame(rows, "k string")
    got = [tuple(r) for r in skew_report(df, ["k"], top_k=3).collect()]
    # 70 rows, 7 keys (hot, warm, c1..c4, NULL bucket) → mean 10/key
    assert got == [
        (1, "hot", 50, round(50 / 70, 6), round(50 * 7 / 70, 6)),
        (2, "warm", 10, round(10 / 70, 6), round(10 * 7 / 70, 6)),
        (3, "∅", 6, round(6 / 70, 6), round(6 * 7 / 70, 6)),
    ]


def test_skew_report_compound_key_and_guards(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2)], "x string, y int"
    )
    got = {r.key: r.cnt for r in skew_report(df, ["x", "y"], 5).collect()}
    assert got == {"a|1": 2, "b|2": 1}
    with pytest.raises(ValueError):
        skew_report(df, [], 5)
    with pytest.raises(ValueError):
        skew_report(df, ["x"], 0)


def test_bloom_no_false_negatives_and_fp_rate(spark):
    big = spark.createDataFrame(
        [(i, f"doc {i % 7} text") for i in range(40)],
        "doc_id bigint, text string",
    )
    blm = dedup.bloom_build(big.where("doc_id % 2 = 0"), 1024, 4)
    got = {
        r.doc_id: r.maybe_member
        for r in dedup.bloom_probe(big, blm, 1024, 4).collect()
    }
    # every text occurs among the even docs → all probes are members
    assert all(got.values()) and len(got) == 40
    # unseen texts: at 7 keys in 1024 bits FPs are ~0 — allow a couple
    fresh = spark.createDataFrame(
        [(100 + i, f"unseen {i}") for i in range(50)],
        "doc_id bigint, text string",
    )
    fp = sum(
        r.maybe_member
        for r in dedup.bloom_probe(fresh, blm, 1024, 4).collect()
    )
    assert fp <= 2


def test_bloom_deterministic_across_partitionings(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(30)], "doc_id bigint, text string"
    )
    a = sorted(
        tuple(r) for r in dedup.bloom_build(docs.coalesce(1), 512, 3).collect()
    )
    b = sorted(
        tuple(r)
        for r in dedup.bloom_build(docs.repartition(7), 512, 3).collect()
    )
    assert a == b


def test_bloom_guards(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        dedup.bloom_build(docs, m_bits=100, k=4)  # not a multiple of 64
    with pytest.raises(ValueError):
        dedup.bloom_build(docs, m_bits=128, k=0)


def test_ingest_screen_routes_exact_near_new(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = _docs(spark, [base, base, "q r s t u v w x y z"])
    batch = spark.createDataFrame(
        [
            (10, base),  # exact dup of 0 (min of {0,1})
            (11, base + " extra"),  # near dup: shares bands with 0/1
            (12, "one two three four five six seven"),  # fresh
        ],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.status, r.dup_of)
        for r in dedup.ingest_screen(corpus, batch, m_bits=1024).collect()
    }
    assert got[10] == ("exact", 0)
    assert got[12] == ("new", None)
    assert got[11][0] in ("near", "new")  # band agreement is n-dependent
    assert len(got) == 3  # every batch doc exactly once


def test_ingest_screen_near_detection(spark):
    # identical long prefix guarantees shared band keys at n=3
    long = " ".join(f"tok{i}" for i in range(30))
    corpus = _docs(spark, [long])
    batch = spark.createDataFrame(
        [(20, long + " tail")], "doc_id bigint, text string"
    )
    got = dedup.ingest_screen(corpus, batch, m_bits=1024).collect()
    assert [(r.status, r.dup_of) for r in got] == [("near", 0)]


def test_ingest_screen_bloom_gates_exact_verify(spark):
    # the exact-verify join input must be filtered on maybe_member:
    # the Bloom gate is IN the plan, not just in the docstring
    corpus = _docs(spark, ["a b c"])
    batch = spark.createDataFrame(
        [(30, "a b c")], "doc_id bigint, text string"
    )
    plan = (
        dedup.ingest_screen(corpus, batch, m_bits=1024)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "maybe_member" in plan
    assert "CartesianProduct" not in plan


def test_distant_supervision_labels_comention_pairs(spark):
    from coies_spark.ops.kg import distant_supervision

    t = _transcripts(
        spark,
        [
            ("c1", 0, "scan the table now"),
            ("c1", 1, "hash only"),          # one entity: no pair
            ("c2", 0, "table before scan"),  # reversed order still pairs
        ],
    )
    seed = spark.createDataFrame(
        [("act:scan", "reads", "obj:table")], ["subj", "pred", "obj"]
    )
    got = sorted(
        (r.conv_id, r.turn_idx, r.pred, r.subj, r.obj,
         r.subj_pos, r.obj_pos)
        for r in distant_supervision(
            t, _gaz(spark), seed, max_len=2
        ).collect()
    )
    # 'scan' is ambiguous (act:scan, obj:scan) — only the act:scan
    # reading matches the seed; the unmatched obj:scan pairing and
    # every unlabeled pair stay out (Mintz positive set only)
    assert got == [
        ("c1", 0, "reads", "act:scan", "obj:table", 0, 2),
        ("c2", 0, "reads", "act:scan", "obj:table", 2, 0),
    ]


def test_distant_supervision_one_row_per_position_pair(spark):
    from coies_spark.ops.kg import distant_supervision

    t = _transcripts(spark, [("c1", 0, "scan table scan")])
    seed = spark.createDataFrame(
        [("act:scan", "reads", "obj:table")], ["subj", "pred", "obj"]
    )
    got = distant_supervision(t, _gaz(spark), seed, max_len=1).collect()
    # two scan mentions x one table mention = two evidence rows
    assert sorted((r.subj_pos, r.obj_pos) for r in got) == [(0, 1), (2, 1)]


def test_distant_supervision_seed_join_is_broadcast(spark):
    from coies_spark.ops.kg import distant_supervision

    t = _transcripts(spark, [("c1", 0, "scan the table")])
    seed = spark.createDataFrame(
        [("act:scan", "reads", "obj:table")], ["subj", "pred", "obj"]
    )
    p = distant_supervision(t, _gaz(spark), seed)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p


def test_distant_negatives_complement_and_schema(spark):
    from coies_spark.ops.kg import distant_negatives, distant_supervision

    t = _transcripts(spark, [("c1", 0, "scan the table now hash")])
    seed = spark.createDataFrame(
        [("act:scan", "reads", "obj:table")], ["subj", "pred", "obj"]
    )
    pos = distant_supervision(t, _gaz(spark), seed, max_len=1)
    neg = distant_negatives(t, _gaz(spark), seed, rate=1.0, max_len=1)
    # same column names and types — the faces union with no glue
    # (pred nullability differs: literal 'NA' vs seed join)
    assert [(f.name, f.dataType) for f in pos.schema] == [
        (f.name, f.dataType) for f in neg.schema
    ]
    assert pos.unionByName(neg).count() == pos.count() + neg.count()
    nrows = neg.collect()
    assert all(r.pred == "NA" for r in nrows)
    # no NA row duplicates a seed-related pair
    seeded = {("act:scan", "obj:table")}
    assert all((r.subj, r.obj) not in seeded for r in nrows)
    # at rate 1.0, positives + negatives partition the ordered
    # distinct-entity pair set: 4 entity mentions (scan is ambiguous
    # -> act:scan AND obj:scan at one position) = 4*3 ordered pairs
    assert pos.count() + neg.count() == 4 * 3


def test_distant_negatives_nested_rates(spark):
    from coies_spark.ops.kg import distant_negatives

    rows = [("c%d" % i, 0, "scan table hash now") for i in range(40)]
    t = _transcripts(spark, rows)
    seed = spark.createDataFrame(
        [("act:scan", "reads", "obj:table")], ["subj", "pred", "obj"]
    )
    key = lambda r: (r.conv_id, r.turn_idx, r.subj, r.subj_pos,
                     r.obj, r.obj_pos)
    lo = {key(r) for r in distant_negatives(
        t, _gaz(spark), seed, rate=0.2).collect()}
    hi = {key(r) for r in distant_negatives(
        t, _gaz(spark), seed, rate=0.6).collect()}
    assert lo < hi  # nested and strictly growing at this n
