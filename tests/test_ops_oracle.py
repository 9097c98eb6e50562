"""Cross-engine parity tests for the training-data ops: every
SQL-expressible operator in __spark_entry__ runs on Spark and on its
DuckDB oracle at sf0.001 and must agree on row count, column names, and
every value (the driver's correctness gate, simulated in-suite)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from coies_spark.ops import dedup, multimodal, relational, similarity

pytestmark = pytest.mark.spark

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_match(sdf, odf, name):
    sdf, odf = _normalize(sdf), _normalize(odf)
    assert list(sdf.columns) == list(odf.columns), name
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)}"
    for c in sdf.columns:
        for i, (x, y) in enumerate(zip(sdf[c], odf[c])):
            if isinstance(x, float) or isinstance(y, float):
                fx, fy = float(x), float(y)
                if math.isnan(fx) and math.isnan(fy):
                    continue
                assert fx == fy, f"{name}.{c}[{i}]: {x!r} != {y!r}"
            else:
                assert str(x) == str(y), f"{name}.{c}[{i}]: {x!r} != {y!r}"


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    odf = duck.execute(ORACLES[name]).df()
    _assert_match(sdf, odf, name)


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_nonempty(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() > 0, name
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {f.name for f in df.schema.fields} == {"subj", "pred", "obj", "score"}


class TestOpProperties:
    """Operator-level invariants beyond oracle equality."""

    def test_lsh_pairs_are_high_jaccard(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        lsh = {
            (r.doc_a, r.doc_b)
            for r in dedup.lsh_candidate_pairs(docs).collect()
        }
        jac = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in dedup.jaccard_pairs(docs, threshold=0.0).collect()
        }
        # every band-collision pair is a real overlapping pair
        hit = [jac.get(p, 0.0) for p in lsh]
        assert lsh, "no LSH candidates found"
        assert sum(1 for j in hit if j > 0) >= len(hit) * 0.9

    def test_brute_topk_is_exact(self, spark):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        got = similarity.brute_topk(emb, n_queries=2, k=3).collect()
        import numpy as np

        rows = emb.collect()
        vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
        for qid in (0, 1):
            sims = []
            for tid, v in vecs.items():
                if tid == qid:
                    continue
                q = vecs[qid]
                s = round(
                    float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v))), 4
                )
                sims.append((-s, tid))
            want = [t for _, t in sorted(sims)[:3]]
            have = [
                r.target_id
                for r in sorted(
                    (r for r in got if r.query_id == qid),
                    key=lambda r: r.rank,
                )
            ]
            assert have == want

    def test_top_group_df_matches_core(self, spark):
        from coies_spark.core.ranking import top_group

        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
            "o_orderpriority", "o_orderkey", "o_totalprice"
        )
        got = relational.top_group_df(
            orders, ["o_orderpriority"], "o_totalprice", "o_orderkey"
        ).collect()
        by_g = {}
        for r in orders.collect():
            by_g.setdefault(r.o_orderpriority, []).append(
                (r.o_orderkey, r.o_totalprice)
            )
        want = set()
        for g, items in by_g.items():
            items.sort(key=lambda kv: (-kv[1], kv[0]))
            for k, v in top_group(items):
                want.add((g, k))
        assert {(r.o_orderpriority, r.o_orderkey) for r in got} == want

    def test_multimodal_real_decode_raises(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(4)
        media = multimodal.synthesize_media(docs)
        with pytest.raises(Exception, match="NotImplementedError|decoding"):
            multimodal.extract_features(media, real=True).collect()

    def test_multimodal_features_deterministic(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(8)
        media = multimodal.synthesize_media(docs)
        a = multimodal.extract_features(media).orderBy("media_id").collect()
        b = multimodal.extract_features(media).orderBy("media_id").collect()
        assert [r.feature for r in a] == [r.feature for r in b]
        assert all(len(r.feature) == multimodal.FEATURE_DIM for r in a)

    def test_frame_sample_counts(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(30)
        media = multimodal.synthesize_media(docs)
        frames = multimodal.frame_sample(media, every_ms=1000)
        vids = media.where("modality = 'video'").collect()
        want = sum(max(v.duration_ms // 1000, 1) for v in vids)
        assert frames.count() == want

    def test_embedding_neardup_recall_on_planted_twins(self, spark):
        """Banded LSH at the defaults must find every planted near-dup
        (sim ≈ 0.97 twins) that the exact all-pairs verifier finds."""
        import numpy as np

        rng = np.random.RandomState(11)
        base = rng.standard_normal((120, 32)).astype("float32")
        twins = base[:60] + 0.15 * rng.standard_normal((60, 32)).astype(
            "float32"
        )
        rows = [(i, v.tolist()) for i, v in enumerate(base)] + [
            (1000 + i, v.tolist()) for i, v in enumerate(twins)
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        got = {
            (r.vec_a, r.vec_b)
            for r in similarity.embedding_neardup(
                emb, threshold=0.9, dim=32
            ).collect()
        }
        exact = {
            (r.vec_a, r.vec_b): r.sim
            for r in similarity.embedding_neardup(
                emb, threshold=0.9, exact=True
            ).collect()
        }
        strong = {p for p, s in exact.items() if s >= 0.95}
        assert len(strong) >= 40  # the plant worked
        # no false positives (candidates are exact-verified) and full
        # recall in the near-dup band the defaults are geared for
        assert got <= set(exact)
        assert strong <= got


def test_scrub_pii_planted_cross_engine(spark):
    """The sf corpus contains no PII, so the driver row only proves
    pass-through parity.  This plants URLs/emails/IPs/phones and
    asserts (a) the redactions themselves, (b) Spark and the generated
    DuckDB twin agree token-for-token on PII-laden text."""
    from coies_spark.ops import textstats

    rows = [
        (0, "contact me at jane.doe+spam@example.co.uk or visit "
            "https://example.com/a?b=c#frag today", "en", "s", 1),
        (1, "server 10.0.255.7 answered; call +1 (555) 123-4567 now",
         "en", "s", 1),
        (2, "no pii here at all", "en", "s", 1),
        (3, "", "en", "s", 1),
        # regression: dates and number series must NOT redact as phones
        (4, "the meeting on 2026-08-17 was moved from 17-10-2026 and "
            "the log shows 10:30:45", "en", "s", 1),
        (5, "totals were 10 20 30 40 50 units in the 2026 report", "en",
         "s", 1),
    ]
    schema = ("doc_id bigint, text string, lang string, source string, "
              "n_chars bigint")
    docs = spark.createDataFrame(rows, schema)
    got = {r.doc_id: r for r in textstats.scrub_pii(docs).collect()}
    assert got[0].n_email == 1 and got[0].n_url == 1
    assert "<EMAIL>" in got[0].scrubbed and "<URL>" in got[0].scrubbed
    assert "example" not in got[0].scrubbed
    assert got[1].n_ip == 1 and got[1].n_phone == 1
    assert "<IP>" in got[1].scrubbed and "<PHONE>" in got[1].scrubbed
    assert got[2].scrubbed == "no pii here at all"
    assert got[3].scrubbed == "" and got[3].n_url == 0
    for d in (4, 5):
        assert got[d].n_phone == 0 and got[d].scrubbed == rows[d][1], got[d]

    import pandas as pd

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        ),
    )
    _assert_match(
        textstats.scrub_pii(docs).toPandas(),
        con.execute(entrymod._scrub_pii_sql()).df(),
        "scrub_pii_planted",
    )
