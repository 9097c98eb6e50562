"""Edge-case hardening: every op must behave on empty, single-row, and
degenerate inputs (the shapes that appear in stray partitions at scale)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from coies_spark.ops import dedup, relational, similarity, textstats

pytestmark = pytest.mark.spark

DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)
EMB_SCHEMA = "vec_id bigint, embedding array<float>, label int"


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], DOC_SCHEMA)


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (0, "the quick fox", "en", "s0", 13),
        (1, "", "en", "s0", 0),                 # empty text
        (2, "!!! ??? ...", "en", "s1", 11),      # punctuation only
        (3, "the quick fox", "en", "s1", 13),    # exact duplicate of 0
    ]
    return spark.createDataFrame(rows, DOC_SCHEMA)


@pytest.fixture(scope="module")
def tiny_emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.0, 1.0, 0.0, 0.0], 0),
        (2, [1.0, 0.0, 0.0, 0.0], 1),  # duplicate vector, other label
        (3, [0.0, 0.0, 0.0, 0.0], 1),  # zero vector
    ]
    return spark.createDataFrame(rows, EMB_SCHEMA)


class TestEmptyInputs:
    def test_textstats_empty(self, empty_docs):
        assert textstats.token_stats(empty_docs).count() == 0
        assert textstats.quality_scores(empty_docs).count() == 0
        assert textstats.language_id(empty_docs).count() == 0
        assert textstats.ngram_windows(empty_docs).count() == 0
        assert textstats.doc_fingerprint(empty_docs).count() == 0

    def test_dedup_empty(self, empty_docs):
        assert dedup.exact_dedup(empty_docs).count() == 0
        assert dedup.jaccard_pairs(empty_docs).count() == 0
        assert dedup.lsh_candidate_pairs(empty_docs).count() == 0
        assert dedup.simhash(empty_docs).count() == 0

    def test_rouge_empty(self, empty_docs):
        assert relational.rouge1_pairs(empty_docs).count() == 0


class TestDegenerateInputs:
    def test_textstats_degenerate(self, tiny_docs):
        stats = {r.doc_id: r for r in textstats.token_stats(tiny_docs).collect()}
        assert stats[1].n_tokens == 0
        assert stats[2].n_tokens == 0
        assert stats[0].n_tokens == 3
        q = {r.doc_id: r for r in textstats.quality_scores(tiny_docs).collect()}
        # empty/punct docs yield null ratios (0 tokens), not crashes
        assert q[1].avg_token_len is None
        assert q[0].stopword_ratio > 0

    def test_exact_dedup_finds_duplicate(self, tiny_docs):
        reps = {r.doc_id: r.exact_rep for r in dedup.exact_dedup(tiny_docs).collect()}
        assert reps[3] == 0 and reps[0] == 0
        assert reps[2] == 2

    def test_simhash_skips_tokenless_docs(self, tiny_docs):
        got = {r.doc_id for r in dedup.simhash(tiny_docs).collect()}
        assert got == {0, 3}  # docs with no tokens have no hash rows

    def test_brute_topk_zero_vector(self, tiny_emb):
        rows = similarity.brute_topk(tiny_emb, n_queries=4, k=3).collect()
        # zero vector yields NaN sims but must not crash; other queries rank
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r)
        assert by_q[0][0].target_id == 2  # identical vector ranks first
        assert all(len(v) <= 3 for v in by_q.values())

    def test_ivf_topk_duplicate_vectors(self, tiny_emb):
        rows = similarity.ivf_topk(tiny_emb, n_queries=2, k=2).collect()
        assert rows, "ivf must return neighbours"

    def test_top_group_single_row_group(self, spark):
        df = spark.createDataFrame(
            [("g", 1, 10.0)], "g string, k int, v double"
        )
        kept = relational.top_group_df(df, ["g"], "v", "k").collect()
        assert len(kept) == 1

    def test_range_join_empty_windows(self, spark):
        items = spark.createDataFrame(
            [(0, 1, 1)], "doc_id bigint, start int, end int"
        )
        wins = spark.createDataFrame(
            [], "doc_id bigint, w_start int, w_end int"
        )
        out = relational.range_containment_join(items, wins)
        assert out.count() == 0


def test_lsh_bands_match_long_format_uneven(spark):
    """Wide-signature band keys must equal keys assembled from the
    long-format signatures for EVERY (num_hashes, band_size), including
    a trailing short band (num_hashes not divisible by band_size)."""
    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "en", "s0", 30),
        (1, "alpha beta gamma delta epsilon zeta", "en", "s0", 30),
        (2, "one two three four five six seven", "en", "s1", 30),
        (3, "one two three four five six eight", "en", "s1", 30),
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    for num_hashes, band_size in ((5, 2), (8, 3), (4, 4)):
        got = sorted(
            map(
                tuple,
                dedup.lsh_candidate_pairs(
                    docs, num_hashes=num_hashes, band_size=band_size
                ).collect(),
            )
        )
        sig = dedup.minhash_signatures(
            docs, num_hashes=num_hashes
        ).collect()
        by_doc = {}
        for r in sig:
            by_doc.setdefault(r.doc_id, {})[r.h] = r.minhash
        keys = {}
        for doc, mh in by_doc.items():
            for b in range(-(-num_hashes // band_size)):
                lo, hi = b * band_size, min((b + 1) * band_size, num_hashes)
                keys.setdefault(
                    (b, ",".join(mh[h] for h in range(lo, hi))), []
                ).append(doc)
        want = set()
        for members in keys.values():
            for a in members:
                for c in members:
                    if a < c:
                        want.add((a, c))
        assert got == sorted(want), (num_hashes, band_size)


class TestRepetitionStats:
    def test_filters_repetitive_docs(self, spark):
        rows = [
            # 1 unique token repeated: modal 2-gram covers everything
            (0, " ".join(["spam"] * 40), "en", "s0", 199),
            # alternating 2-token loop: dup 3-grams near 1
            (1, " ".join(["buy", "now"] * 20), "en", "s0", 159),
            # diverse text: should keep
            (2, "one two three four five six seven eight nine ten", "en",
             "s0", 49),
        ]
        docs = spark.createDataFrame(rows, DOC_SCHEMA)
        out = {
            r.doc_id: r for r in textstats.repetition_stats(docs).collect()
        }
        assert not out[0].keep and out[0].top_2gram_frac == 1.0
        assert not out[1].keep and out[1].dup_3gram_frac > 0.9
        assert out[2].keep and out[2].dup_token_frac == 0.0

    def test_degenerate_docs(self, tiny_docs):
        out = {
            r.doc_id: r
            for r in textstats.repetition_stats(tiny_docs).collect()
        }
        assert len(out) == 4
        # empty + punct-only docs: NULL token ratios (0 tokens), the
        # "" placeholder shingle makes top_2gram_frac 1.0 -> rejected
        for d in (1, 2):
            assert out[d].dup_token_frac is None
            assert out[d].top_2gram_frac == 1.0 and not out[d].keep
        # 3 distinct tokens: no repetition, but the modal bigram is 1
        # of 2 -> 0.5 > 0.20, the documented short-doc behavior (the
        # Gopher pipeline gates these thresholds behind a min length)
        assert out[0].dup_token_frac == 0.0 and out[0].top_2gram_frac == 0.5
        assert not out[0].keep

    def test_empty_input(self, empty_docs):
        assert textstats.repetition_stats(empty_docs).count() == 0


class TestContamination:
    def test_planted_contamination(self, spark):
        rows = [
            (0, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 1),
            (1, "totally different words nothing shared here at all", "en",
             "s", 1),
            # verbatim copy of the benchmark item with a prefix
            (2, "prefix words then alpha beta gamma delta epsilon zeta eta "
                "theta", "en", "s", 1),
        ]
        docs = spark.createDataFrame(rows, DOC_SCHEMA)
        bench = docs.where("doc_id = 0")
        out = dedup.contamination_pairs(
            docs, bench, n=3, min_overlap=0.5, benchmark_in_docs=True
        )
        got = {r.doc_id: r for r in out.collect()}
        # doc 1 shares no 3-gram; doc 2 contains every benchmark 3-gram
        assert set(got) == {2}
        r = got[2]
        assert r.bench_id == 0 and r.overlap == 1.0 and r.contaminated
        # self-pair (doc 0 vs bench 0) excluded via benchmark_in_docs
        assert 0 not in got
        # an INDEPENDENT benchmark whose id coincidentally collides
        # must still report the hit (the default keeps same-id pairs)
        sep = dedup.contamination_pairs(docs, bench, n=3, min_overlap=0.5)
        ids = {(r.doc_id, r.bench_id) for r in sep.collect()}
        assert (0, 0) in ids and (2, 0) in ids

    def test_empty_sides(self, empty_docs, tiny_docs):
        assert dedup.contamination_pairs(tiny_docs, empty_docs).count() == 0
        assert dedup.contamination_pairs(empty_docs, tiny_docs).count() == 0


class TestDeterministicSampling:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            (i, f"doc {i}", ["en", "de", "zh"][i % 3], "s", 1)
            for i in range(3000)
        ]
        return spark.createDataFrame(rows, DOC_SCHEMA)

    def test_rate_and_nesting(self, corpus):
        from coies_spark.ops import sampling

        n = corpus.count()
        s10 = sampling.deterministic_sample(corpus, 0.1)
        s20 = sampling.deterministic_sample(corpus, 0.2)
        r10, r20 = s10.count() / n, s20.count() / n
        assert abs(r10 - 0.1) < 0.03 and abs(r20 - 0.2) < 0.03
        # nested: the 10% sample is a subset of the 20% sample
        ids10 = {r.doc_id for r in s10.select("doc_id").collect()}
        ids20 = {r.doc_id for r in s20.select("doc_id").collect()}
        assert ids10 <= ids20
        # fraction >= 1 keeps everything; <= 0 keeps nothing
        assert sampling.deterministic_sample(corpus, 1.0).count() == n
        assert sampling.deterministic_sample(corpus, 0.0).count() == 0

    def test_partitioning_independence(self, corpus):
        from coies_spark.ops import sampling

        a = {
            r.doc_id
            for r in sampling.deterministic_sample(
                corpus.repartition(17), 0.25
            ).collect()
        }
        b = {
            r.doc_id
            for r in sampling.deterministic_sample(
                corpus.coalesce(1), 0.25
            ).collect()
        }
        assert a == b

    def test_stratified_rates(self, corpus):
        from coies_spark.ops import sampling

        out = sampling.stratified_sample(
            corpus, {"en": 0.5, "de": 1.0}, default=0.0
        )
        by_lang = {
            r.lang: r.n
            for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        assert by_lang["de"] == 1000
        assert abs(by_lang["en"] / 1000 - 0.5) < 0.06
        assert "zh" not in by_lang  # default 0 drops unlisted strata


class TestCurateCorpus:
    def test_gates_compose(self, spark):
        from coies_spark.ops import curate

        rows = [
            # clean survivor
            (0, "the quick brown fox jumps over the lazy dog today", "en",
             "s", 1),
            # repetitive -> dropped by the repetition gate
            (1, " ".join(["spam"] * 40), "en", "s", 1),
            # bag-duplicate of 0 (shuffled words) -> dropped (rep is 0)
            (2, "dog lazy the over jumps fox brown quick the today", "en",
             "s", 1),
            # PII survivor: scrubbed but kept
            (3, "send the report to a.b@example.com before the deadline "
                "is it done in time for the quarterly review of it", "en",
             "s", 1),
        ]
        docs = spark.createDataFrame(rows, DOC_SCHEMA)
        out = {
            r.doc_id: r
            for r in curate.curate_corpus(docs, min_quality=0.0).collect()
        }
        assert set(out) == {0, 3}
        assert "<EMAIL>" in out[3].scrubbed
        assert "example.com" not in out[3].scrubbed

    def test_gate_then_dedup_ordering(self, spark):
        """A junk near-copy with the smaller doc_id must never drag
        clean content out of the corpus: the dedup representative is
        chosen among GATED rows (C4/Gopher ordering), not the raw
        corpus."""
        from coies_spark.ops import curate

        rows = [
            # repetitive junk, same token BAG as doc 9, smaller id
            (5, "the quick brown fox jumps over a lazy dog today "
                "fox fox fox fox fox fox the the the the", "en", "s", 1),
            # the clean unique content
            (9, "the quick brown fox jumps over a lazy dog today", "en",
             "s", 1),
        ]
        docs = spark.createDataFrame(rows, DOC_SCHEMA)
        out = {r.doc_id for r in curate.curate_corpus(
            docs, min_quality=0.0).collect()}
        assert out == {9}

    def test_empty(self, empty_docs):
        from coies_spark.ops import curate

        assert curate.curate_corpus(empty_docs).count() == 0


def test_shingles_linear_on_long_docs(spark):
    """Tripwire for the O(len²) shingle regression: the per-index
    slice form took 87 s for ONE 20k-token doc (Catalyst re-evaluates
    a computed tokens expression inside higher-order lambdas); the
    shipped zip_with form is linear.  Generous bound so host noise
    can't flake it — the broken form exceeds it by minutes."""
    import time

    from coies_spark.functions.tokenize import tokens_col
    from coies_spark.ops.textstats import shingles_col

    doc = spark.createDataFrame(
        [(" ".join(f"w{i % 900}" for i in range(30000)),)], "text string"
    )
    t0 = time.time()
    n = doc.select(
        F.size(shingles_col(3, tokens_col("text"))).alias("n")
    ).collect()[0].n
    assert n == 29998
    assert time.time() - t0 < 60


def test_stratified_topk_sample_properties(spark):
    """Exact k per stratum, short strata kept whole, and the
    replacement property: growing the corpus only swaps members in."""
    from coies_spark.ops import sampling

    rows = [
        (i, f"doc {i}", "en" if i % 3 else "de", "s", 1) for i in range(90)
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = sampling.stratified_topk_sample(docs, k=10)
    by_lang = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang == {"en": 10, "de": 10}
    # stratum smaller than k is kept whole
    tiny = sampling.stratified_topk_sample(docs.where("doc_id < 4"), k=10)
    assert tiny.count() == 4
    # growth replaces: the k-set of the half corpus vs the full corpus
    # may differ, but the FULL-corpus k-set restricted to half ids is a
    # subset of the half-corpus k-set (hash order is global)
    half_ids = {
        r.doc_id
        for r in sampling.stratified_topk_sample(
            docs.where("doc_id < 45"), k=10
        ).collect()
    }
    full_ids = {
        r.doc_id for r in sampling.stratified_topk_sample(docs, k=10).collect()
    }
    assert {i for i in full_ids if i < 45} <= half_ids


class TestProductQuantization:
    def test_codes_shape_and_determinism(self, spark):
        from coies_spark.ops import similarity

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        codes, cb = similarity.pq_codebooks(emb, m=4, ksub=8, dim=64)
        n = emb.count()
        assert codes.count() == n * 4  # one code per (vector, subspace)
        cbs = cb.collect()
        assert all(len(r.cv) == 16 for r in cbs)  # dsub = 64/4
        assert len(cbs) <= 32  # empty clusters may drop
        # encoding is deterministic under repartitioning
        c1 = {(r.vec_id, r.sub): r.code for r in codes.collect()}
        codes2, _ = similarity.pq_codebooks(
            emb.repartition(7), m=4, ksub=8, dim=64
        )
        assert c1 == {(r.vec_id, r.sub): r.code for r in codes2.collect()}

    def test_adc_exact_on_centroid_points(self, spark):
        """Vectors that ARE subspace centroids reconstruct exactly, so
        ADC cosine equals true cosine on them (up to 4dp rounding)."""
        import numpy as np

        from coies_spark.ops import similarity

        rng = np.random.RandomState(3)
        # 8 well-separated base vectors, duplicated so Lloyd converges
        # onto them exactly (each cluster is a point mass)
        base = rng.randn(8, 16).round(1)
        rows = []
        vid = 0
        for rep in range(6):
            for b in range(8):
                rows.append((vid, np.tile(base[b], 4).tolist(), b))
                vid += 1
        emb = spark.createDataFrame(rows, EMB_SCHEMA)
        out = similarity.pq_topk(emb, m=4, ksub=8, dim=64, n_queries=4, k=5)
        got = out.collect()
        assert got, "pq_topk returned nothing"
        for r in got:
            # duplicates of the query's own base vector score ~1.0
            if (r.target_id - r.query_id) % 8 == 0:
                assert abs(r.sim - 1.0) < 1e-3, r

    def test_m_must_divide_dim(self, spark):
        from coies_spark.ops import similarity

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        with pytest.raises(ValueError, match="divide"):
            similarity.pq_codebooks(emb, m=5, dim=64)


def test_language_id_chargram_separates_scripts(spark):
    """Char-3-gram profiles must classify by orthography even when
    token profiles would fail (unseen words at test time)."""
    from coies_spark.ops import textstats

    rows = []
    i = 0
    # training signal: distinct orthographies
    for w, lang in ((("schnell", "zeitung", "straße"), "de"),
                    (("quickly", "thought", "through"), "en")):
        for _ in range(10):
            rows.append((i, " ".join(w), lang, "s", 1))
            i += 1
    # held-out-ish docs reusing the same character patterns
    rows.append((100, "zeitung straße schnell", "de", "s", 1))
    rows.append((101, "through thought quickly", "en", "s", 1))
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {
        r.doc_id: r.pred_lang
        for r in textstats.language_id_chargram(docs).collect()
    }
    assert out[100] == "de" and out[101] == "en"
    # empty-doc robustness
    empty = spark.createDataFrame([(0, "", "en", "s", 0)], DOC_SCHEMA)
    assert textstats.language_id_chargram(empty).count() == 1


def test_dedup_cluster_sizes_histogram(spark, tiny_docs):
    from coies_spark.ops import dedup

    # tiny_docs: docs 0 and 3 share a bag; 1 and 2 are both tokenless
    # (empty digest bag) so they also share a group
    hist = {
        r.cluster_size: r.n_clusters
        for r in dedup.dedup_cluster_sizes(tiny_docs).collect()
    }
    assert hist == {2: 2}


def test_embedding_norm_stats_detects_blowup(spark):
    """The trainer-health gauge: norm percentiles must surface a
    diverged model whose cosine geometry still looks fine."""
    import numpy as np

    from coies_spark.ops import similarity

    rng = np.random.RandomState(1)
    healthy = [
        (i, (rng.randn(8) / 8).tolist(), 0) for i in range(50)
    ]
    s1 = similarity.embedding_norm_stats(
        spark.createDataFrame(healthy, EMB_SCHEMA)
    ).collect()[0]
    # same directions, exploded magnitudes (the delta-sum failure mode)
    blown = [(i, (np.array(v) * 1e9).tolist(), l) for i, v, l in healthy]
    s2 = similarity.embedding_norm_stats(
        spark.createDataFrame(blown, EMB_SCHEMA)
    ).collect()[0]
    assert s2.norm_p50 > 1e8 * s1.norm_p50
    assert s1.n_vectors == s2.n_vectors == 50
    assert s1.norm_min <= s1.norm_p25 <= s1.norm_p50 <= s1.norm_p75 <= s1.norm_max


def test_ivf_pq_composes_exactly(spark):
    """IVF-PQ must equal PQ-ADC restricted to the probed buckets: any
    (query, target) pair in both results carries the SAME sim, and
    every IVF-PQ target lies in its query's probe-1 bucket."""
    from coies_spark.ops import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ivfpq = similarity.ivf_pq_topk(emb, dim=64).collect()
    pq = {
        (r.query_id, r.target_id): r.sim
        for r in similarity.pq_topk(emb, dim=64, k=500).collect()
    }
    labels = {
        r.vec_id: r.label
        for r in similarity.kmeans_labels(emb, k=8, iters=2).collect()
    }
    # independently recompute each query's nearest re-centroided label
    import numpy as np

    vecs = {r.vec_id: np.array(r.embedding, float) for r in emb.collect()}
    cents = {}
    for v, lab in labels.items():
        cents.setdefault(lab, []).append(vecs[v])
    cents = {lab: np.mean(vs, axis=0).round(6) for lab, vs in cents.items()}

    def cos(a, b):
        return round(
            float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 4
        )

    def probe_label(q):
        return min(
            cents, key=lambda lab: (-cos(vecs[q], cents[lab]), lab)
        )

    assert ivfpq
    for r in ivfpq:
        if (r.query_id, r.target_id) in pq:
            assert pq[(r.query_id, r.target_id)] == r.sim, r
        # every target lies in ITS QUERY'S argmax-cosine bucket
        assert labels[r.target_id] == probe_label(r.query_id), r
    # each query's targets all share one bucket (nprobe=1)
    by_q = {}
    for r in ivfpq:
        by_q.setdefault(r.query_id, set()).add(labels[r.target_id])
    assert all(len(v) == 1 for v in by_q.values()), by_q


def test_residual_ivf_pq_improves_reconstruction(spark):
    """On clustered data (where coarse centroids carry real signal),
    residual encoding must approximate exact cosine at least as well
    as raw-vector PQ for the same code budget — the reason FAISS
    IVFPQ quantizes residuals."""
    import numpy as np

    from coies_spark.ops import similarity

    rng = np.random.RandomState(7)
    centers = rng.randn(8, 64) * 3
    rows = [
        (
            i,
            (centers[i % 8] + rng.randn(64) * 0.3)
            .astype(np.float32)
            .tolist(),
            i % 8,
        )
        for i in range(400)
    ]
    emb = spark.createDataFrame(rows, EMB_SCHEMA)
    exact = {
        (r.query_id, r.target_id): r.sim
        for r in similarity.brute_topk(emb, k=399).collect()
    }

    def mean_err(res):
        errs = [
            abs(r.sim - exact[(r.query_id, r.target_id)])
            for r in res
            if (r.query_id, r.target_id) in exact
        ]
        assert errs
        return float(np.mean(errs))

    raw_err = mean_err(similarity.ivf_pq_topk(emb, dim=64).collect())
    res_err = mean_err(
        similarity.ivf_pq_topk(emb, dim=64, residual=True).collect()
    )
    # measured 0.0042 vs 0.0051; allow headroom but require no worse
    assert res_err <= raw_err, (res_err, raw_err)
    assert res_err < 0.02


def test_ivf_pq_nprobe_recall_lever(spark):
    """nprobe=2 must widen the candidate set monotonically: sims agree
    on common pairs, targets span at most 2 buckets, and each query's
    nprobe=2 top-k is at least as close to exhaustive PQ as nprobe=1."""
    from coies_spark.ops import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    one = similarity.ivf_pq_topk(emb, dim=64, nprobe=1).collect()
    two = similarity.ivf_pq_topk(emb, dim=64, nprobe=2).collect()
    labels = {
        r.vec_id: r.label
        for r in similarity.kmeans_labels(emb, k=8, iters=2).collect()
    }
    s1 = {(r.query_id, r.target_id): r.sim for r in one}
    s2 = {(r.query_id, r.target_id): r.sim for r in two}
    for pair, sim in s1.items():
        if pair in s2:
            assert s2[pair] == sim, pair
    by_q = {}
    for r in two:
        by_q.setdefault(r.query_id, set()).add(labels[r.target_id])
    assert all(1 <= len(v) <= 2 for v in by_q.values()), by_q
    # top-1 sim can only improve (or stay) when probing more buckets
    top1 = lambda rows: {
        r.query_id: r.sim for r in rows if r.rank == 1
    }
    t1, t2 = top1(one), top1(two)
    assert all(t2[q] >= t1[q] for q in t1), (t1, t2)


def test_simhash_pairs_blocking_is_complete(spark):
    """The pigeonhole blocking must find EVERY pair within the Hamming
    threshold — verified against brute force over all fingerprint
    pairs, for block counts that split 64 bits unevenly (d=2 -> 3
    blocks of 21/21/22) and for the single-block d=0 edge (the block
    reaches the sign bit, exercising the unmasked-final-block path).
    Prints are SIGNED 64-bit, so the brute-force XOR masks to 64 bits
    before the popcount."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).where("doc_id < 120")
    prints = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    mask64 = (1 << 64) - 1
    for d in (0, 1, 2, 3):
        got = {
            (r.doc_a, r.doc_b): r.hamming
            for r in dedup.simhash_pairs(docs, max_hamming=d).collect()
        }
        want = {}
        ids = sorted(prints)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                h = bin((prints[a] ^ prints[b]) & mask64).count("1")
                if h <= d:
                    want[(a, b)] = h
        assert got == want, (d, len(got), len(want))


def test_simhash_pairs_degenerate_params_raise(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(2)
    with pytest.raises(ValueError, match="pigeonhole block"):
        # 16 bits / (15+1) blocks -> width 1 is fine; 15+2 -> width 0
        dedup.simhash_pairs(docs, max_hamming=16, bits=16).collect()
    with pytest.raises(ValueError, match="bits must be"):
        dedup.simhash(docs, bits=8)


def test_simhash64_buckets_shrink_vs_16bit(spark):
    """The reason 64-bit is the production default: on a 10^4-doc
    corpus the 16-bit config (4-bit blocks at max_hamming=3, only 16
    bucket values/block) piles ~n/16 docs into every bucket — an
    O(n^2/16) candidate join — while 64-bit (16-bit blocks) keeps the
    largest bucket tiny.  Docs are synthetic with pseudo-random token
    sets so fingerprints spread uniformly.  Token text must stay
    alphanumeric: '_' is in TOKEN_SPLIT_CHARCLASS, so a "w3_123"
    shape would shed a 'w3' token shared by EVERY doc and correlate
    all fingerprints."""
    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{j}q"), F.expr(f"(id * 31 + {j * 17}) % 40000"))
                for j in range(12)
            ],
        ).alias("text"),
    )

    def max_bucket(bits):
        banded = dedup.simhash_blocks(
            dedup.simhash(docs, bits), max_hamming=3, bits=bits
        )
        top = (
            banded.groupBy("blk", "bv")
            .count()
            .agg(F.max("count").alias("m"))
            .collect()[0]
        )
        return top.m

    m16, m64 = max_bucket(16), max_bucket(64)
    # 16-bit: 4 blocks x 16 values -> expected ~625/bucket
    assert m16 > 300, m16
    # 64-bit: 4 blocks x 65536 values -> near-singleton buckets
    assert m64 < 50, (m16, m64)


def test_frame_sample_edges(spark):
    from coies_spark.ops import multimodal

    rows = [
        # video shorter than the sampling interval: one frame at t=0
        (2, "ab", "en", "s", 50),     # doc_id%3==2 -> video, 500ms
        # longer video: 3 frames at 0/1000/2000 (3500ms, idx 0..2)
        (5, "abc", "en", "s", 350),   # video, 3500ms
        # non-video rows are excluded entirely
        (0, "x", "en", "s", 100),     # image
        (1, "y", "en", "s", 100),     # audio
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    media = multimodal.synthesize_media(docs)
    out = sorted(
        (r.media_id, r.frame_idx, r.frame_ts_ms)
        for r in multimodal.frame_sample(media).collect()
    )
    assert out == [
        ("m-2", 0, 0),
        ("m-5", 0, 0), ("m-5", 1, 1000), ("m-5", 2, 2000),
    ]


class TestDuplicateSpans:
    """ExactSubstr span dedup (Lee et al. 2022): windows that repeat
    anywhere (same or other doc) merge into maximal spans."""

    def test_cross_doc_span_and_merge(self, spark):
        # docs 0 and 1 share tokens a..h (8 tokens); k=5 → dup windows
        # at pos 0,1,2,3 in both docs, merging into ONE span [0, 7]
        shared = "a b c d e f g h"
        rows = [
            (0, shared + " x0 y0 z0", "en", "s", 0),
            (1, shared + " x1 y1 z1", "en", "s", 0),
            (2, "p q r s t u v w", "en", "s", 0),   # unique: no spans
            (3, "t0 t1", "en", "s", 0),             # shorter than k
        ]
        docs = spark.createDataFrame(rows, DOC_SCHEMA)
        from coies_spark.ops.dedup import duplicate_spans

        got = {
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in duplicate_spans(docs, span_tokens=5).collect()
        }
        assert got == {(0, 0, 7, 8), (1, 0, 7, 8)}

    def test_intra_doc_repeat_and_distinct_islands(self, spark):
        # one doc repeats its own 5-token phrase at pos 0 and pos 10
        # (gap 10 > k=5): two separate maximal spans in the SAME doc
        text = "a b c d e u1 u2 u3 u4 u5 a b c d e w1 w2 w3 w4 w5"
        docs = spark.createDataFrame([(7, text, "en", "s", 0)], DOC_SCHEMA)
        from coies_spark.ops.dedup import duplicate_spans

        got = sorted(
            (r.span_start, r.span_end)
            for r in duplicate_spans(docs, span_tokens=5).collect()
        )
        assert got == [(0, 4), (10, 14)]

    def test_empty_and_no_dup_inputs(self, spark, empty_docs, tiny_docs):
        from coies_spark.ops.dedup import duplicate_spans

        assert duplicate_spans(empty_docs).count() == 0
        # tiny_docs: dup texts are 3 tokens < default k=50 → no spans
        assert duplicate_spans(tiny_docs).count() == 0


class TestTranscriptOps:
    def test_synthesis_preserves_text(self, spark, tiny_docs):
        """Per-row invariant from the north rule: concatenating a
        conversation's turn texts in turn_idx order reconstructs the
        source document byte-for-byte."""
        from pyspark.sql import functions as F

        from coies_spark.ops.transcripts import synthesize_transcripts

        t = synthesize_transcripts(tiny_docs)
        rebuilt = {
            r.conv_id: r.full
            for r in t.groupBy("conv_id")
            .agg(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("turn_idx", "text"))
                        ),
                        lambda s: s.text,
                    ),
                ).alias("full")
            )
            .collect()
        }
        src = {f"conv-{r.doc_id}": r.text for r in tiny_docs.collect()}
        assert rebuilt == src

    def test_conversation_stats_counts(self, spark):
        from coies_spark.ops.transcripts import conversation_stats

        rows = [
            # conv A: strict alternation, one tool call, 10 s span
            ("A", 0, "user", "hi there", None, 100),
            ("A", 1, "assistant", "hello hello", "search", 110),
            # conv B: two user turns in a row = 1 violation
            ("B", 0, "user", "x", None, 5),
            ("B", 1, "user", "y z", None, 6),
        ]
        from pyspark.sql import functions as F

        t = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts_raw long",
        ).withColumn("ts", F.timestamp_seconds("ts_raw"))
        got = {
            r.conv_id: r.asDict()
            for r in conversation_stats(t).collect()
        }
        a, b = got["A"], got["B"]
        assert (a["n_turns"], a["n_user"], a["n_assistant"]) == (2, 1, 1)
        assert a["n_tool_calls"] == 1
        assert a["alternation_violations"] == 0
        assert a["duration_s"] == 10
        assert a["avg_turn_tokens"] == 2.0
        assert b["alternation_violations"] == 1
        assert b["n_assistant"] == 0

    def test_scrub_cuts_every_span_occurrence(self, spark):
        shared = "a b c d e f g h"
        rows = [
            (0, shared + " x0 y0 z0", "en", "s", 0),
            (1, shared + " x1 y1 z1", "en", "s", 0),
            (2, "p q r s t u v w", "en", "s", 0),  # untouched
            (3, "", "en", "s", 0),                 # empty doc
        ]
        docs = spark.createDataFrame(rows, DOC_SCHEMA)
        from coies_spark.ops.dedup import scrub_duplicate_spans

        got = {
            r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
            for r in scrub_duplicate_spans(docs, span_tokens=5).collect()
        }
        assert got[0] == ("x0 y0 z0", 3, 8)
        assert got[1] == ("x1 y1 z1", 3, 8)
        assert got[2] == ("p q r s t u v w", 8, 0)
        assert got[3] == ("", 0, 0)
        assert len(got) == 4


class TestBoilerplateTurns:
    @pytest.fixture(scope="class")
    def turns(self, spark):
        rows = [
            # "hello!" (modulo case/space) appears in 3 convs — twice
            # in A; "rare" turns are conv-local; C's is empty
            ("A", 0, "user", "Hello!", None),
            ("A", 1, "assistant", "rare a", None),
            ("A", 2, "user", "hello!", None),
            ("B", 0, "user", "  hello!  ", None),
            ("B", 1, "assistant", "rare b", None),
            ("C", 0, "user", "hello!", None),
            ("C", 1, "assistant", "", None),
        ]
        return spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string",
        )

    def test_dictionary_counts(self, spark, turns):
        from coies_spark.ops.transcripts import boilerplate_turns

        got = boilerplate_turns(turns, min_convs=2).collect()
        assert len(got) == 1
        (row,) = got
        assert row.sample_text == "hello!"
        assert row.n_convs == 3   # distinct conversations
        assert row.n_turns == 4   # total occurrences (A has 2)

    def test_scrub_drops_only_boilerplate(self, spark, turns):
        from coies_spark.ops.transcripts import scrub_boilerplate_turns

        kept = scrub_boilerplate_turns(turns, min_convs=2).collect()
        texts = sorted(r.text for r in kept)
        # boilerplate gone; rare turns byte-identical; empty turn kept
        assert texts == ["", "rare a", "rare b"]

    def test_min_convs_threshold(self, spark, turns):
        from coies_spark.ops.transcripts import boilerplate_turns

        # at min_convs=4 nothing qualifies (hello! spans 3 convs)
        assert boilerplate_turns(turns, min_convs=4).count() == 0


def test_tool_transitions_edges_and_probabilities(spark):
    from coies_spark.ops.transcripts import tool_transitions

    rows = [
        # conv A tool sequence: search -> code -> search
        ("A", 0, "user", "t", None),
        ("A", 1, "assistant", "t", "search"),
        ("A", 2, "user", "t", None),
        ("A", 3, "assistant", "t", "code"),
        ("A", 5, "assistant", "t", "search"),
        # conv B: search only; C: no tools at all
        ("B", 0, "assistant", "t", "search"),
        ("C", 0, "user", "t", None),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string",
    )
    got = {
        (r.src_tool, r.dst_tool): (r.n, r.p)
        for r in tool_transitions(t).collect()
    }
    assert got[("<start>", "search")] == (2, 1.0)  # A and B entries
    assert got[("search", "code")] == (1, 1.0)
    assert got[("code", "search")] == (1, 1.0)
    assert len(got) == 3
    # probabilities normalize per src_tool
    import collections

    per_src = collections.defaultdict(float)
    for (src, _), (_, p) in got.items():
        per_src[src] += p
    assert all(abs(v - 1.0) < 1e-9 for v in per_src.values())


class TestTokenBudgetSample:
    @pytest.fixture(scope="class")
    def sized(self, spark):
        rows = [(i, "en" if i % 2 == 0 else "de", 10 + i) for i in range(40)]
        return spark.createDataFrame(
            rows, "doc_id bigint, lang string, n_tokens bigint"
        )

    def test_budget_reached_not_undershot(self, spark, sized):
        from coies_spark.ops.sampling import token_budget_sample

        got = token_budget_sample(sized, 100, strata_col="lang").collect()
        import collections

        tot = collections.defaultdict(int)
        for r in got:
            tot[r.lang] += r.n_tokens
        # every stratum crosses the budget (the crossing doc is kept)
        # but by less than one doc's width
        assert all(v >= 100 for v in tot.values())
        assert all(v < 100 + 10 + 40 for v in tot.values())

    def test_budgets_are_nested(self, spark, sized):
        from coies_spark.ops.sampling import token_budget_sample

        small = {
            r.doc_id
            for r in token_budget_sample(
                sized, 60, strata_col="lang"
            ).collect()
        }
        large = {
            r.doc_id
            for r in token_budget_sample(
                sized, 150, strata_col="lang"
            ).collect()
        }
        assert small < large

    def test_budget_zero_and_unstratified(self, spark, sized):
        from coies_spark.ops.sampling import token_budget_sample

        first = token_budget_sample(sized, 1).collect()
        # budget 1: exactly one doc globally (cum_before=0 < 1)
        assert len(first) == 1 and first[0].cum_before == 0


def test_semdedup_keeps_smallest_id_per_neighborhood(spark):
    from coies_spark.ops.similarity import semdedup

    # two tight duplicate groups + one singleton, ids interleaved so
    # the keeper rule (smallest id survives) is actually exercised
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (5, [0.999, 0.01, 0.0, 0.0]),   # dup of 0
        (9, [0.998, 0.02, 0.0, 0.0]),   # dup of 0 and 5
        (2, [0.0, 1.0, 0.0, 0.0]),
        (7, [0.0, 0.999, 0.01, 0.0]),   # dup of 2
        (3, [0.0, 0.0, 0.0, 1.0]),      # singleton
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    got = {r.vec_id: r.kept for r in semdedup(emb, n_clusters=3, eps=0.97).collect()}
    assert len(got) == 6
    assert got[0] and got[2] and got[3]
    assert not got[5] and not got[9] and not got[7]


class TestDsir:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = (
            # target-looking docs share the "spark shuffle" vocabulary
            [(i, "spark shuffle join spark shuffle", "en", "s", 0) for i in range(5)]
            # off-target docs use disjoint vocabulary
            + [(10 + i, "mango papaya guava mango papaya", "de", "s", 0) for i in range(5)]
            # a raw doc that LOOKS like the target but isn't labeled
            + [(20, "spark shuffle join", "de", "s", 0), (21, "", "de", "s", 0)]
        )
        return spark.createDataFrame(rows, DOC_SCHEMA)

    def test_weights_rank_target_alike_docs_first(self, spark, corpus):
        from coies_spark.ops.dsir import dsir_logweights

        w = {
            r.id: r.logw
            for r in dsir_logweights(corpus, F.col("lang") == "en").collect()
        }
        # the unlabeled target-vocabulary doc outranks every off-target doc
        assert all(w[20] > w[10 + i] for i in range(5))
        # and the target docs themselves score highest
        assert min(w[i] for i in range(5)) > max(w[10 + i] for i in range(5))
        # empty doc contributes no grams -> absent from the ranking
        assert 21 not in w

    def test_select_is_deterministic_across_partitioning(self, spark, corpus):
        from coies_spark.ops.dsir import dsir_select

        a = dsir_select(corpus, F.col("lang") == "en", 6).collect()
        b = dsir_select(
            corpus.repartition(7), F.col("lang") == "en", 6
        ).collect()
        assert [(r.id, r.logw, r.rank) for r in a] == [
            (r.id, r.logw, r.rank) for r in b
        ]
        assert [r.rank for r in a] == list(range(1, 7))


def test_dsir_plan_shape(spark):
    """One corpus-sized exchange (the (id,bucket) count groupBy with a
    map-side partial), ratio table broadcast back, top-k via
    TakeOrdered — never a corpus-wide sort or a corpus-to-corpus
    join."""
    from coies_spark.ops.dsir import dsir_select

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = dsir_select(docs, F.col("lang") == "en", 10)
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "TakeOrderedAndProject" in p
    assert "partial_count" in p          # map-side combine on the counts
    assert "CartesianProduct" not in p
    assert p.count("BroadcastExchange") >= 1  # ratio table broadcast


class TestAsofJoin:
    def test_semantics_ties_and_misses(self, spark):
        from coies_spark.ops.relational import asof_join

        left = spark.createDataFrame(
            [(100, 1, 50), (101, 1, 25), (102, 2, 5)],
            "event_id bigint, user_id bigint, us bigint",
        )
        right = spark.createDataFrame(
            [
                (7, 1, 50, 0.5),   # same-ts as left 100 -> <= matches
                (8, 1, 50, 0.9),   # tie on (key, ts): larger id wins
                (3, 1, 20, 0.1),
                (9, 2, 6, 0.2),    # after left 102 -> no match
            ],
            "event_id bigint, user_id bigint, us bigint, value double",
        )
        out = {
            r.event_id: (r.r_event_id, r.r_value)
            for r in asof_join(
                left, right, "user_id", left_ts="us", right_ts="us",
                right_cols=("event_id", "value"), right_id="event_id",
            ).collect()
        }
        assert out[100] == (8, 0.9)       # tie matches, largest id wins
        assert out[101] == (3, 0.1)       # latest prior, not a later one
        assert out[102] == (None, None)   # nothing at-or-before
        assert len(out) == 3              # every left row survives

    def test_null_payload_field_still_matches(self, spark):
        from coies_spark.ops.relational import asof_join

        left = spark.createDataFrame(
            [(1, 1, 100)], "event_id bigint, user_id bigint, us bigint"
        )
        right = spark.createDataFrame(
            [(5, 1, 40, 1.0), (6, 1, 60, None)],
            "event_id bigint, user_id bigint, us bigint, value double",
        )
        (row,) = asof_join(
            left, right, "user_id", left_ts="us", right_ts="us",
            right_cols=("event_id", "value"), right_id="event_id",
        ).collect()
        # the struct payload carries the NEWER row even though its
        # value field is NULL (column-wise carry would resurrect 1.0)
        assert (row.r_event_id, row.r_value) == (6, None)

    def test_single_shuffle_plan(self, spark):
        from coies_spark.ops.relational import asof_join

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        out = asof_join(
            ev, ev, "user_id", right_cols=("value",), right_id="event_id"
        )
        p = out._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("simple")
        )
        assert p.count("Exchange") == 1
        assert "Join" not in p  # the union-window form, not a join


class TestCooccurrenceEdges:
    def test_counts_distinct_and_canonical(self, spark):
        from coies_spark.operators.graph import cooccurrence_edges

        rows = [
            (1, "b"), (1, "a"), (1, "a"),   # within-group dup collapses
            (2, "a"), (2, "b"), (2, "c"),
            (3, "c"),                        # singleton group: no edges
        ]
        df = spark.createDataFrame(rows, "g bigint, v string")
        got = {
            (r.a, r.b): r.n_groups
            for r in cooccurrence_edges(df, "g", "v").collect()
        }
        assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}

    def test_cap_bounds_hub_groups(self, spark):
        from coies_spark.operators.graph import cooccurrence_edges

        rows = [(1, f"v{i:03d}") for i in range(10)]
        df = spark.createDataFrame(rows, "g bigint, v string")
        got = cooccurrence_edges(df, "g", "v", max_per_group=4).collect()
        # only the 4 smallest values survive -> C(4,2) edges
        assert len(got) == 6
        kept = {x for r in got for x in (r.a, r.b)}
        assert kept == {"v000", "v001", "v002", "v003"}

    def test_degenerate_cap_raises(self, spark):
        from coies_spark.operators.graph import cooccurrence_edges

        df = spark.createDataFrame([(1, "a")], "g bigint, v string")
        with pytest.raises(ValueError):
            cooccurrence_edges(df, "g", "v", max_per_group=1)


class TestWinnowFingerprints:
    @staticmethod
    def _expected(text, k=3, w=4):
        """Brute-force single-node winnowing twin (robust winnowing:
        window min with rightmost tie-break, arithmetic encoding)."""
        import hashlib

        from coies_spark.core.textproc import tokenize

        toks = tokenize(text.lower())
        if len(toks) >= k:
            sh = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        else:
            sh = [" ".join(toks)]
        m = 1 << 20
        keys = [
            int(hashlib.md5(s.encode()).hexdigest()[:8], 16) * m
            + (m - 1 - i)
            for i, s in enumerate(sh)
        ]
        weff = min(w, len(keys))
        picked = {
            min(keys[p : p + weff]) for p in range(len(keys) - weff + 1)
        }
        return (
            len(picked),
            min(picked),
            sum(x // m for x in picked),
        )

    def test_matches_single_node_twin(self, spark, tiny_docs):
        got = {
            r.doc_id: (r.n_fp, r.fp_min, r.fp_digest)
            for r in textstats.winnow_fingerprints(tiny_docs).collect()
        }
        texts = {
            r.doc_id: r.text for r in tiny_docs.select("doc_id", "text").collect()
        }
        assert set(got) == set(texts)
        for doc_id, text in texts.items():
            assert got[doc_id] == self._expected(text), doc_id

    def test_shared_run_selects_shared_hashes(self, spark):
        # two docs sharing a long token run must share fingerprint
        # hashes from inside the run (the winnowing guarantee)
        run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        docs = spark.createDataFrame(
            [(0, f"intro words {run}"), (1, f"{run} closing other text")],
            "doc_id bigint, text string",
        )
        import hashlib

        m = 1 << 20
        rows = {
            r.doc_id: r
            for r in textstats.winnow_fingerprints(docs).collect()
        }
        # recompute selected key sets (positions differ, hashes overlap)
        def selected_keys(text, k=3, w=4):
            from coies_spark.core.textproc import tokenize

            toks = tokenize(text.lower())
            sh = [
                " ".join(toks[i : i + k])
                for i in range(len(toks) - k + 1)
            ]
            keys = [
                int(hashlib.md5(s.encode()).hexdigest()[:8], 16) * m
                + (m - 1 - i)
                for i, s in enumerate(sh)
            ]
            weff = min(w, len(keys))
            return {
                min(keys[p : p + weff])
                for p in range(len(keys) - weff + 1)
            }

        s0 = selected_keys("intro words " + run)
        s1 = selected_keys(run + " closing other text")
        h0, h1 = {x // m for x in s0}, {x // m for x in s1}
        assert h0 & h1, "shared run must produce shared fingerprints"
        # the ENGINE's selection must equal the recomputation exactly
        for doc_id, sel in ((0, s0), (1, s1)):
            r = rows[doc_id]
            assert r.n_fp == len(sel)
            assert r.fp_min == min(sel)
            assert r.fp_digest == sum(x // m for x in sel)

    def test_empty_input(self, spark, empty_docs):
        assert textstats.winnow_fingerprints(empty_docs).count() == 0

    def test_rejects_bad_params(self, spark, tiny_docs):
        with pytest.raises(ValueError):
            textstats.winnow_fingerprints(tiny_docs, k=0)


class TestPredicateProfile:
    def test_known_profiles(self, spark):
        from coies_spark.ops import kg

        triples = spark.createDataFrame(
            [
                ("s1", "name", "a"),
                ("s2", "name", "b"),
                ("s3", "name", "b"),
                ("s1", "likes", "x"),
                ("s1", "likes", "y"),
                ("s2", "likes", "x"),
                ("s1", "likes", "x"),  # duplicate assertion drops out
            ],
            "subj string, pred string, obj string",
        )
        got = {r.pred: r for r in kg.predicate_profile(triples).collect()}
        name = got["name"]
        assert (name.n_triples, name.n_subj, name.n_obj) == (3, 3, 2)
        assert name.functionality == 1.0
        assert name.inverse_functionality == round(2 / 3, 6)
        assert (name.top_obj, name.top_obj_share) == ("b", round(2 / 3, 6))
        likes = got["likes"]
        assert (likes.n_triples, likes.n_subj, likes.n_obj) == (3, 2, 2)
        assert likes.functionality == round(2 / 3, 6)
        assert (likes.top_obj, likes.top_obj_share) == ("x", round(2 / 3, 6))

    def test_modal_tie_breaks_to_larger_obj(self, spark):
        from coies_spark.ops import kg

        triples = spark.createDataFrame(
            [("s1", "p", "aa"), ("s2", "p", "zz")],
            "subj string, pred string, obj string",
        )
        row = kg.predicate_profile(triples).collect()[0]
        assert row.top_obj == "zz"  # (count, obj) max → obj desc on ties


class TestPackTurns:
    @staticmethod
    def _mk(spark, rows):
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string"
        )

    def test_offset_chunking(self, spark):
        from coies_spark.ops import transcripts as tr

        # 3-token turns, budget 6: offsets 0,3,6,9 -> chunks 0,0,1,1
        rows = [("c", i, "one two three") for i in range(4)]
        got = {
            r.chunk_id: r
            for r in tr.pack_turns(self._mk(spark, rows), 6).collect()
        }
        assert set(got) == {0, 1}
        for cid, r in got.items():
            assert (r.n_turns, r.n_tokens) == (2, 6)
            assert r.packed_text == "one two three one two three"
        assert (got[0].first_turn, got[0].last_turn) == (0, 1)
        assert (got[1].first_turn, got[1].last_turn) == (2, 3)

    def test_overflow_turn_stays_whole(self, spark):
        from coies_spark.ops import transcripts as tr

        # second turn starts at offset 2 (< budget 4) and is 5 tokens
        # long: it stays whole in chunk 0 (split at offsets, not
        # mid-turn), overflowing the budget
        rows = [("c", 0, "a b"), ("c", 1, "c d e f g"), ("c", 2, "h")]
        got = {
            r.chunk_id: r
            for r in tr.pack_turns(self._mk(spark, rows), 4).collect()
        }
        assert got[0].n_tokens == 7 and got[0].n_turns == 2
        assert got[1].packed_text == "h"

    def test_turn_order_is_stable(self, spark):
        from coies_spark.ops import transcripts as tr

        rows = [("c", i, f"tok{i}") for i in reversed(range(8))]
        df = self._mk(spark, rows).repartition(5)
        got = tr.pack_turns(df, 100).collect()
        assert len(got) == 1
        assert got[0].packed_text == " ".join(f"tok{i}" for i in range(8))

    def test_rejects_bad_budget(self, spark):
        from coies_spark.ops import transcripts as tr

        with pytest.raises(ValueError):
            tr.pack_turns(self._mk(spark, [("c", 0, "x")]), 0)


class TestIncrementalNeardup:
    @staticmethod
    def _docs(spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_batch_dup_points_at_min_corpus_doc(self, spark):
        from coies_spark.ops import dedup

        text = "alpha beta gamma delta epsilon zeta"
        corpus = self._docs(spark, [(7, text), (3, text),
                                    (5, "totally different words here")])
        batch = self._docs(spark, [(100, text),
                                   (101, "nothing shares these tokens")])
        got = {r.doc_id: r for r in
               dedup.incremental_neardup(corpus, batch).collect()}
        assert got[100].is_new is False and got[100].dup_of == 3
        assert got[101].is_new is True and got[101].dup_of is None

    def test_intra_batch_dups_not_flagged(self, spark):
        from coies_spark.ops import dedup

        corpus = self._docs(spark, [(1, "unrelated corpus text entirely")])
        twin = "same words in both batch documents exactly"
        batch = self._docs(spark, [(10, twin), (11, twin)])
        got = {r.doc_id: r.is_new for r in
               dedup.incremental_neardup(corpus, batch).collect()}
        # both are new vs the CORPUS; intra-batch dedup is the
        # self-join's job (documented contract)
        assert got == {10: True, 11: True}

    def test_short_docs_get_truncated_shingle_rows(self, spark):
        from coies_spark.ops import dedup

        # shorter-than-n docs carry one truncated shingle (the
        # shingles_col convention), so they still appear — and two
        # identical short docs still collide
        corpus = self._docs(spark, [(1, "long enough corpus text"),
                                    (2, "ab")])
        batch = self._docs(spark, [(10, "ab"), (11, "x y z w words")])
        got = {r.doc_id: r for r in
               dedup.incremental_neardup(corpus, batch).collect()}
        assert set(got) == {10, 11}
        assert got[10].is_new is False and got[10].dup_of == 2
        assert got[11].is_new is True

    def test_matches_self_join_semantics(self, spark):
        from coies_spark.ops import dedup

        # any (batch, corpus) collision found by the full self-join
        # must be found by the incremental screen, and vice versa
        rows = [(i, f"shared prefix words tail{i % 3}") for i in range(12)]
        docs = self._docs(spark, rows)
        corpus = docs.where("doc_id % 4 != 0")
        batch = docs.where("doc_id % 4 = 0")
        pairs = dedup.lsh_candidate_pairs(docs)
        want_dup = {
            b: True
            for (a, b) in [
                (r.doc_a, r.doc_b) for r in pairs.collect()
            ] + [(r.doc_b, r.doc_a) for r in pairs.collect()]
            if b % 4 == 0 and a % 4 != 0
        }
        got = {r.doc_id: not r.is_new for r in
               dedup.incremental_neardup(corpus, batch).collect()}
        for doc_id, dup in got.items():
            assert dup == want_dup.get(doc_id, False), doc_id


class TestBM25:
    @staticmethod
    def _docs(spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_hand_computed_score(self, spark):
        import math
        from coies_spark.ops import textstats

        # 2 docs, query {"cat"}: doc 1 has tf=2 dl=4, doc 2 tf=0 dl=2
        docs = self._docs(spark, [(1, "cat cat dog bird"), (2, "dog bird")])
        rows = textstats.bm25_topk(docs, ["cat"], topk=5).collect()
        assert [r.doc_id for r in rows] == [1]
        n, df, tf, dl, avgdl = 2, 1, 2, 4, 3.0
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        want = round(round(
            idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)),
            9), 6)
        assert rows[0].score == want and rows[0].rank == 1

    def test_multi_term_sum_and_order(self, spark):
        from coies_spark.ops import textstats

        docs = self._docs(spark, [
            (1, "cat dog"), (2, "cat cat cat"), (3, "fish only here"),
        ])
        rows = textstats.bm25_topk(docs, ["cat", "dog"], topk=2).collect()
        assert len(rows) == 2
        # doc 1 matches both terms; dog is rarer (df=1 vs df=2)
        assert rows[0].doc_id == 1 and rows[0].rank == 1
        assert rows[1].doc_id == 2 and rows[1].rank == 2
        assert rows[0].score > rows[1].score

    def test_rejects_empty_query(self, spark):
        from coies_spark.ops import textstats

        with pytest.raises(ValueError):
            textstats.bm25_topk(self._docs(spark, [(1, "x")]), [])

    def test_topk_plan_is_take_ordered(self, spark):
        from coies_spark.ops import textstats

        docs = self._docs(spark, [(i, f"cat word{i}") for i in range(20)])
        plan = textstats.bm25_topk(docs, ["cat"], topk=3)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestConversationNeardup:
    SCHEMA = ("conv_id string, turn_idx int, role string, text string,"
              " tool string, ts timestamp")

    def _tr(self, spark, rows):
        return spark.createDataFrame(
            [(c, i, "user", t, None, None) for c, i, t in rows], self.SCHEMA
        )

    def test_same_text_different_turn_split_collides(self, spark):
        from coies_spark.ops import transcripts as tr

        body = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [("c1", 0, body),
                ("c2", 0, "alpha beta gamma delta"),
                ("c2", 1, "epsilon zeta eta theta"),
                ("c3", 0, "completely unrelated conversation text here")]
        got = {tuple(r) for r in
               tr.conversation_neardup(self._tr(spark, rows)).collect()}
        assert ("c1", "c2") in got
        assert all("c3" not in p for p in got)

    def test_turn_order_invariant(self, spark):
        from coies_spark.ops import transcripts as tr

        rows = [("c1", 1, "beta gamma"), ("c1", 0, "alpha"),
                ("c2", 0, "alpha"), ("c2", 1, "beta gamma")]
        df = self._tr(spark, rows).repartition(5)
        got = {tuple(r) for r in tr.conversation_neardup(df).collect()}
        assert ("c1", "c2") in got


class TestScrubPiiTurns:
    SCHEMA = ("conv_id string, turn_idx int, role string, text string,"
              " tool string, ts timestamp")

    def _tr(self, spark, rows):
        return spark.createDataFrame(
            [(c, i, r, t, None, None) for c, i, r, t in rows], self.SCHEMA
        )

    def test_user_turns_scrubbed_assistant_passthrough(self, spark):
        from coies_spark.ops import transcripts as tr

        rows = [
            ("c", 0, "user", "mail me at bob@example.com please"),
            ("c", 1, "assistant", "noted: bob@example.com it is"),
        ]
        got = {r.turn_idx: r for r in
               tr.scrub_pii_turns(self._tr(spark, rows)).collect()}
        assert "bob@example.com" not in got[0].text
        assert got[0].n_email == 1
        # assistant turn byte-identical, zero counts
        assert got[1].text == "noted: bob@example.com it is"
        assert got[1].n_email == 0

    def test_roles_none_scrubs_everything(self, spark):
        from coies_spark.ops import transcripts as tr

        rows = [("c", 0, "assistant", "see https://x.test/page now")]
        r = tr.scrub_pii_turns(self._tr(spark, rows), roles=None).collect()[0]
        assert "https://" not in r.text and r.n_url == 1

    def test_matches_doc_scrub_on_same_text(self, spark):
        from coies_spark.ops import textstats
        from coies_spark.ops import transcripts as tr

        text = "call +1 (555) 123-4567 or visit http://a.b/c x@y.zz 10.0.0.1"
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        doc_row = textstats.scrub_pii(docs).collect()[0]
        turn_row = tr.scrub_pii_turns(
            self._tr(spark, [("c", 0, "user", text)])
        ).collect()[0]
        assert turn_row.text == doc_row.scrubbed
        for c in ("n_url", "n_email", "n_ip", "n_phone"):
            assert getattr(turn_row, c) == getattr(doc_row, c)


class TestAgentLoops:
    SCHEMA = ("conv_id string, turn_idx int, role string, text string,"
              " tool string, ts timestamp")

    def _tr(self, spark, rows):
        return spark.createDataFrame(
            [(c, i, r, t, tool, None) for c, i, r, t, tool in rows],
            self.SCHEMA,
        )

    def test_period1_retry_loop(self, spark):
        from coies_spark.ops import transcripts as tr

        # 5 identical assistant turns -> period-1 chain of 4
        rows = [("c", i, "assistant", "retrying tool call", None)
                for i in range(5)]
        got = tr.agent_loops(self._tr(spark, rows)).collect()
        assert len(got) == 1
        r = got[0]
        assert (r.period, r.chain, r.loop_turns) == (1, 4, 5)

    def test_period2_oscillation_and_tiebreak(self, spark):
        from coies_spark.ops import transcripts as tr

        # A/B/A/B/A/B/A/B: period-2 chain of 6; period-1 never fires.
        # Pure period-1 loops must also report period 1, not their
        # trivial period-2 echo (chain tie -> smallest period).
        rows = [("c", i, "assistant", "state A" if i % 2 == 0
                 else "state B", None) for i in range(8)]
        r = tr.agent_loops(self._tr(spark, rows)).collect()[0]
        assert (r.period, r.chain, r.loop_turns) == (2, 6, 8)

    def test_role_qualified_digest(self, spark):
        from coies_spark.ops import transcripts as tr

        # same text but alternating ROLE: not a period-1 loop (role
        # is part of the turn identity); it IS a period-2 loop
        rows = [("c", i, "user" if i % 2 == 0 else "assistant",
                 "same words", None) for i in range(8)]
        r = tr.agent_loops(self._tr(spark, rows)).collect()[0]
        assert r.period == 2

    def test_min_chain_gate_and_no_loops(self, spark):
        from coies_spark.ops import transcripts as tr

        rows = [("c", i, "assistant", f"distinct {i}", None)
                for i in range(6)]
        assert tr.agent_loops(self._tr(spark, rows)).count() == 0
        # two repeats = chain 1 < min_chain 3
        rows2 = [("d", 0, "assistant", "x", None),
                 ("d", 1, "assistant", "x", None),
                 ("d", 2, "assistant", "y", None)]
        assert tr.agent_loops(self._tr(spark, rows2)).count() == 0
        # but min_chain=1 admits it
        assert tr.agent_loops(
            self._tr(spark, rows2), min_chain=1
        ).count() == 1

    def test_include_tool_splits_digest(self, spark):
        from coies_spark.ops import transcripts as tr

        # identical role+text, alternating tool: a period-1 loop
        # WITHOUT the tool in the digest, period-2 WITH it
        rows = [("c", i, "assistant", "calling", "a" if i % 2 == 0
                 else "b") for i in range(8)]
        df = self._tr(spark, rows)
        assert tr.agent_loops(df).collect()[0].period == 1
        assert tr.agent_loops(
            df, include_tool=True
        ).collect()[0].period == 2

    def test_rejects_bad_params(self, spark):
        from coies_spark.ops import transcripts as tr

        df = self._tr(spark, [("c", 0, "user", "x", None)])
        with pytest.raises(ValueError):
            tr.agent_loops(df, min_chain=0)
        with pytest.raises(ValueError):
            tr.agent_loops(df, max_period=0)


class TestAnnRecall:
    def _topk(self, spark, rows):
        return spark.createDataFrame(
            rows, "query_id long, target_id long, rank long"
        )

    def test_perfect_and_partial_recall(self, spark):
        from coies_spark.ops import similarity

        exact = self._topk(
            spark,
            [(0, t, r + 1) for r, t in enumerate([10, 11, 12])]
            + [(1, t, r + 1) for r, t in enumerate([20, 21, 22])],
        )
        # query 0: same set, different order -> 1.0; query 1: 1/3
        approx = self._topk(
            spark,
            [(0, 12, 1), (0, 10, 2), (0, 11, 3),
             (1, 20, 1), (1, 99, 2), (1, 98, 3)],
        )
        r = similarity.ann_recall(exact, approx, k=3).collect()[0]
        assert r.n_queries == 2 and r.k == 3
        assert r.mean_recall == round((1.0 + 1 / 3) / 2, 6)
        assert r.min_recall == round(1 / 3, 6)
        assert r.exact_queries == 1

    def test_k_prefix_only(self, spark):
        from coies_spark.ops import similarity

        # ranks beyond k are ignored on both sides
        exact = self._topk(spark, [(0, 1, 1), (0, 2, 2), (0, 3, 3)])
        approx = self._topk(spark, [(0, 1, 1), (0, 3, 2), (0, 2, 9)])
        r = similarity.ann_recall(exact, approx, k=2).collect()[0]
        assert r.mean_recall == 0.5  # {1,3} vs {1,2} -> 1/2

    def test_short_exact_list_normalizes(self, spark):
        from coies_spark.ops import similarity

        # ground truth has fewer than k rows (tiny bucket): recall
        # normalizes by the actual exact count, not k
        exact = self._topk(spark, [(0, 1, 1), (0, 2, 2)])
        approx = self._topk(spark, [(0, 1, 1), (0, 2, 2)])
        r = similarity.ann_recall(exact, approx, k=5).collect()[0]
        assert r.mean_recall == 1.0

    def test_rejects_bad_k(self, spark):
        from coies_spark.ops import similarity

        df = self._topk(spark, [(0, 1, 1)])
        with pytest.raises(ValueError):
            similarity.ann_recall(df, df, k=0)


class TestScrubAgentLoops:
    SCHEMA = ("conv_id string, turn_idx int, role string, text string,"
              " tool string, ts timestamp")

    def test_drops_looping_conv_keeps_clean_bytes(self, spark):
        from coies_spark.ops import transcripts as tr

        rows = (
            # looper: 5 identical turns
            [("loop", i, "assistant", "retry", None, None)
             for i in range(5)]
            # clean conversation, byte-preserved
            + [("ok", i, "user", f"turn {i}", None, None)
               for i in range(4)]
        )
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = tr.scrub_agent_loops(df).collect()
        assert {r.conv_id for r in out} == {"ok"}
        kept = sorted((r.turn_idx, r.text) for r in out)
        assert kept == [(i, f"turn {i}") for i in range(4)]

    def test_anti_join_plan(self, spark):
        from coies_spark.ops import transcripts as tr

        df = spark.createDataFrame(
            [("c", 0, "user", "x", None, None)], self.SCHEMA
        )
        plan = tr.scrub_agent_loops(df)._jdf.queryExecution().toString()
        assert "LeftAnti" in plan


class TestHardNegativePairs:
    def test_band_selection(self, spark):
        from coies_spark.ops import dedup

        # a/b near-identical (high jaccard), a/c share one rare
        # 3-shingle (low), d unrelated
        base = "alpha beta gamma delta epsilon zeta eta"
        docs = spark.createDataFrame(
            [(0, base), (1, base + " extra"),
             (2, "alpha beta gamma nothing else here at all"),
             (3, "totally different words everywhere")],
            "doc_id bigint, text string",
        )
        allp = {(r.doc_a, r.doc_b): r.jaccard for r in
                dedup.hard_negative_pairs(
                    docs, lo=0.01, hi=1.1).collect()}
        band = {(r.doc_a, r.doc_b) for r in
                dedup.hard_negative_pairs(
                    docs, lo=0.01, hi=0.5).collect()}
        assert (0, 1) in allp and allp[(0, 1)] > 0.5
        # the near-dup pair is excluded from the band; the weakly
        # similar pair survives
        assert (0, 1) not in band and (0, 2) in band
        assert all(0.01 <= allp[p] for p in band)

    def test_rejects_bad_band(self, spark):
        from coies_spark.ops import dedup

        docs = spark.createDataFrame([(0, "x")], "doc_id bigint, text string")
        with pytest.raises(ValueError):
            dedup.hard_negative_pairs(docs, lo=0.5, hi=0.5)


def test_agent_loops_randomized_parity(spark):
    """200 seeded random conversations, one Spark job, engine output
    compared against a direct pure-Python reimplementation of the
    contract (per-period lag runs, best chain, smallest-period tie)."""
    import random

    from coies_spark.ops import transcripts as tr

    rng = random.Random(20260818)
    rows, convs = [], {}
    for c in range(200):
        n = rng.randint(1, 14)
        # tiny alphabet so repeats and multi-period cycles are common
        seq = [(rng.choice(["user", "assistant"]), rng.choice("abc"))
               for _ in range(n)]
        convs[f"c{c}"] = seq
        rows += [(f"c{c}", i, r, t, None, None)
                 for i, (r, t) in enumerate(seq)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp")
    min_chain, max_period = 2, 3
    got = {r.conv_id: (r.period, r.chain, r.loop_turns) for r in
           tr.agent_loops(df, min_chain=min_chain,
                          max_period=max_period).collect()}

    def best(seq):
        digests = [(r, t) for r, t in seq]
        cands = []
        for p in range(1, max_period + 1):
            rep = [1 if i >= p and digests[i] == digests[i - p] else 0
                   for i in range(len(digests))]
            chain = cur = 0
            for x in rep:
                cur = cur + 1 if x else 0
                chain = max(chain, cur)
            if chain >= min_chain:
                cands.append((chain, -p))
        if not cands:
            return None
        chain, np_ = max(cands)
        return (-np_, chain, chain - np_)

    want = {c: b for c, seq in convs.items()
            if (b := best(seq)) is not None}
    assert got == want and len(want) > 20


class TestCurationReport:
    def test_funnel_sums_to_corpus_and_kept_matches_pass(self, spark):
        from coies_spark.ops import curate

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        rep = curate.curation_report(docs).collect()
        # every doc lands in exactly one stage
        assert sum(r.n_docs for r in rep) == docs.count()
        stages = {r.stage for r in rep}
        assert stages <= {"quality_fail", "repetition_fail",
                          "dedup_drop", "kept"}
        # the funnel's kept rows ARE curate_corpus's output
        # (pre-sampling), per language
        kept = {r.lang: r.n_docs for r in rep if r.stage == "kept"}
        passed = {r.lang: r.n for r in
                  curate.curate_corpus(docs).groupBy("lang")
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
        assert kept == passed

    def test_first_failure_attribution(self, spark):
        from coies_spark.ops import curate

        # a doc failing BOTH gates counts once, as quality_fail
        bad = " ".join(["spam"] * 50)  # repetitive AND low quality
        docs = spark.createDataFrame(
            [(0, bad, "en", "s")],
            "doc_id bigint, text string, lang string, source string",
        )
        [r] = curate.curation_report(docs).collect()
        assert (r.stage, r.n_docs) == ("quality_fail", 1)


class TestCorpusDiff:
    def test_statuses_and_null_text_semantics(self, spark):
        from coies_spark.ops import curate

        old = spark.createDataFrame(
            [(1, "same"), (2, "will change"), (3, "will vanish"),
             (4, None), (5, None)],
            "doc_id bigint, text string",
        )
        new = spark.createDataFrame(
            [(1, "same"), (2, "changed"), (6, "brand new"),
             (4, None), (5, "text now")],
            "doc_id bigint, text string",
        )
        got = {r.doc_id: r.status
               for r in curate.corpus_diff(old, new).collect()}
        # 1 unchanged (absent), 4 NULL==NULL unchanged (absent)
        assert got == {2: "changed", 3: "removed", 6: "added",
                       5: "changed"}

    def test_identical_snapshots_emit_nothing(self, spark):
        from coies_spark.ops import curate

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")
        assert curate.corpus_diff(docs, docs).count() == 0


class TestSourceStats:
    def test_rates_partition_and_keep_matches_pass(self, spark):
        from coies_spark.ops import curate

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        rows = curate.source_stats(docs).collect()
        # one row per source, covering every doc
        assert sum(r.n_docs for r in rows) == docs.count()
        for r in rows:
            # first-failure attribution: the four rates partition 1.0
            total = (r.quality_fail_rate + r.repetition_fail_rate
                     + r.dedup_drop_rate + r.keep_rate)
            assert abs(total - 1.0) < 1e-4, (r.source, total)
        # per-source kept counts ARE curate_corpus's output
        # (pre-sampling) — the gauge and the pass share one definition
        kept = {r.source: round(r.keep_rate * r.n_docs)
                for r in rows}
        passed = {r.source: r.n for r in
                  curate.curate_corpus(docs).groupBy("source")
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
        assert {s: n for s, n in kept.items() if n} == passed

    def test_cross_source_syndication_shows_as_dedup_drop(self, spark):
        from coies_spark.ops import curate

        # feed B restates feed A's (clean) doc: global survivorship
        # keeps A's min-doc_id copy, B shows a 100% dedup_drop_rate
        good = ("the quick brown fox jumps over the lazy dog and then "
                "walks along the river bank toward a quiet village "
                "where markets open early and traders exchange news")
        docs = spark.createDataFrame(
            [(0, good, "en", "feedA"), (1, good, "en", "feedB")],
            "doc_id bigint, text string, lang string, source string",
        )
        got = {r.source: (r.dedup_drop_rate, r.keep_rate)
               for r in curate.source_stats(docs).collect()}
        assert got == {"feedA": (0.0, 1.0), "feedB": (1.0, 0.0)}


def test_agent_loops_null_text_is_a_loop(spark):
    from coies_spark.ops import transcripts as tr

    # NULL-text turns hash as empty strings (shared turn_digest_col):
    # four identical NULL turns ARE a period-1 loop, not invisible
    rows = [("c", i, "assistant", None, None, None) for i in range(4)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp")
    [r] = tr.agent_loops(df).collect()
    assert (r.period, r.chain) == (1, 3)


def test_winnow_fingerprints_rejects_over_cap_docs(spark):
    """Documents beyond the 2^20-shingle key-packing cap must raise,
    not silently corrupt fp_digest (the key arithmetic underflows the
    position field past that point)."""
    import pytest as _pytest

    n_tokens = (1 << 20) + 8
    docs = spark.createDataFrame(
        [(0, "x " * n_tokens)], "doc_id bigint, text string"
    )
    with _pytest.raises(Exception, match="exceeds.*shingles"):
        textstats.winnow_fingerprints(docs).collect()


class TestNormalizeText:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_nfc_composes_and_flags(self, spark):
        decomposed = "café time"        # e + combining acute
        composed = "café time"           # precomposed é
        docs = self._docs(spark, [(0, decomposed), (1, composed),
                                  (2, "plain text")])
        got = {r.doc_id: r for r in
               textstats.normalize_text(docs).collect()}
        assert got[0].text_norm == composed and got[0].changed
        # already-NFC input is a fixpoint
        assert got[1].text_norm == composed and not got[1].changed
        assert not got[2].changed
        # NFC shortens the decomposed form by one code point
        assert got[0].n_after == got[0].n_before - 1

    def test_control_strip_and_whitespace_collapse(self, spark):
        docs = self._docs(spark, [
            (0, "a\x01b\x07c"),
            (1, "  spaced\t\tout\n\nwords  "),
        ])
        got = {r.doc_id: r for r in
               textstats.normalize_text(docs).collect()}
        assert got[0].text_norm == "abc" and got[0].changed
        assert got[1].text_norm == "spaced out words"

    def test_idempotent(self, spark):
        docs = self._docs(spark, [(0, "x́  y\x02 z")])
        once = textstats.normalize_text(docs).collect()[0].text_norm
        twice = textstats.normalize_text(
            self._docs(spark, [(0, once)])).collect()[0]
        assert twice.text_norm == once and not twice.changed


class TestCharEntropy:
    def test_hand_computed_and_edges(self, spark):
        import math

        docs = spark.createDataFrame(
            [(0, "aabb"), (1, "aaaa"), (2, ""), (3, "abcd"),
             (4, "AaBb")],
            "doc_id bigint, text string",
        )
        got = {r.doc_id: r for r in
               textstats.char_entropy(docs).collect()}
        assert (got[0].n_chars, got[0].n_distinct_chars) == (4, 2)
        assert got[0].entropy == 1.0          # uniform over {a, b}
        assert got[1].entropy == 0.0          # constant string
        assert got[2].n_chars == 0 and got[2].entropy is None
        assert got[3].entropy == 2.0          # uniform over 4 chars
        # case-folded before measuring
        assert got[4].entropy == 1.0
        # natural-ish text sits between the degenerate extremes
        [r] = textstats.char_entropy(spark.createDataFrame(
            [(9, "the quick brown fox jumps over the lazy dog")],
            "doc_id bigint, text string")).collect()
        assert 3.5 < r.entropy < math.log2(r.n_distinct_chars) + 1e-9

    def test_zero_shuffle_plan(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet")
        plan = textstats.char_entropy(docs)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "Exchange" not in plan


def test_minhash_estimate_error_gauge(spark):
    from coies_spark.ops import dedup

    # near-identical pair: estimate and exact both high, small error;
    # the gauge reports the candidate-pair count and bounded stats
    base = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu nu xi omicron pi rho sigma tau")
    docs = spark.createDataFrame(
        [(0, base), (1, base + " upsilon"),
         (2, "totally different words here with nothing shared")],
        "doc_id bigint, text string",
    )
    [r] = dedup.minhash_estimate_error(docs).collect()
    assert r.n_pairs >= 1
    assert 0.0 <= r.mae <= 1.0 and r.max_err <= 1.0
    assert r.mean_exact > 0.5  # the planted near-dup dominates
    # estimator sanity: mean estimate within 0.5 of mean exact at
    # 8 hashes on a high-jaccard pair set
    assert abs(r.mean_est - r.mean_exact) <= 0.5


class TestCosinePairs:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_identical_docs_score_one(self, spark):
        d = self._docs(spark, [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "zeta eta theta iota"),
        ])
        got = {(r.doc_a, r.doc_b): r.cosine
               for r in dedup.cosine_pairs(d, threshold=0.1).collect()}
        assert got == {(1, 2): 1.0}

    def test_count_weighting_differs_from_jaccard(self, spark):
        # same shingle SET, different multiplicities: jaccard says
        # 1.0, count-vector cosine must be < 1
        d = self._docs(spark, [
            (1, "a b c a b c"),
            (2, "a b c a b c a b c a b c"),
        ])
        cos = {(r.doc_a, r.doc_b): r.cosine
               for r in dedup.cosine_pairs(
                   d, threshold=0.1).collect()}[(1, 2)]
        jac = {(r.doc_a, r.doc_b): r.jaccard
               for r in dedup.jaccard_pairs(
                   d, threshold=0.1, max_df=10).collect()}[(1, 2)]
        assert jac == 1.0
        assert 0.9 < cos < 1.0

    def test_df_cap_symmetric(self, spark):
        # a shingle present in EVERY doc is dropped from numerator
        # and denominator alike: docs identical except for capped
        # shingles still score on the surviving vocabulary only
        common = "x y z"  # one 3-shingle shared by all docs
        d = self._docs(spark, [
            (i, f"{common} tail{i} tail{i} tail{i}") for i in range(4)
        ])
        got = dedup.cosine_pairs(d, max_df=2, threshold=0.0).collect()
        # the only sub-cap shingles are per-doc unique tails -> no
        # pair shares any surviving shingle
        assert got == []

    def test_unigram_mode(self, spark):
        d = self._docs(spark, [(1, "a a b"), (2, "a b b")])
        got = {(r.doc_a, r.doc_b): r.cosine
               for r in dedup.cosine_pairs(
                   d, n=1, threshold=0.0).collect()}
        # dot = 2*1 + 1*2 = 4; norms = sqrt(5) each -> 0.8
        assert got == {(1, 2): 0.8}


class TestRrfFuse:
    def _route(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, rank long")

    def test_two_route_fusion_hand_computed(self, spark):
        r0 = self._route(spark, [(10, 1), (20, 2)])
        r1 = self._route(spark, [(20, 1), (30, 2)])
        got = {r.doc_id: (r.score, r.n_routes, r.rank)
               for r in textstats.rrf_fuse([r0, r1], k0=60).collect()}
        # doc 20: 1/62 + 1/61 ; docs 10/30: 1/61 and 1/62
        assert got[20] == (round(1 / 62 + 1 / 61, 6), 2, 1)
        assert got[10] == (round(1 / 61, 6), 1, 2)
        assert got[30] == (round(1 / 62, 6), 1, 3)

    def test_tie_breaks_by_doc_id(self, spark):
        r0 = self._route(spark, [(5, 1), (3, 1)])  # impossible ranks
        got = [r.doc_id for r in textstats.rrf_fuse([r0]).collect()]
        assert got == [3, 5]

    def test_topk_and_single_route(self, spark):
        r0 = self._route(spark, [(i, i) for i in range(1, 30)])
        got = textstats.rrf_fuse([r0], topk=10).collect()
        assert len(got) == 10
        assert [r.rank for r in got] == list(range(1, 11))

    def test_empty_routes_raise(self, spark):
        with pytest.raises(ValueError):
            textstats.rrf_fuse([])


class TestTextTiling:
    def _t(self, spark, rows):
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string"
        )

    def test_topic_shift_is_boundary(self, spark):
        from coies_spark.ops.transcripts import text_tiling

        # turns 0-2 share vocabulary, turns 3-5 share a different one:
        # the gap after turn 2 is the valley
        t = self._t(spark, [
            ("c", 0, "spark table scan plan"),
            ("c", 1, "table scan cost plan"),
            ("c", 2, "scan plan spark cost"),
            ("c", 3, "lunch pizza menu order"),
            ("c", 4, "pizza order menu price"),
            ("c", 5, "menu price lunch order"),
        ])
        got = {r.turn_idx: r for r in
               text_tiling(t, w=2, threshold=0.2).collect()}
        assert got[2].is_boundary
        assert got[2].sim_next == 0.0
        # segment ids: 1 through the first topic, 2 after the valley
        assert [got[i].segment_id for i in range(6)] == [1, 1, 1, 2, 2, 2]
        # edge gaps with PARTIAL windows are unscored (Hearst's rule):
        # turn 0's left window and turn 4/5's right windows are short
        assert got[0].sim_next is None and not got[0].is_boundary
        assert got[4].sim_next is None
        assert got[5].sim_next is None and not got[5].is_boundary

    def test_no_boundary_in_homogeneous_conv(self, spark):
        from coies_spark.ops.transcripts import text_tiling

        t = self._t(spark, [
            ("c", i, "spark table scan plan") for i in range(5)
        ])
        got = text_tiling(t, w=2, threshold=0.2).collect()
        assert all(not r.is_boundary for r in got)
        assert all(r.segment_id == 1 for r in got)

    def test_strict_valley_rule(self, spark):
        from coies_spark.ops.transcripts import text_tiling

        # similarity dips equally across two consecutive gaps: neither
        # is a STRICT valley against the other -> threshold alone must
        # not fire
        t = self._t(spark, [
            ("c", 0, "a b"), ("c", 1, "a b"),
            ("c", 2, "x y"), ("c", 3, "x y"),
        ])
        got = {r.turn_idx: r for r in
               text_tiling(t, w=1, threshold=0.5).collect()}
        # gaps: 0->1 sim 1.0, 1->2 sim 0.0, 2->3 sim 1.0
        assert got[1].is_boundary and not got[0].is_boundary
        assert not got[2].is_boundary

    def test_w_validation_and_single_exchange(self, spark):
        from coies_spark.ops.transcripts import text_tiling

        t = self._t(spark, [("c", 0, "a")])
        with pytest.raises(ValueError):
            text_tiling(t, w=0)
        plan = (
            text_tiling(t)._jdf.queryExecution().executedPlan().toString()
        )
        # every window keys on conv_id: one partitioning serves all.
        # Count OCCURRENCES, not distinct line text — two identical
        # Exchange operators would collapse in a set and hide the
        # regression this exists to catch
        n_shuffles = plan.count("Exchange hashpartitioning")
        assert n_shuffles <= 1


class TestCollocations:
    def test_hand_computed_pmi(self, spark):
        from coies_spark.ops.textstats import collocations
        import math

        # corpus: "a b" x3 and "c d" x1 -> N=8 tokens, B=4 bigrams
        docs = spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, "a b"), (4, "c d")],
            "doc_id long, text string",
        )
        got = {(r.a, r.b): r for r in
               collocations(docs, min_count=1, topk=10).collect()}
        r = got[("a", "b")]
        assert (r.n_ab, r.n_a, r.n_b) == (3, 3, 3)
        assert r.pmi == round(math.log(3 * 8 * 8 / (4 * 3 * 3)), 6)
        assert got[("c", "d")].pmi == round(
            math.log(1 * 8 * 8 / (4 * 1 * 1)), 6
        )
        # rarer pair has the higher PMI (the hapax spike min_count
        # exists to suppress)
        assert got[("c", "d")].rank == 1

    def test_min_count_gate_and_validation(self, spark):
        from coies_spark.ops.textstats import collocations

        docs = spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, "c d")],
            "doc_id long, text string",
        )
        got = [(r.a, r.b) for r in
               collocations(docs, min_count=2, topk=10).collect()]
        assert got == [("a", "b")]
        with pytest.raises(ValueError):
            collocations(docs, min_count=0)


class TestNewOpsRandomizedParity:
    """Seeded randomized parity vs pure-Python references (the
    agent_loops parity convention): the engine must agree with a
    direct dictionary implementation on arbitrary inputs, not just
    the hand-built cases."""

    def test_cosine_pairs_matches_pure_python(self, spark):
        import math
        import random
        from collections import Counter

        rng = random.Random(20260818)
        vocab = [f"w{i}" for i in range(12)]
        docs = [
            (i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(3, 30))))
            for i in range(60)
        ]

        def shingles(text):
            toks = text.split()
            n = max(len(toks) - 2, 1)
            return [" ".join(toks[i:i + 3]) for i in range(n)]

        tf = {d: Counter(shingles(t)) for d, t in docs}
        df = Counter(s for c in tf.values() for s in c)
        keep = {s for s, n in df.items() if n <= 10}
        capped = {d: {s: n for s, n in c.items() if s in keep}
                  for d, c in tf.items()}
        expected = {}
        ids = sorted(capped)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                dot = sum(capped[a][s] * capped[b].get(s, 0)
                          for s in capped[a])
                if not dot:
                    continue
                na2 = sum(v * v for v in capped[a].values())
                nb2 = sum(v * v for v in capped[b].values())
                cos = round(dot / math.sqrt(float(na2) * float(nb2)), 6)
                if cos >= 0.1:
                    expected[(a, b)] = cos

        sdf = spark.createDataFrame(docs, "doc_id long, text string")
        got = {(r.doc_a, r.doc_b): r.cosine
               for r in dedup.cosine_pairs(
                   sdf, max_df=10, threshold=0.1).collect()}
        assert got == expected

    def test_neighbor_jaccard_matches_pure_python(self, spark):
        import random

        rng = random.Random(42)
        nodes = [f"n{i}" for i in range(25)]
        edges = {(rng.choice(nodes), rng.choice(nodes))
                 for _ in range(80)}
        edges = [(a, b) for a, b in edges if a != b]

        nbr = {}
        for a, b in edges:
            nbr.setdefault(a, set()).add(b)
            nbr.setdefault(b, set()).add(a)
        kept = {u for u, s in nbr.items() if len(s) <= 5}
        g = {u: {v for v in s if v in kept}
             for u, s in nbr.items() if u in kept}
        g = {u: s for u, s in g.items() if s}
        expected = {}
        us = sorted(g)
        for i, a in enumerate(us):
            for b in us[i + 1:]:
                common = len(g[a] & g[b])
                if common >= 1:
                    expected[(a, b)] = (
                        common,
                        round(common / (len(g[a]) + len(g[b]) - common), 6),
                    )

        from coies_spark.operators.graph import neighbor_jaccard

        sdf = spark.createDataFrame(edges, "src string, dst string")
        got = {(r.a, r.b): (r.common, r.jaccard)
               for r in neighbor_jaccard(sdf, max_degree=5).collect()}
        assert got == expected


class TestSlidingChunks:
    def test_hand_computed_membership_and_overlap(self, spark):
        from coies_spark.ops import transcripts as tr

        ten = " ".join(f"t{i}" for i in range(10))  # 10 tokens
        rows = [("c", i, "user", ten, None, None) for i in range(3)]
        rows.append(("c", 3, "user", "", None, None))  # 0 tokens
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string,"
            " text string, tool string, ts timestamp")
        out = tr.sliding_chunks(df, window_tokens=16, stride_tokens=8)
        got = {r.chunk_id: (r.first_turn, r.last_turn, r.n_turns,
                            r.n_tokens) for r in out.collect()}
        # offsets 0/10/20; windows [0,16) [8,24) [16,32) [24,40):
        # c0={t0,t1} c1={t0,t1,t2} c2={t1,t2} c3={t2}; empty turn
        # joins nothing
        assert got == {0: (0, 1, 2, 20), 1: (0, 2, 3, 30),
                       2: (1, 2, 2, 20), 3: (2, 2, 1, 10)}
        # boundary turns shared by adjacent chunks (the RAG property):
        # chunk 1 holds 3 turns, each contributing one "t0" token
        text = {r.chunk_id: r.chunk_text for r in out.collect()}
        assert text[1].count("t0") == 3
        assert text[0] == ten + " " + ten

    def test_param_guard(self, spark):
        import pytest

        from coies_spark.ops import transcripts as tr

        df = spark.createDataFrame(
            [("c", 0, "user", "x", None, None)],
            "conv_id string, turn_idx int, role string, text string,"
            " tool string, ts timestamp")
        with pytest.raises(ValueError):
            tr.sliding_chunks(df, window_tokens=8, stride_tokens=16)
        with pytest.raises(ValueError):
            tr.sliding_chunks(df, window_tokens=8, stride_tokens=0)

    def test_stride_equals_window_is_disjoint_packing(self, spark):
        from coies_spark.ops import transcripts as tr

        ten = " ".join(f"t{i}" for i in range(10))
        rows = [("c", i, "user", ten, None, None) for i in range(4)]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string,"
            " text string, tool string, ts timestamp")
        out = tr.sliding_chunks(df, window_tokens=20, stride_tokens=20)
        # stride == window -> every turn in exactly one chunk
        assert sum(r.n_turns for r in out.collect()) == 4


class TestSeventhBatchEmptyInputs:
    """Empty/degenerate inputs through the seventh/eighth-batch ops:
    every operator must return an empty (or correctly-degenerate)
    frame, never raise — the behavior incremental pipelines hit on
    an empty partition or a quiet ingest window."""

    def test_empty_frames(self, spark):
        from coies_spark.operators.graph import (
            adamic_adar, link_prediction_mrr, personalized_pagerank,
        )
        from coies_spark.ops import textstats
        from coies_spark.ops.dedup import oph_signatures_wide, pair_recall
        from coies_spark.ops.kg import bgp_query, triple_diff
        from coies_spark.ops.linkage import em_linkage
        from coies_spark.ops.maintenance import compaction_plan, zorder_key
        from coies_spark.ops.sampling import mixture_rates, weighted_sample
        from coies_spark.ops.transcripts import (
            tool_sequence_score, training_pairs,
        )

        docs = spark.createDataFrame(
            [], "doc_id long, text string, lang string, n_chars long"
        )
        edges = spark.createDataFrame([], "src string, dst string")
        tx = spark.createDataFrame(
            [], "conv_id string, turn_idx int, role string,"
                " text string, tool string, ts long"
        )
        beliefs = spark.createDataFrame(
            [], "subj string, pred string, obj string, confidence double"
        )
        manifest = spark.createDataFrame(
            [], "partition string, path string, bytes long"
        )
        assert adamic_adar(edges).collect() == []
        seeds = spark.createDataFrame([("s",)], ["node"])
        # an edgeless graph still reports the seed's restart share
        [r] = personalized_pagerank(edges, seeds).collect()
        assert r.node == "s" and r.ppr > 0
        [m] = link_prediction_mrr(edges).collect()
        assert m.n_holdout == 0 and m.mrr is None
        assert oph_signatures_wide(docs).collect() == []
        [pr] = pair_recall(
            spark.createDataFrame([], "doc_a long, doc_b long"),
            spark.createDataFrame([], "doc_a long, doc_b long"),
        ).collect()
        assert pr.n_true == 0 and pr.recall is None
        assert bgp_query(beliefs, [("?s", "p", "?o")]).collect() == []
        assert triple_diff(beliefs, beliefs).collect() == []
        # EM on zero pairs: the pattern frame is empty, sums NULL —
        # parameters clamp to the floor instead of erroring
        out = em_linkage(
            spark.createDataFrame([], "f1 int, f2 int"), ["f1", "f2"]
        ).collect()
        assert len(out) == 2
        assert compaction_plan(manifest, 100).collect() == []
        assert zorder_key(docs.select("doc_id", "n_chars"),
                          ["doc_id", "n_chars"]).collect() == []
        assert mixture_rates(docs, {"en": 1.0}, 100,
                             n_tokens_col="n_chars").collect() == []
        assert weighted_sample(docs, 3, "n_chars").collect() == []
        assert training_pairs(tx).collect() == []
        assert tool_sequence_score(tx).collect() == []
        assert textstats.token_drift(docs, docs).collect() == []
