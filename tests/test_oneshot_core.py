"""Flagship extraction semantics: oracle ↔ vectorized-kernel parity.

The dict-based oracle mirrors the reference's control flow
(oneshot_test.py:217-263); the numpy kernel is the production path the
Spark pipeline runs per conversation.  Both must emit identical triples
(BASELINE.json: P/R >= 0.95; we hold them to 1.0 on fixtures).
"""

from coies_spark.core.metrics import triple_prf
from coies_spark.core.oneshot import (
    detect_doc,
    emissions_to_triples,
    oracle_extract_doc,
)


def test_example_artifacts_shape(artifacts):
    preds = [s.pred for s in artifacts.seeds]
    assert preds == ["comp", "date", "date", "item", "item"]
    assert all(s.context_vecs.ndim == 2 for s in artifacts.seeds)
    assert ("acme", "holdings") in {s.tokens for s in artifacts.seeds}


def test_kernel_matches_oracle_on_corpus(corpus, artifacts):
    oracle_triples, kernel_triples = [], []
    for doc in corpus.test_docs + corpus.plain_docs[:5]:
        oracle_triples += emissions_to_triples(
            doc.conv_id, oracle_extract_doc(doc.raw_text, doc.tagged_text, artifacts)
        )
        kernel_triples += emissions_to_triples(
            doc.conv_id, detect_doc(doc.raw_text, doc.tagged_text, artifacts)
        )
    assert oracle_triples, "fixture must produce extractions"
    m = triple_prf(kernel_triples, oracle_triples)
    assert m["precision"] >= 0.95 and m["recall"] >= 0.95, m


def test_extractions_hit_gold_on_same_surface_docs(corpus, artifacts):
    """Docs reusing the example's surfaces must be found (the findable
    subset under frozen hash embeddings)."""
    gold = dict()
    for conv_id, pred, obj in corpus.gold_triples():
        gold.setdefault(conv_id, set()).add((pred, obj))
    hits = total = 0
    for doc in corpus.test_docs:
        got = {
            (e.pred, " ".join(e.gram))
            for e in detect_doc(doc.raw_text, doc.tagged_text, artifacts)
        }
        want = {
            (p, o) for p, o in gold.get(doc.conv_id, set())
            if (p, o) in {("comp", "acme holdings"), ("date", "2000"),
                          ("date", "2001"), ("item", "revenues"),
                          ("item", "profits")}
        }
        hits += len(got & want)
        total += len(want)
    assert total > 0
    assert hits / total >= 0.9, (hits, total)


def test_kernel_deterministic(corpus, artifacts):
    doc = corpus.test_docs[0]
    a = detect_doc(doc.raw_text, doc.tagged_text, artifacts)
    b = detect_doc(doc.raw_text, doc.tagged_text, artifacts)
    assert [(e.pred, e.gram, round(e.score, 12)) for e in a] == [
        (e.pred, e.gram, round(e.score, 12)) for e in b
    ]


def test_untagged_doc_uses_raw_for_context(corpus, artifacts):
    # production path: no tagged twin → context_text defaults to raw
    doc = corpus.test_docs[0]
    got = detect_doc(doc.raw_text, None, artifacts)
    ref = detect_doc(doc.raw_text, doc.raw_text, artifacts)
    assert [(e.pred, e.gram) for e in got] == [(e.pred, e.gram) for e in ref]


class TestGramModelSlot:
    """Two-model setting (reference flagship OneShotTestWVSumWVPhraseBi:
    raw-corpus model for contexts, phrased-corpus model for grams)."""

    def test_mapped_embedding_phrase_fallback_is_mean_of_parts(self):
        import numpy as np

        from coies_spark.core.embed import MappedEmbedding

        m = MappedEmbedding(
            {"alpha": [1.0, 0.0], "beta": [0.0, 1.0]}, dim=2
        )
        got = m["alpha_beta"]
        assert np.allclose(got, [0.5, 0.5])  # mean of the known parts
        # trained phrase tokens take precedence over the fallback
        m2 = MappedEmbedding(
            {"alpha": [1.0, 0.0], "beta": [0.0, 1.0], "alpha_beta": [9.0, 9.0]},
            dim=2,
        )
        assert np.allclose(m2["alpha_beta"], [9.0, 9.0])

    def test_gram_emb_feeds_grams_and_kernels_agree(self, corpus):
        import numpy as np

        from coies_spark.core.embed import HashEmbedding
        from coies_spark.core.oneshot import (
            build_example_artifacts,
            detect_doc,
            emissions_to_triples,
            oracle_extract_doc,
        )
        from coies_spark.data import synth
        from tests.conftest import FIXTURE_CONFIG

        sentences = synth.corpus_sentences(corpus)
        emb = HashEmbedding(FIXTURE_CONFIG.dim, "ctx-model")
        gram_emb = HashEmbedding(FIXTURE_CONFIG.dim, "gram-model")
        one = build_example_artifacts(
            corpus.example.tagged_text, sentences, FIXTURE_CONFIG, emb=emb
        )
        two = build_example_artifacts(
            corpus.example.tagged_text, sentences, FIXTURE_CONFIG,
            emb=emb, gram_emb=gram_emb,
        )
        # seed gram vectors come from the gram model (multi-token comp
        # seed differs between the two settings)
        diffs = [
            not np.allclose(a.gram_vec, b.gram_vec)
            for a, b in zip(one.seeds, two.seeds)
        ]
        assert any(diffs)
        # context vectors are untouched by the gram model
        for a, b in zip(one.seeds, two.seeds):
            assert np.allclose(a.context_vecs, b.context_vecs)
        # oracle and Arrow kernels still agree under the two-model setting
        for doc in corpus.test_docs[:5]:
            want = set(emissions_to_triples(
                doc.conv_id, oracle_extract_doc(doc.raw_text, doc.tagged_text, two)
            ))
            got = set(emissions_to_triples(
                doc.conv_id, detect_doc(doc.raw_text, doc.tagged_text, two)
            ))
            assert want == got
