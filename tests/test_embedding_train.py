"""Distributed Word2Vec training slot: trains on synth transcripts,
plugs into the extraction kernel via MappedEmbedding."""

from __future__ import annotations

import pytest

from coies_spark.core.embed import MappedEmbedding
from coies_spark.core.oneshot import build_example_artifacts, detect_doc
from coies_spark.data import synth
from coies_spark.ops import embedding_train
from tests.conftest import FIXTURE_CONFIG

pytestmark = pytest.mark.spark


def test_word2vec_trains_and_plugs_in(spark, corpus):
    transcripts = spark.createDataFrame(
        synth.transcripts_frame(corpus.all_docs, use_raw=True)
    )
    sentences = embedding_train.sentence_frame(transcripts)
    vectors = embedding_train.train_word2vec(sentences, dim=FIXTURE_CONFIG.dim)
    rows = vectors.collect()
    assert len(rows) > 50  # vocab trained
    assert all(len(r.vector) == FIXTURE_CONFIG.dim for r in rows[:5])

    mapping = embedding_train.vectors_to_mapping(vectors)
    emb = MappedEmbedding(mapping, dim=FIXTURE_CONFIG.dim)
    # in-vocab lookup returns the trained vector
    tok = rows[0].token
    assert emb[tok].tolist() == pytest.approx(mapping[tok], abs=1e-6)
    # OOV falls back deterministically
    a = emb["zzz-never-seen"]
    b = MappedEmbedding(mapping, dim=FIXTURE_CONFIG.dim)["zzz-never-seen"]
    assert (a == b).all()

    # the kernel accepts the trained table end-to-end
    art = build_example_artifacts(
        corpus.example.tagged_text,
        synth.corpus_sentences(corpus),
        FIXTURE_CONFIG,
        emb=emb,
    )
    doc = corpus.test_docs[0]
    out = detect_doc(doc.raw_text, doc.tagged_text, art)
    assert isinstance(out, list)  # runs clean; emission set is model-dependent


class TestCbow:
    def _sentences(self, spark):
        # two artificial topics: tokens within a topic co-occur, across
        # topics never — CBOW must separate them
        import random

        rnd = random.Random(3)
        a_vocab = [f"alpha{i}" for i in range(8)]
        b_vocab = [f"beta{i}" for i in range(8)]
        rows = []
        for _ in range(300):
            v = a_vocab if rnd.random() < 0.5 else b_vocab
            rows.append(([rnd.choice(v) for _ in range(8)],))
        return spark.createDataFrame(rows, "sentence array<string>")

    def test_topics_separate_and_deterministic(self, spark):
        import numpy as np

        from coies_spark.ops.cbow import train_cbow

        sent = self._sentences(spark)
        v1 = {
            r.token: np.array(r.vector)
            for r in train_cbow(
                sent, dim=16, epochs=2, n_parts=2, min_count=1
            ).collect()
        }
        v2 = {
            r.token: np.array(r.vector)
            for r in train_cbow(
                sent, dim=16, epochs=2, n_parts=2, min_count=1
            ).collect()
        }
        assert set(v1) == set(v2) and len(v1) == 16
        for t in v1:
            assert np.allclose(v1[t], v2[t]), "training must be deterministic"

        def cos(x, y):
            return float(
                x @ y / (np.linalg.norm(x) * np.linalg.norm(y))
            )

        within = np.mean(
            [cos(v1["alpha0"], v1[f"alpha{i}"]) for i in range(1, 8)]
        )
        across = np.mean(
            [cos(v1["alpha0"], v1[f"beta{i}"]) for i in range(8)]
        )
        assert within > across + 0.2, (within, across)

    def test_mean_combine_and_sync_rounds_also_separate(self, spark):
        import numpy as np

        from coies_spark.ops.cbow import train_cbow

        v = {
            r.token: np.array(r.vector)
            for r in train_cbow(
                self._sentences(spark),
                dim=16,
                epochs=4,
                n_parts=2,
                min_count=1,
                combine="mean",
                sync_per_epoch=2,
            ).collect()
        }

        def cos(x, y):
            return float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y)))

        within = np.mean([cos(v["alpha0"], v[f"alpha{i}"]) for i in range(1, 8)])
        across = np.mean([cos(v["alpha0"], v[f"beta{i}"]) for i in range(8)])
        assert within > across + 0.2, (within, across)

    def test_max_vocab_caps_to_top_frequency(self, spark):
        from coies_spark.ops.cbow import train_cbow

        rows = [
            (["hot", "hot", "hot", "warm", "warm", "cold"],),
        ] * 20 + [(["rare1", "rare2", "hot", "warm"],)] * 2
        sent = spark.createDataFrame(rows, "sentence array<string>")
        vocab = {
            r.token
            for r in train_cbow(
                sent, dim=8, epochs=1, n_parts=2, max_vocab=3
            ).collect()
        }
        assert vocab == {"hot", "warm", "cold"}  # top-3 by count

    def test_degenerate_inputs_guarded(self, spark):
        import pytest as _pytest

        from coies_spark.ops.cbow import train_cbow

        sent = spark.createDataFrame(
            [(["a", "b", "a", "b"],)] * 5, "sentence array<string>"
        )
        # sample=0 disables subsampling instead of dividing by zero
        rows = train_cbow(sent, dim=4, epochs=1, n_parts=1, sample=0).collect()
        assert len(rows) == 2
        # empty post-min_count vocabulary raises a clear error
        with _pytest.raises(ValueError, match="vocabulary is empty"):
            train_cbow(sent, dim=4, epochs=1, n_parts=1, min_count=100)
        with _pytest.raises(ValueError, match="combine"):
            train_cbow(sent, dim=4, epochs=1, n_parts=1, combine="median")

    def test_batch_kernel_learns_and_is_deterministic(self, spark):
        import numpy as np

        from coies_spark.ops.cbow import train_cbow

        sent = self._sentences(spark)
        v1 = {
            r.token: np.array(r.vector)
            for r in train_cbow(
                sent, dim=16, epochs=2, n_parts=2, min_count=1,
                kernel="batch",
            ).collect()
        }
        v2 = {
            r.token: np.array(r.vector)
            for r in train_cbow(
                sent, dim=16, epochs=2, n_parts=2, min_count=1,
                kernel="batch",
            ).collect()
        }
        for t in v1:
            assert np.allclose(v1[t], v2[t])

        def cos(x, y):
            return float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y)))

        within = np.mean([cos(v1["alpha0"], v1[f"alpha{i}"]) for i in range(1, 8)])
        across = np.mean([cos(v1["alpha0"], v1[f"beta{i}"]) for i in range(8)])
        assert within > across + 0.2, (within, across)

    def test_batch_kernel_tracks_exact_kernel(self, spark):
        """Where no rows collide within a sentence (large V, one
        2-token sentence) the kernels agree bitwise; on a realistic
        corpus (collisions → within-sentence interleaving differs) the
        weight DELTAS stay near-perfectly correlated — the documented
        mini-batch approximation contract."""
        import numpy as np

        from coies_spark.ops.cbow import (
            NEG_TABLE_POWER,
            _train_partition,
            _train_partition_batch,
        )

        rng = np.random.RandomState(0)
        V, d = 500, 16
        freq = rng.randint(1, 100, V).astype(np.float64)
        pf = freq**NEG_TABLE_POWER
        neg_cum = np.cumsum(pf / pf.sum())
        neg_cum[-1] = 1.0
        keep = np.ones(V)
        syn0 = ((rng.random_sample((V, d)) - 0.5) / d).astype(np.float32)
        syn1 = np.zeros((V, d), np.float32)

        one = [np.array([1, 2], dtype=np.int64)]
        a = _train_partition(one, syn0, syn1, neg_cum, keep, 5, 5, 0.025, 0.025, 7)
        b = _train_partition_batch(one, syn0, syn1, neg_cum, keep, 5, 5, 0.025, 0.025, 7)
        assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])

        sents = [
            np.array(rng.randint(0, V, rng.randint(5, 25)), dtype=np.int64)
            for _ in range(500)
        ]
        e = _train_partition(sents, syn0, syn1, neg_cum, keep, 5, 5, 0.025, 0.001, 7)
        f = _train_partition_batch(sents, syn0, syn1, neg_cum, keep, 5, 5, 0.025, 0.001, 7)
        de = (e[0] - syn0).ravel()
        db = (f[0] - syn0).ravel()
        corr = float(np.corrcoef(de, db)[0, 1])
        assert corr > 0.99, corr

    def test_sparse_sync_matches_dense(self, spark):
        """sync="sparse" ships only touched-row deltas; results must
        agree with the dense full-matrix reduce to float32 rounding,
        for both combine modes, and be deterministic."""
        import numpy as np

        from coies_spark.ops.cbow import train_cbow

        sent = self._sentences(spark)
        for combine in ("mean", "sum"):
            vecs = {}
            for sync in ("dense", "sparse"):
                vecs[sync] = {
                    r.token: np.array(r.vector)
                    for r in train_cbow(
                        sent, dim=16, epochs=2, n_parts=4, min_count=1,
                        combine=combine, sync=sync,
                    ).collect()
                }
            assert set(vecs["dense"]) == set(vecs["sparse"])
            for t in vecs["dense"]:
                np.testing.assert_allclose(
                    vecs["dense"][t], vecs["sparse"][t],
                    rtol=1e-6, atol=1e-7, err_msg=(combine, t),
                )
        rerun = {
            r.token: np.array(r.vector)
            for r in train_cbow(
                sent, dim=16, epochs=2, n_parts=4, min_count=1,
                combine="sum", sync="sparse",
            ).collect()
        }
        for t in rerun:
            assert np.array_equal(rerun[t], vecs["sparse"][t])

    def test_sync_validation(self, spark):
        import pytest as _pytest

        from coies_spark.ops.cbow import train_cbow

        sent = self._sentences(spark)
        with _pytest.raises(ValueError, match="sync"):
            train_cbow(sent, dim=4, epochs=1, n_parts=1, sync="gossip")
