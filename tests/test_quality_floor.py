"""Trained-vector quality floor on the reference's own corpus.

The committed fixture ``tests/data/aaer_cbow512_testvocab.npz`` holds
the round-3 trained models pruned to the evaluation vocabulary and
float16-quantized (overflow-gated; underflow is score-neutral):

* CONTEXT model: d=512 CBOW-NS (``ops/cbow.train_cbow``, the
  reference's exact mode: sg=0, negative=5, cbow_mean=1, window=5 —
  word2vec_models.py:38-47) over the FULL raw aaer corpus,
  combine='mean' × n_parts=8 × 40 epochs ≡ sequential iter=5;
* GRAM model: same trainer over the bigram-PHRASED corpus
  (PhraseVecBigrams / AAERExParserPhrasesBigrams parity,
  context_based_models.py:203-218) — phrase tokens carry real vectors;
* the corpus-trained phrase merge table.

Regenerate: ``python scripts/quality_run.py`` (with --vec-cache /
--phrased-corpus) then ``python scripts/make_quality_fixture.py``
(full recipe in BENCH.md §Quality).

The tests run the DISTRIBUTED pipeline end-to-end (assemble → Arrow
mention detection → scoring) over all 49 reference test documents at
the VERBATIM flagship config (oneshot_test.py:16-21: topn=5,
context_threshold=0.9, word_threshold=0.6, context_size=100) and
assert the recorded quality:

* two-model (reference-faithful) flagship: corpus ROUGE-1 F = 0.4294;
* single-model flagship: 0.4431 — the swept-grid peak, AT the
  verbatim thresholds (the trained geometry makes ct=0.9 binding,
  exactly what the reference calibrated);
* both far above the empty-extractor baseline 0.3429 (the score the
  metric's absent-type convention hands a pipeline emitting nothing);
  human annotators score 0.4673 on the same metric (the realistic
  ceiling).

The fixture vectors are the round-4 RECIPE-FAITHFUL training run:
the engine's own CBOW-NS trainer at n_parts=1 (sequential, the same
update schedule as the reference's gensim workers-style recipe,
word2vec_models.py:38-47, iter=5) — measured 0.013-0.019 ROUGE above
the 8-partition parameter-averaged run of the identical trainer
(0.4160/0.4243, the round-3 fixture), which is the distributed
fidelity cost documented in BENCH.md §Quality.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from coies_spark.core import textproc
from coies_spark.core.embed import MappedEmbedding, PhraseTable
from coies_spark.core.oneshot import ExtractionConfig, build_example_artifacts
from coies_spark.pipeline.evaluate import corpus_score, score_extractions
from coies_spark.pipeline.extract import extract_mentions

REF = "/root/reference/text_files"
FIXTURE = os.path.join(
    os.path.dirname(__file__), "data", "aaer_cbow512_testvocab.npz"
)

pytestmark = pytest.mark.skipif(
    not (os.path.exists(f"{REF}/example/34-53330.txt") and os.path.exists(FIXTURE)),
    reason="reference corpus or trained-vector fixture not available",
)

EMPTY_EXTRACTOR_BASELINE = 0.3429  # measured: pipeline emitting nothing
HUMAN_BASELINE = 0.4673            # measured: human_results annotations


def read_ref(path: str) -> str:
    with open(path, "rb") as f:
        return textproc.ascii_clean(f.read())


@pytest.fixture(scope="module")
def trained():
    z = np.load(FIXTURE, allow_pickle=False)
    ctx = {t: v for t, v in zip(z["tokens"], z["vecs"].astype(np.float32))}
    gram = {
        t: v
        for t, v in zip(z["gram_tokens"], z["gram_vecs"].astype(np.float32))
    }
    phrases = PhraseTable(
        {
            (a, b): o
            for a, b, o in zip(z["merge_a"], z["merge_b"], z["merge_out"])
        }
    )
    return ctx, gram, phrases


@pytest.fixture(scope="module")
def eval_frames(spark):
    stems = [
        fn[:-4]
        for fn in sorted(os.listdir(f"{REF}/test"))
        if fn.endswith(".txt") and os.path.exists(f"{REF}/aaer/{fn}")
    ]
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    raw_rows, tagged_rows, gold_rows = [], [], []
    for stem in stems:
        raw_rows.append(
            (stem, 0, "doc", read_ref(f"{REF}/aaer/{stem}.txt"), None, None)
        )
        tt = read_ref(f"{REF}/test/{stem}.txt")
        tagged_rows.append((stem, 0, "doc", tt, None, None))
        for pred, mentions in textproc.entity_dict(
            textproc.tagged_tokens_from_text(tt)
        ).items():
            for m in mentions:
                gold_rows.append((stem, pred, " ".join(m)))
    raw = spark.createDataFrame(raw_rows, schema).repartition(8).cache()
    tagged = spark.createDataFrame(tagged_rows, schema).cache()
    gold = spark.createDataFrame(
        gold_rows, "conv_id string, pred string, obj string"
    ).cache()
    convs = raw.select("conv_id").distinct().cache()
    return raw, tagged, gold, convs


def _score(spark, trained, eval_frames, two_model: bool):
    ctx_map, gram_map, phrases = trained
    raw, tagged, gold, convs = eval_frames
    cfg = ExtractionConfig(dim=512)  # verbatim flagship thresholds
    art = build_example_artifacts(
        read_ref(f"{REF}/example/34-53330.txt"),
        [],
        cfg,
        phrases=phrases,
        emb=MappedEmbedding(ctx_map, 512),
        gram_emb=MappedEmbedding(gram_map, 512) if two_model else None,
    )
    mentions = extract_mentions(raw, art, tagged_transcripts=tagged)
    return (
        corpus_score(score_extractions(mentions, gold, art, convs)),
        mentions.count(),
    )


def test_two_model_flagship_beats_empty_extractor(spark, trained, eval_frames):
    """Reference-faithful setting (raw-corpus context model +
    phrased-corpus gram model) at the VERBATIM flagship config."""
    score, n = _score(spark, trained, eval_frames, two_model=True)
    assert n > 100  # selective firing, not silence
    assert score == pytest.approx(0.4294, abs=3e-3)
    assert score > EMPTY_EXTRACTOR_BASELINE + 0.02  # the quality signal


def test_single_model_flagship_is_grid_peak(spark, trained, eval_frames):
    score, n = _score(spark, trained, eval_frames, two_model=False)
    assert n > 100
    assert score == pytest.approx(0.4431, abs=3e-3)
    assert score > EMPTY_EXTRACTOR_BASELINE + 0.02
    assert score < 1.0  # sanity vs the Perfect bound
