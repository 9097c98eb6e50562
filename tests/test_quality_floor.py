"""Trained-vector quality floor on the reference's own corpus.

The committed fixture ``tests/data/aaer_cbow512_testvocab.npz`` holds
the d=512 CBOW vectors trained by ``ops/cbow.train_cbow`` on the FULL
aaer corpus (reference mode: sg=0, negative=5, cbow_mean=1, window=5,
iter=5 — word2vec_models.py:38-47), pruned to the evaluation
vocabulary (example + all 49 tagged test files + raw twins) and
float16-quantized, plus the corpus-trained phrase-merge table.
Regenerate with ``python scripts/quality_run.py --vec-cache ...`` (full
recipe in BENCH.md §Quality).

The test runs the DISTRIBUTED pipeline end-to-end (assemble → Arrow
mention detection → scoring) over all 49 reference test documents and
asserts the recorded quality numbers hold:

* flagship config (oneshot_test.py:16-21): corpus ROUGE-1 F = 0.1257;
* calibrated operating point for this trainer's geometry
  (context_threshold=0.999, word_threshold=0.9): 0.3462, which must
  stay ABOVE the empty-extractor baseline (0.3429 — the score the
  metric's absent-type convention hands a pipeline that emits
  nothing).  That gap is the actual quality signal.
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


def read_ref(path: str) -> str:
    with open(path, "rb") as f:
        return textproc.ascii_clean(f.read())


@pytest.fixture(scope="module")
def trained():
    z = np.load(FIXTURE, allow_pickle=False)
    vecs = z["vecs"].astype(np.float32)
    mapping = {t: vecs[i] for i, t in enumerate(z["tokens"])}
    phrases = PhraseTable(
        {
            (a, b): o
            for a, b, o in zip(z["merge_a"], z["merge_b"], z["merge_out"])
        }
    )
    return mapping, phrases


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


def _score(spark, trained, eval_frames, ct: float, wt: float):
    mapping, phrases = trained
    raw, tagged, gold, convs = eval_frames
    cfg = ExtractionConfig(dim=512, context_threshold=ct, word_threshold=wt)
    art = build_example_artifacts(
        read_ref(f"{REF}/example/34-53330.txt"),
        [],
        cfg,
        phrases=phrases,
        emb=MappedEmbedding(mapping, 512),
    )
    mentions = extract_mentions(raw, art, tagged_transcripts=tagged)
    return (
        corpus_score(score_extractions(mentions, gold, art, convs)),
        mentions.count(),
    )


EMPTY_EXTRACTOR_BASELINE = 0.3429  # measured: pipeline emitting nothing


def test_flagship_config_matches_recorded_quality(spark, trained, eval_frames):
    score, n = _score(spark, trained, eval_frames, ct=0.9, wt=0.6)
    assert n > 400  # extraction fires at reference thresholds
    assert score == pytest.approx(0.1257, abs=2e-3)  # BENCH.md §Quality


def test_calibrated_config_beats_empty_extractor(spark, trained, eval_frames):
    score, n = _score(spark, trained, eval_frames, ct=0.999, wt=0.9)
    assert n > 0
    assert score == pytest.approx(0.3462, abs=2e-3)
    assert score > EMPTY_EXTRACTOR_BASELINE  # the real quality signal
