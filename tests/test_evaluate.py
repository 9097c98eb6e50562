"""Distributed evaluation parity: the Spark scoring loop reproduces the
reference-faithful single-node scorer; grid_search / validate_with_more
entry points run end-to-end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from coies_spark.core.metrics import mention_score
from coies_spark.core.oneshot import oracle_extract_doc
from coies_spark.core import textproc
from coies_spark.data import synth
from coies_spark.pipeline import evaluate as ev
from coies_spark.pipeline.extract import extract_mentions
from tests.conftest import FIXTURE_CONFIG

pytestmark = pytest.mark.spark


def single_node_corpus_score(corpus, artifacts) -> float:
    """The reference test() loop verbatim (oneshot_test.py:193-215)."""
    doc_scores = []
    for doc in corpus.all_docs:
        emissions = oracle_extract_doc(doc.raw_text, doc.tagged_text, artifacts)
        gold = textproc.entity_dict(
            textproc.tagged_tokens_from_text(doc.tagged_text)
        )
        total, count = 0.0, 0
        for seed in artifacts.seeds:
            found = [
                e.gram for e in emissions if e.seed_tokens == seed.tokens
            ]
            s, c = mention_score(found or None, gold, seed.pred)
            total += s
            count += c
        doc_scores.append(total / count)
    return sum(doc_scores) / len(doc_scores)


@pytest.fixture(scope="module")
def gold_df(spark, corpus):
    rows = []
    for doc in corpus.all_docs:
        tagged = textproc.tagged_tokens_from_text(doc.tagged_text)
        for pred, toks, _, _ in textproc.entity_spans(tagged):
            rows.append((doc.conv_id, pred, " ".join(toks)))
    return spark.createDataFrame(rows, "conv_id string, pred string, obj string")


def test_corpus_score_matches_single_node(
    spark, corpus, artifacts, gold_df
):
    raw = spark.createDataFrame(
        synth.transcripts_frame(corpus.all_docs, use_raw=True)
    )
    tagged = spark.createDataFrame(
        synth.transcripts_frame(corpus.all_docs, use_raw=False)
    )
    got = ev.evaluate_pipeline(raw, tagged, gold_df, artifacts)
    want = single_node_corpus_score(corpus, artifacts)
    assert got == pytest.approx(want, abs=1e-9)
    assert 0.0 < got <= 1.0


def test_grid_search_runs(spark, corpus, gold_df):
    raw = spark.createDataFrame(
        synth.transcripts_frame(corpus.all_docs, use_raw=True)
    )
    tagged = spark.createDataFrame(
        synth.transcripts_frame(corpus.all_docs, use_raw=False)
    )
    sentences = synth.corpus_sentences(corpus)

    from coies_spark.core.oneshot import build_example_artifacts

    rows = ev.grid_search(
        FIXTURE_CONFIG,
        {"context_size": [8, 12]},
        lambda cfg: build_example_artifacts(
            corpus.example.tagged_text, sentences, cfg
        ),
        lambda art: ev.evaluate_pipeline(raw, tagged, gold_df, art),
    )
    assert len(rows) == 2
    assert all(0.0 <= r["score"] <= 1.0 for r in rows)
    assert {r["value"] for r in rows} == {8, 12}


def test_grid_search_batched_single_collect(spark, corpus, gold_df, monkeypatch):
    """The batched sweep must (a) agree with the sequential grid_search
    and (b) fetch all N config scores with exactly ONE collect."""
    raw = spark.createDataFrame(
        synth.transcripts_frame(corpus.all_docs, use_raw=True)
    )
    tagged = spark.createDataFrame(
        synth.transcripts_frame(corpus.all_docs, use_raw=False)
    )
    sentences = synth.corpus_sentences(corpus)

    from coies_spark.core.oneshot import build_example_artifacts

    build = lambda cfg: build_example_artifacts(
        corpus.example.tagged_text, sentences, cfg
    )
    convs = raw.select("conv_id").distinct()

    def build_scores(art):
        mentions = extract_mentions(raw, art, tagged_transcripts=tagged)
        return ev.score_extractions(mentions, gold_df, art, convs)

    sequential = ev.grid_search(
        FIXTURE_CONFIG,
        {"context_size": [8, 12]},
        build,
        lambda art: ev.corpus_score(build_scores(art)),
    )

    cls = type(raw)  # the concrete (classic) DataFrame class
    n_collects = 0
    orig = cls.collect

    def counting(self, *a, **k):
        nonlocal n_collects
        n_collects += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(cls, "collect", counting)
    batched = ev.grid_search_batched(
        FIXTURE_CONFIG, {"context_size": [8, 12]}, build, build_scores
    )
    monkeypatch.undo()

    assert n_collects == 1
    assert len(batched) == 2
    for s, b in zip(sequential, batched):
        assert s["param"] == b["param"] and s["value"] == b["value"]
        assert b["score"] == pytest.approx(s["score"], abs=1e-9)
    assert ev.grid_search_batched(FIXTURE_CONFIG, {}, build, build_scores) == []


def test_validate_with_more(spark, corpus, gold_df):
    raw = spark.createDataFrame(
        synth.transcripts_frame(corpus.all_docs, use_raw=True)
    )
    tagged = spark.createDataFrame(
        synth.transcripts_frame(corpus.all_docs, use_raw=False)
    )
    candidates = [
        (d.conv_id, d.tagged_text) for d in corpus.test_docs[:3]
    ]
    rows = ev.validate_with_more(
        spark,
        candidates,
        synth.corpus_sentences(corpus),
        FIXTURE_CONFIG,
        lambda art: ev.evaluate_pipeline(raw, tagged, gold_df, art),
    )
    # synth test docs carry 3 entity types → all qualify
    assert len(rows) == 3
    assert all(r["n_entity_types"] >= 3 for r in rows)
    assert all(0.0 <= r["score"] <= 1.0 for r in rows)


def test_validate_with_more_batched_single_collect(
    spark, corpus, gold_df, monkeypatch
):
    """The batched example-robustness sweep must agree with the
    sequential validate_with_more and score all N candidates with
    exactly ONE collect."""
    raw = spark.createDataFrame(
        synth.transcripts_frame(corpus.all_docs, use_raw=True)
    )
    tagged = spark.createDataFrame(
        synth.transcripts_frame(corpus.all_docs, use_raw=False)
    )
    sentences = synth.corpus_sentences(corpus)
    candidates = [(d.conv_id, d.tagged_text) for d in corpus.test_docs[:3]]
    convs = raw.select("conv_id").distinct()

    def build_scores(art):
        mentions = extract_mentions(raw, art, tagged_transcripts=tagged)
        return ev.score_extractions(mentions, gold_df, art, convs)

    sequential = ev.validate_with_more(
        spark,
        candidates,
        sentences,
        FIXTURE_CONFIG,
        lambda art: ev.evaluate_pipeline(raw, tagged, gold_df, art),
    )

    cls = type(raw)
    n_collects = 0
    orig = cls.collect

    def counting(self, *a, **k):
        nonlocal n_collects
        n_collects += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(cls, "collect", counting)
    batched = ev.validate_with_more_batched(
        candidates, sentences, FIXTURE_CONFIG, build_scores
    )
    monkeypatch.undo()

    assert n_collects == 1
    assert len(batched) == 3
    for s, b in zip(sequential, batched):
        assert s["example_conv_id"] == b["example_conv_id"]
        assert s["n_entity_types"] == b["n_entity_types"]
        assert b["score"] == pytest.approx(s["score"], abs=1e-9)
    assert ev.validate_with_more_batched([], sentences, FIXTURE_CONFIG, build_scores) == []


def test_perfect_and_random_baselines(spark, corpus, gold_df):
    """Perfect must hit the metric ceiling (1.0: gold vs gold, plus the
    absent-type credit); Random must land strictly below it and
    reproduce deterministically (hash-draw, not random.choice)."""
    from coies_spark.core.oneshot import build_example_artifacts

    raw = spark.createDataFrame(
        synth.transcripts_frame(corpus.all_docs, use_raw=True)
    )
    art = build_example_artifacts(
        corpus.example.tagged_text, synth.corpus_sentences(corpus),
        FIXTURE_CONFIG,
    )
    convs = raw.select("conv_id").distinct()

    perfect = ev.corpus_score(
        ev.score_extractions(ev.perfect_mentions(gold_df, art), gold_df, art, convs)
    )
    assert perfect == pytest.approx(1.0, abs=1e-9)

    r1 = ev.random_mentions(raw, art)
    r2 = ev.random_mentions(raw, art)
    assert sorted(map(tuple, r1.collect())) == sorted(map(tuple, r2.collect()))
    random_score = ev.corpus_score(
        ev.score_extractions(r1, gold_df, art, convs)
    )
    assert 0.0 <= random_score < perfect


def test_batched_sweeps_survive_an_empty_run(spark, corpus, gold_df):
    """A candidate whose scores frame contributes zero rows must yield
    score=NaN for THAT run without failing the others (regression: the
    comprehension previously raised KeyError on the missing run id)."""
    import math

    raw = spark.createDataFrame(
        synth.transcripts_frame(corpus.all_docs, use_raw=True)
    )
    tagged = spark.createDataFrame(
        synth.transcripts_frame(corpus.all_docs, use_raw=False)
    )
    sentences = synth.corpus_sentences(corpus)
    candidates = [(d.conv_id, d.tagged_text) for d in corpus.test_docs[:2]]
    convs = raw.select("conv_id").distinct()
    empty_for = {candidates[0][0]}
    seen: list[str] = []

    def build_scores(art):
        # first qualifying candidate gets an EMPTY frame; the rest
        # score normally
        mentions = extract_mentions(raw, art, tagged_transcripts=tagged)
        scores = ev.score_extractions(mentions, gold_df, art, convs)
        idx = len(seen)
        seen.append("x")
        if candidates[idx][0] in empty_for:
            return scores.where(F.lit(False))
        return scores

    out = ev.validate_with_more_batched(
        candidates, sentences, FIXTURE_CONFIG, build_scores
    )
    assert len(out) == 2
    by_conv = {r["example_conv_id"]: r["score"] for r in out}
    assert math.isnan(by_conv[candidates[0][0]])
    assert not math.isnan(by_conv[candidates[1][0]])
