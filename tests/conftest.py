"""Shared fixtures: fixture-scale extraction config, synth corpus, and a
module-scoped local SparkSession (only built by tests that need it)."""

from __future__ import annotations

import pytest

from coies_spark.core.oneshot import ExtractionConfig, build_example_artifacts
from coies_spark.data import synth

# Fixture-scale flagship config: context windows of 10 (docs are small),
# d=64 hash embeddings, phrase training tuned to the synthetic corpus
# size.  Reference-scale values (100/512/gensim defaults) are the
# ExtractionConfig defaults.
FIXTURE_CONFIG = ExtractionConfig(
    context_size=10,
    dim=64,
    context_threshold=0.7,
    phrase_min_count=4,
    phrase_threshold=1.0,
)


@pytest.fixture(scope="session")
def corpus():
    return synth.make_corpus(n_test=20, n_plain=20, seed=42)


@pytest.fixture(scope="session")
def artifacts(corpus):
    return build_example_artifacts(
        corpus.example.tagged_text, synth.corpus_sentences(corpus), FIXTURE_CONFIG
    )


@pytest.fixture(scope="session")
def spark():
    from coies_spark.session import get_spark

    s = get_spark(app_name="coies-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
