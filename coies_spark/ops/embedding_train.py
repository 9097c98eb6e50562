"""Distributed embedding training: the production slot for M1.

The extraction kernel consumes a plain ``{token: float32[d]}`` mapping
(core/embed.py) — fixtures use deterministic hash vectors; production
swaps in real word2vec output without touching downstream stages.
This module trains that table with ``pyspark.ml.feature.Word2Vec``
(skip-gram, distributed, reference hyperparameters from
word2vec_models.py:38-47: window=5, minCount=1, d=512 at full scale)
over tokenized corpus sentences, entirely JVM-side.

At 100 TB the training corpus is a *sample* (word2vec quality saturates
far below full-corpus size); the vector table output is a few hundred
MB — broadcastable, or persisted and re-loaded per run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col


def sentence_frame(transcripts: DataFrame) -> DataFrame:
    """(sentence array<string>) — per-turn token lists (in the
    transcript model one turn ≈ one sentence, SURVEY.md §1.1)."""
    return transcripts.select(tokens_col("text").alias("sentence")).where(
        F.size("sentence") > 0
    )


def train_word2vec(
    sentences: DataFrame,
    dim: int = 64,
    window: int = 5,
    min_count: int = 1,
    max_iter: int = 1,
    seed: int = 42,
) -> DataFrame:
    """→ (token string, vector array<float>): trained vector table.

    Reference hyperparameters (word2vec_models.py:38-47) are the
    defaults at full scale (d=512, negative sampling); Spark ML's
    Word2Vec is skip-gram + hierarchical softmax — an accepted
    public-variant substitution (the downstream contract is only the
    token→vector table).
    """
    from pyspark.ml.feature import Word2Vec
    from pyspark.ml.functions import vector_to_array

    model = Word2Vec(
        vectorSize=dim,
        windowSize=window,
        minCount=min_count,
        maxIter=max_iter,
        seed=seed,
        inputCol="sentence",
        outputCol="_vec",
    ).fit(sentences)
    return model.getVectors().select(
        F.col("word").alias("token"),
        F.transform(
            vector_to_array("vector"), lambda x: x.cast("float")
        ).alias("vector"),
    )


def vectors_to_mapping(vectors: DataFrame) -> dict[str, list[float]]:
    """Collect the (small) vector table into the broadcastable mapping
    the extraction artifacts consume."""
    return {r.token: list(r.vector) for r in vectors.collect()}
