"""Distributed evaluation + config-sweep entry points.

Reference counterparts (citations into /root/reference/):

* ``score_extractions`` / ``corpus_score`` — the ``test()`` loop
  (model_testing/oneshot_test.py:193-215): per (doc, example-mention)
  ROUGE-1 F(α=0.5) of found grams vs the doc's gold mentions of that
  type (oneshot_test.py:105-120), normalized per doc, averaged over
  docs (main.py:19-30).  The scoring universe is docs × seeds — a
  broadcast cross join (seeds are O(10)); absent emissions score 1.0
  when the type is absent from gold, 0.0 when present (mention_score
  semantics).
* ``grid_search`` — main.py:56-61, 98-100: driver loop re-running the
  pipeline per config, metrics appended per run.
* ``validate_with_more`` — main.py:72-87: each qualifying validation
  conversation (>2 entity types) serves as the one-shot example;
  scores averaged across examples.

Evaluation is off the hot path, so the per-row ROUGE runs in one
Arrow-batched pandas UDF over pre-joined token lists.
"""

from __future__ import annotations

import json
from dataclasses import asdict, replace
from typing import Callable, Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.metrics import rouge_1
from ..core.oneshot import ExampleArtifacts, ExtractionConfig, build_example_artifacts
from ..core import textproc
from .extract import extract_mentions
from .triples import conv_triples


@F.pandas_udf(T.DoubleType())
def _rouge1_udf(found: pd.Series, gold: pd.Series) -> pd.Series:
    """rouge_1 F(α=0.5) over flattened token lists; mention_score edge
    cases (oneshot_test.py:105-120): gold absent → 1.0 iff nothing was
    found, else 0.0."""

    def one(f, g) -> float:
        f = list(f) if f is not None else []
        g = list(g) if g is not None else []
        if g:
            return rouge_1(f, [g], alpha=0.5)
        return 1.0 if not f else 0.0

    return pd.Series([one(f, g) for f, g in zip(found, gold)])


def score_extractions(
    mentions: DataFrame,
    gold: DataFrame,
    artifacts: ExampleArtifacts,
    all_conv_ids: DataFrame,
) -> DataFrame:
    """(conv_id, seed, pred, rouge): one row per (doc, example mention).

    ``mentions``: extraction output (conv_id, pred, obj, score, seed).
    ``gold``: (conv_id, pred, obj) gold triples.
    ``all_conv_ids``: one-column frame of every scored doc (docs with
    zero emissions still count — oneshot_test.py:205-208).
    """
    spark = mentions.sparkSession
    seeds = spark.createDataFrame(
        [(" ".join(s.tokens), s.pred) for s in artifacts.seeds],
        "seed string, pred string",
    )
    universe = all_conv_ids.crossJoin(F.broadcast(seeds))
    found = (
        mentions.groupBy("conv_id", "seed", "pred")
        .agg(F.flatten(F.collect_list(F.split("obj", " "))).alias("found_toks"))
    )
    gold_toks = (
        gold.groupBy("conv_id", "pred")
        .agg(F.flatten(F.collect_list(F.split("obj", " "))).alias("gold_toks"))
    )
    joined = (
        universe.join(found, ["conv_id", "seed", "pred"], "left")
        .join(gold_toks, ["conv_id", "pred"], "left")
    )
    return joined.select(
        "conv_id",
        "seed",
        "pred",
        _rouge1_udf("found_toks", "gold_toks").alias("rouge"),
    )


def corpus_score(scores: DataFrame) -> float:
    """Normalize per doc (mean over seeds) then average over docs
    (oneshot_test.py:205-208; main.py:19-30)."""
    per_doc = scores.groupBy("conv_id").agg(F.avg("rouge").alias("doc_score"))
    row = per_doc.agg(F.avg("doc_score").alias("s")).collect()[0]
    return float(row.s)


def evaluate_pipeline(
    transcripts: DataFrame,
    tagged_transcripts: DataFrame,
    gold: DataFrame,
    artifacts: ExampleArtifacts,
) -> float:
    """Extract + score in one call → corpus score."""
    mentions = extract_mentions(
        transcripts, artifacts, tagged_transcripts=tagged_transcripts
    )
    convs = transcripts.select("conv_id").distinct()
    return corpus_score(score_extractions(mentions, gold, artifacts, convs))


def grid_search(
    base_config: ExtractionConfig,
    param_grid: dict[str, Sequence],
    build_artifacts: Callable[[ExtractionConfig], ExampleArtifacts],
    evaluate: Callable[[ExampleArtifacts], float],
) -> list[dict]:
    """Sweep one parameter axis at a time over the grid (the reference
    mutates a shared dict — main.py:56-61 — i.e. non-cartesian).
    Returns [{param, value, score, config}] rows for the metrics table.
    """
    out = []
    for param, values in param_grid.items():
        for v in values:
            cfg = replace(base_config, **{param: v})
            score = evaluate(build_artifacts(cfg))
            out.append(
                {
                    "param": param,
                    "value": v,
                    "score": score,
                    "config": json.dumps(asdict(cfg), sort_keys=True),
                }
            )
    return out


def perfect_mentions(
    gold: DataFrame, artifacts: ExampleArtifacts
) -> DataFrame:
    """Perfect-extractor baseline (OneShotTestPerfect,
    oneshot_test.py:267-287): for every seed, emit the doc's gold
    mentions of the seed's type verbatim.  Scored through
    ``score_extractions`` this bounds the metric from above (absent
    types emit nothing → the absent-type credit applies, exactly the
    reference's ``score_by_rouge`` path)."""
    spark = gold.sparkSession
    seeds = spark.createDataFrame(
        [(" ".join(s.tokens), s.pred) for s in artifacts.seeds],
        "seed string, pred string",
    )
    return gold.join(F.broadcast(seeds), "pred").select(
        "conv_id", "seed", "pred", "obj", F.lit(1.0).alias("score")
    )


def random_mentions(
    transcripts: DataFrame,
    artifacts: ExampleArtifacts,
    salt: str = "random-baseline",
) -> DataFrame:
    """Random-selection baseline (OneShotTestRandom,
    oneshot_test.py:299-308): one token drawn from the doc's token
    stream per (doc, seed).  The reference uses ``random.choice``; here
    the draw is a deterministic hash (conv_id, seed, salt) → index so
    the baseline reproduces bit-for-bit across runs — same
    distributional role, stable CI.  All JVM-side (no UDF)."""
    from ..functions.tokenize import tokens_col

    spark = transcripts.sparkSession
    seeds = spark.createDataFrame(
        [(" ".join(s.tokens), s.pred) for s in artifacts.seeds],
        "seed string, pred string",
    )
    # order-stable token stream: sort turns by turn_idx before flatten
    doc_toks = (
        transcripts.groupBy("conv_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("turn_idx", "text"))
                    ),
                    lambda s: tokens_col(s.text),
                )
            ).alias("toks")
        )
        .where(F.size("toks") > 0)
    )
    idx = (
        F.pmod(
            F.xxhash64("conv_id", "seed", F.lit(salt)), F.size("toks")
        )
        + 1
    ).cast("int")
    return doc_toks.crossJoin(F.broadcast(seeds)).select(
        "conv_id",
        "seed",
        "pred",
        F.element_at("toks", idx).alias("obj"),
        F.lit(0.0).alias("score"),
    )


def grid_search_batched(
    base_config: ExtractionConfig,
    param_grid: dict[str, Sequence],
    build_artifacts: Callable[[ExtractionConfig], ExampleArtifacts],
    build_scores: Callable[[ExampleArtifacts], DataFrame],
) -> list[dict]:
    """``grid_search`` with ONE Spark job for the whole sweep: every
    config's scores frame (``score_extractions`` output) is tagged with
    its run index and unioned, the per-doc normalization + corpus mean
    aggregate per run inside a single plan, and one collect fetches all
    N corpus scores.  Large grids pay job-setup/scan costs once instead
    of once per config (the reference loops the full pipeline per
    config — main.py:56-61, 98-100 — which is exactly the driver-side
    round-trip shape to avoid at scale).
    """
    runs: list[tuple[str, object, ExtractionConfig]] = []
    frames: list[DataFrame] = []
    for param, values in param_grid.items():
        for v in values:
            cfg = replace(base_config, **{param: v})
            scores = build_scores(build_artifacts(cfg))
            frames.append(scores.withColumn("__run", F.lit(len(runs))))
            runs.append((param, v, cfg))
    by_run = _batched_corpus_scores(frames)
    return [
        {
            "param": param,
            "value": v,
            "score": by_run.get(i, float("nan")),
            "config": json.dumps(asdict(cfg), sort_keys=True),
        }
        for i, (param, v, cfg) in enumerate(runs)
    ]


def _batched_corpus_scores(frames: Sequence[DataFrame]) -> dict[int, float]:
    """{run index: corpus score} for run-tagged ``score_extractions``
    frames: union all branches, per-doc normalization + corpus mean per
    run inside ONE plan, one collect for every run's score.

    A run whose frame contributes ZERO rows (empty seeds, empty corpus)
    is absent from the result — callers read with ``.get(i, nan)`` so
    one empty run can never fail the whole sweep."""
    from functools import reduce as _reduce

    if not frames:
        return {}
    union = _reduce(DataFrame.unionByName, frames)
    per_doc = union.groupBy("__run", "conv_id").agg(
        F.avg("rouge").alias("doc_score")
    )
    collected = (
        per_doc.groupBy("__run").agg(F.avg("doc_score").alias("s")).collect()
    )
    return {r["__run"]: float(r["s"]) for r in collected}


def validate_with_more(
    spark: SparkSession,
    candidate_examples: Iterable[tuple[str, str]],
    corpus_sentences: Sequence[Sequence[str]],
    config: ExtractionConfig,
    evaluate: Callable[[ExampleArtifacts], float],
    min_entity_types: int = 3,
) -> list[dict]:
    """Example-robustness sweep (main.py:72-87): every candidate
    (conv_id, tagged_text) whose gold covers > 2 entity types serves as
    the one-shot example; returns per-example corpus scores."""
    out = []
    for conv_id, tagged_text in candidate_examples:
        tagged = textproc.tagged_tokens_from_text(tagged_text)
        n_types = len(textproc.entity_dict(tagged))
        if n_types < min_entity_types:
            continue
        artifacts = build_example_artifacts(
            tagged_text, corpus_sentences, config
        )
        out.append(
            {
                "example_conv_id": conv_id,
                "n_entity_types": n_types,
                "score": evaluate(artifacts),
            }
        )
    return out


def validate_with_more_batched(
    candidate_examples: Iterable[tuple[str, str]],
    corpus_sentences: Sequence[Sequence[str]],
    config: ExtractionConfig,
    build_scores: Callable[[ExampleArtifacts], DataFrame],
    min_entity_types: int = 3,
) -> list[dict]:
    """:func:`validate_with_more` with ONE Spark job for all candidate
    examples (the :func:`grid_search_batched` union shape): each
    qualifying example's ``score_extractions`` frame is tagged with its
    run index and unioned, per-doc normalization + corpus mean happen
    per run inside a single plan, and one collect fetches every
    example's corpus score.  The reference re-runs the full pipeline
    per candidate example (main.py:72-87) — the per-action round-trip
    this batches away."""
    runs: list[tuple[str, int]] = []
    frames: list[DataFrame] = []
    for conv_id, tagged_text in candidate_examples:
        tagged = textproc.tagged_tokens_from_text(tagged_text)
        n_types = len(textproc.entity_dict(tagged))
        if n_types < min_entity_types:
            continue
        artifacts = build_example_artifacts(
            tagged_text, corpus_sentences, config
        )
        frames.append(
            build_scores(artifacts).withColumn("__run", F.lit(len(runs)))
        )
        runs.append((conv_id, n_types))
    by_run = _batched_corpus_scores(frames)
    return [
        {
            "example_conv_id": conv_id,
            "n_entity_types": n_types,
            "score": by_run.get(i, float("nan")),
        }
        for i, (conv_id, n_types) in enumerate(runs)
    ]
