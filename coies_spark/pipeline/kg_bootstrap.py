"""The fused KG bootstrap run: mentions → distant labels → detector →
proposals → grown KG, chained as ``StageRunner`` stages — the
kg_construct counterpart of :mod:`~coies_spark.pipeline.training_run`.
A 10¹²-turn run killed anywhere resumes off its stage manifests
without re-running the corpus-scale mention scan.

Every stage is an existing, individually-oracled operator; this
module adds ONLY the composition, the checkpoints, and the lineage:

1. ``mentions`` — :func:`~coies_spark.ops.kg.gazetteer_mentions`
   (the one corpus-scale scan; everything downstream reads this
   snapshot, the pipeline-level form of ops.relext's shared-scan
   rule);
2. ``labels`` — :func:`~coies_spark.ops.relext.relation_training_table`
   over the mention snapshot, partitioned by class so the manifest
   records the positive/NA funnel;
3. ``detector`` — the :mod:`~coies_spark.ops.classify` GD chain over
   the label snapshot (≤257-row weight table — tiny, but
   checkpointing it makes the expensive downstream scoring resumable
   without retraining);
4. ``proposals`` — :func:`~coies_spark.ops.relext.score_proposals`
   with the stage-3 weights over the stage-1 mentions;
5. ``grown`` — the seed KG unioned with accepted proposals under the
   reserved predicate ``'related'`` (binary detector ⇒ untyped edge;
   a predicate classifier would slot between 4 and 5).  Accepted
   pairs re-enter the next bootstrap round as seed facts — the NELL
   coupling — and the seed's (subj, obj) anti-join needs no
   predicate, so the loop composes as-is.

``runner.metrics()`` is the funnel report: rows per stage, resume
flags, per-partition lineage — the accounting a KG owner monitors,
derived from the same manifests that make the run resumable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops.classify import train_text_classifier
from ..ops.kg import gazetteer_mentions
from ..ops.relext import relation_training_table, score_proposals
from .checkpoint import StageRunner


def bootstrap_kg_run(
    spark: SparkSession,
    transcripts_path: str,
    dictionary_path: str,
    seed_path: str,
    out_dir: str,
    threshold: float = 0.5,
    rate: float = 0.25,
    max_len: int = 3,
    iters: int = 3,
    lr: float = 1.0,
    broadcast: bool = True,
) -> tuple[DataFrame, StageRunner]:
    """→ (grown_kg, runner): the bootstrapped KG.  Re-invoking with
    identical inputs/config skips every completed stage off its
    manifest and returns an identical KG; changing any fingerprint
    field recomputes from the first affected stage."""
    runner = StageRunner(
        spark,
        out_dir,
        fingerprint={
            "transcripts": transcripts_path,
            "dictionary": dictionary_path,
            "seed": seed_path,
            "threshold": threshold,
            "rate": rate,
            "max_len": max_len,
            "iters": iters,
            "lr": lr,
        },
    )
    transcripts = spark.read.parquet(transcripts_path)
    dictionary = spark.read.parquet(dictionary_path)
    seed = spark.read.parquet(seed_path)

    mentions = runner.stage(
        "mentions",
        lambda: gazetteer_mentions(
            transcripts, dictionary, max_len, broadcast
        ),
    )

    labels = runner.stage(
        "labels",
        lambda: relation_training_table(
            transcripts,
            dictionary,
            seed,
            rate,
            max_len,
            broadcast,
            mentions=mentions,
        ),
        partition_by=["y"],
    )

    detector = runner.stage(
        "detector",
        lambda: train_text_classifier(
            labels.select(F.col("pair_id").alias("doc_id"), "text"),
            labels.select(F.col("pair_id").alias("doc_id"), "y"),
            iters=iters,
            lr=lr,
        ),
    )

    proposals = runner.stage(
        "proposals",
        lambda: score_proposals(
            transcripts,
            dictionary,
            seed,
            detector,
            threshold,
            max_len,
            broadcast,
            mentions=mentions,
        ),
    )

    grown = runner.stage(
        "grown",
        lambda: seed.select("subj", "pred", "obj").unionByName(
            proposals.where("proposed").select(
                "subj", F.lit("related").alias("pred"), "obj"
            )
        ),
        partition_by=["pred"],
    )
    return grown, runner
