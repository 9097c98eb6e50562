"""Flagship job for spark-submit deployment: synthesize (or read) a
transcripts table, run the checkpointed extraction pipeline, print the
triple count and stage metrics.

Run via scripts/submit.sh — the engine arrives through --py-files, so
this file imports it the way a cluster executor would (no repo cwd
assumption)."""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import SparkSession


def main() -> None:
    spark = (
        SparkSession.builder.appName("coies-submit")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    from coies_spark.core.oneshot import ExtractionConfig, build_example_artifacts
    from coies_spark.data import synth
    from coies_spark.pipeline.triples import run_pipeline

    config = ExtractionConfig(
        context_size=10, dim=64, context_threshold=0.7,
        phrase_min_count=4, phrase_threshold=1.0,
    )
    corpus = synth.make_corpus(n_test=100, n_plain=100, seed=42)
    raw = spark.createDataFrame(
        synth.transcripts_frame(corpus.all_docs, use_raw=True)
    )
    tagged = spark.createDataFrame(
        synth.transcripts_frame(corpus.all_docs, use_raw=False)
    )
    artifacts = build_example_artifacts(
        corpus.example.tagged_text, synth.corpus_sentences(corpus), config
    )
    work_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="coies_submit_"
    )
    runner = run_pipeline(
        spark, raw, artifacts, work_dir, tagged_transcripts=tagged
    )
    triples = runner.results["s5_triples"].df
    print(f"TRIPLES={triples.count()}")
    runner.metrics().show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
