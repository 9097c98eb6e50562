"""Checkpointed corpus-curation run: the curation family wired into
the same snapshot/lineage/resume machinery as the KG pipeline.

Two stages through ``StageRunner`` (parquet snapshot + manifest with
fingerprint, row counts, per-partition lineage, wall time):

1. ``curated`` — ``curate_corpus`` materialized PARTITIONED BY lang,
   so the manifest records per-language row counts (the lineage a
   mixture-targeted corpus build is monitored by) and downstream
   per-language reads prune partitions;
2. ``report`` — per-language corpus accounting (docs, token sum,
   mean quality) over the *materialized* stage-1 output.

Re-running with the same inputs/config skips both stages off their
manifests (resume-after-kill); changing any fingerprint field (input
path, quality floor, mixture rates) recomputes — exactly the
StageRunner contract the KG extraction pipeline is tested under, so a
100 TB curation run restarted mid-way never re-reads the corpus for
completed stages.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops.curate import curate_corpus
from .checkpoint import StageRunner


def run_curation(
    spark: SparkSession,
    docs_path: str,
    out_dir: str,
    min_quality: float = 0.62,
    fractions: Optional[dict[str, float]] = None,
    default_rate: float = 1.0,
) -> tuple[DataFrame, DataFrame, StageRunner]:
    """→ (curated, report, runner): checkpointed curation of the
    documents table at ``docs_path`` into ``out_dir``."""
    runner = StageRunner(
        spark,
        out_dir,
        fingerprint={
            "docs": docs_path,
            "min_quality": min_quality,
            "fractions": sorted((fractions or {}).items()),
            "default_rate": default_rate,
        },
    )
    curated = runner.stage(
        "curated",
        lambda: curate_corpus(
            spark.read.parquet(docs_path),
            min_quality=min_quality,
            fractions=fractions,
            default_rate=default_rate,
        ),
        partition_by=["lang"],
    )
    report = runner.stage(
        "report",
        lambda: curated.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(F.avg("quality"), 6).alias("mean_quality"),
        ),
    )
    return curated, report, runner
