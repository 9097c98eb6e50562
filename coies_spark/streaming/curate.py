"""Streaming corpus curation: the ingest-side twin of
``ops.curate.curate_corpus``.

Every curation stage except dedup is a pure projection/filter —
quality floor, repetition gates, PII scrub, deterministic mixture
sample — so they run unchanged inside an append-mode stream (no
state, no watermark interaction, rows emit immediately).  Dedup is
the one stateful stage: the watermark-bounded full-MinHash filter
(``stream_dedup_minhash``) guards ingest, and the batch dedup family
sweeps anything beyond the horizon later.

One deliberate divergence from the batch pass: the modal-2-gram
repetition feature is computed ARRAY-SIDE here (longest equal-run of
the sorted gram array, O(n log n) per row) instead of the batch
explode + groupBy — a per-doc aggregation in an append-mode stream
would force watermark-delayed emission for a quantity that is
entirely row-local anyway.  The ratios (and hence the keep verdict)
are identical; only the execution shape differs — asserted against
``repetition_stats`` in tests/test_streaming.py.

Stage order matches the batch pass (gate → dedup → sample).
Survivorship semantics vs batch: the stream keeps the FIRST-ARRIVED
member of a near-dup group (within the watermark horizon), while the
batch pass keeps the min-doc_id bag-representative; both are
deterministic for a fixed arrival order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col
from ..ops.sampling import stratified_sample
from ..ops.textstats import (
    dup_ngram_frac_col,
    quality_feature_cols,
    scrub_cols,
    shingles_col,
)
from .dedup import stream_dedup_minhash


def top_2gram_frac_col(tokens: Column | str = "toks") -> Column:
    """Row-local modal-2-gram coverage: occurrences of the most
    frequent 2-gram over total 2-grams, computed with higher-order
    array functions only — identical (incl. 6dp rounding) to the
    batch ``repetition_stats`` column, but needing no aggregation.

    The modal count is the longest equal-run in the SORTED gram array
    (one ``aggregate`` fold over ``array_sort`` — O(n log n) per row;
    the per-distinct-gram ``filter`` formulation is O(n²) and stalls
    micro-batches on long documents)."""
    sh2 = F.array_sort(shingles_col(2, tokens))
    run = F.aggregate(
        sh2,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias(
                "run"
            ),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    return F.round(F.try_divide(run.best, F.size(sh2)), 6)


def stream_curate(
    stream: DataFrame,
    min_quality: float = 0.62,
    fractions: dict[str, float] | None = None,
    default_rate: float = 1.0,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Curated rows of a documents-shaped stream (needs ``doc_id``,
    ``text``, ``lang``, and an event-time ``ts_col``): quality floor →
    repetition gates → PII scrub → deterministic mixture sample →
    watermark-bounded near-dup filter.

    Output: (doc_id, lang, ts, n_tokens, quality, scrubbed) —
    append-mode compatible; the only state held is the near-dup
    filter's signature set inside the watermark horizon.
    """
    feats = quality_feature_cols("toks")
    scrubbed, _counts = scrub_cols()
    gated = (
        stream.withColumn("toks", tokens_col("text"))
        .withColumn("n_tokens", feats["n_tokens"])
        .withColumn("quality", feats["quality"])
        .withColumn("dup_3gram_frac", dup_ngram_frac_col(3, "toks"))
        .withColumn("top_2gram_frac", top_2gram_frac_col("toks"))
        .where(
            (F.col("quality") >= min_quality)
            & (F.col("top_2gram_frac") <= 0.20)
            & (F.col("dup_3gram_frac") <= 0.18)
        )
    )
    # dedup BEFORE sampling — matching the batch pass's gate → dedup →
    # sample order, so a group's survivor is decided by arrival, and
    # only then hash-sampled (sampling first would let a later member
    # of a sampled-out group slip through, diverging from batch)
    deduped = stream_dedup_minhash(gated, watermark=watermark, ts_col=ts_col)
    if fractions is not None:
        deduped = stratified_sample(deduped, fractions, default=default_rate)
    return deduped.select(
        "doc_id",
        "lang",
        ts_col,
        "n_tokens",
        "quality",
        scrubbed.alias("scrubbed"),
    )
