"""Streaming classifier scoring: the ingest-side face of
``ops.classify`` — exactly how a learned quality filter deploys in
production: TRAIN on the batch corpus (the GD loop needs global
aggregates, so it is batch by nature), then SCORE the live stream
with the frozen ≤257-row weight table.

Scoring is stateless per document — hashed bucket counts are
row-local, the margin is a per-doc aggregate over that row's own
buckets (computed ARRAY-SIDE here, one fold, no explode/groupBy:
a per-doc aggregation in an append-mode stream would force
watermark-delayed emission for a row-local quantity), and the weight
table joins in as a broadcast — so scored rows emit immediately in
append mode with zero stream state.

The margin fold accumulates each ``cnt·w`` term into a
``decimal(28,12)`` total (terms formed in doubles, the engine
convention), so the stream score is bit-identical to the batch
``classify_docs`` score for the same weights — asserted in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col
from ..ops.classify import _BIAS, _DEC
from ..ops.dsir import md5_bucket


def _margin_col(weights_map: Column) -> Column:
    """Row-local margin: one fold over the SORTED bucket array — each
    equal-run is one grouped ``cnt·w`` term (double product, cast
    decimal), exactly the batch groupBy's term, so totals are
    bit-identical.  Per-token ``w+w+…`` would group the doubles
    differently; a per-distinct ``filter`` scan would be
    O(distinct·n) and stall micro-batches on long docs (the same
    trap ``streaming.curate.top_2gram_frac_col`` documents) — the
    sorted-run fold is O(n log n)."""
    buckets = F.array_sort(
        F.array_append(
            F.transform(tokens_col("text"), md5_bucket), F.lit(_BIAS)
        )
    )

    def w_of(b: Column) -> Column:
        return F.coalesce(weights_map[b], F.lit(0.0))

    run = F.aggregate(
        buckets,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("cnt"),
            F.lit(0).cast(_DEC).alias("acc"),
        ),
        lambda s, b: F.struct(
            b.alias("prev"),
            F.when(b == s["prev"], s["cnt"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("cnt"),
            # decimal + decimal widens to (29,12); cast back so the
            # fold state type stays fixed (magnitudes are tiny —
            # sums of |w|<~1 terms — so the cast is lossless)
            F.when(b == s["prev"], s["acc"])
            .otherwise(
                s["acc"] + (s["cnt"] * w_of(s["prev"])).cast(_DEC)
            )
            .cast(_DEC)
            .alias("acc"),
        ),
        # trailing run: the fold closes a run only when the next
        # bucket differs, so the last one lands here
        lambda s: s["acc"] + (s["cnt"] * w_of(s["prev"])).cast(_DEC),
    )
    return run


def stream_classify(
    stream: DataFrame, weights: dict[str, float], threshold: float = 0.5
) -> DataFrame:
    """(doc_id, p, predicted): score an append-mode document stream
    under a trained weight table (pass
    ``{r.b: r.w for r in train_text_classifier(...).collect()}`` —
    the ≤257-row table is driver-safe by construction and ships to
    executors as a literal map, the streaming analogue of the batch
    broadcast join).

    Stateless: no watermark, no aggregation, rows emit immediately.
    Scores are bit-identical to batch ``classify_docs`` under the
    same weights (decimal margin, 9dp sigmoid pin).
    """
    wmap = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    m = _margin_col(wmap)
    return stream.select(
        "doc_id",
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-m.cast("double"))), 9
        ).alias("p"),
    ).withColumn("predicted", F.col("p") >= threshold)
