"""Streaming knowledge-graph belief maintenance.

The ingest-side twin of ``ops.kg.triple_confidence``: evidence rows
(subj, pred, obj, ts, score) arrive as a stream — each one an
independent detection of the same candidate triple — and the noisy-OR
combination runs as a WINDOWED streaming aggregation.

Why windowed rather than running-forever state: at the 10¹²-turn
design point a global per-triple accumulator is unbounded state (every
triple ever seen stays resident).  The event-time window bounds state
to the triples active inside the watermark horizon; each window close
emits that window's belief row (append mode), and the batch
:func:`coies_spark.ops.kg.triple_confidence` folds windows into the
all-time view during compaction — the same stream-then-sweep split as
``streaming.dedup`` / ``ops.dedup``.

The combination itself is the batch operator's exact expression
(SUM of ln(1 - s), clamped against log(0)) so a stream window and a
batch pass over the same rows produce identical confidences —
asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_triple_confidence(
    stream: DataFrame,
    watermark: str = "1 hour",
    window: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """(window_start, window_end, subj, pred, obj, n_evidence,
    confidence): per-window noisy-OR belief rows of an evidence
    stream.

    State: one accumulator per (window, triple) alive inside the
    watermark horizon — the partial SUM is map-side combinable, so
    executors pre-fold evidence before it reaches state.  Emission is
    append-mode (rows emit when the watermark closes the window), the
    mode every exactly-once sink supports.
    """
    s = F.least(F.col("score"), F.lit(1.0 - 1e-6))
    ev = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .withColumn("lg", F.log(F.lit(1.0) - s))
    )
    return (
        ev.groupBy(
            F.window(ts_col, window).alias("w"), "subj", "pred", "obj"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_evidence"),
            F.round(F.lit(1.0) - F.exp(F.sum("lg")), 6).alias(
                "confidence"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "subj",
            "pred",
            "obj",
            "n_evidence",
            "confidence",
        )
    )
