"""Streaming deduplication over a document/turn stream.

The streaming twin of ``ops.dedup.exact_dedup``: drop rows whose text
digest was already seen, with state BOUNDED by an event-time watermark
(``dropDuplicatesWithinWatermark``, Spark 3.5+).  At the 100 TB design
point unbounded dedup state is the failure mode — a fleet ingesting
10^9 docs/day cannot keep every digest in state forever; the watermark
bounds state to the duplicate-arrival horizon (near-dup ingest
pipelines re-deliver within minutes/hours, not weeks), after which the
batch dedup family sweeps anything older.

Digest = md5 of the text (same as the batch operator), so a streamed
corpus dedups identically to a batch pass whenever every duplicate
pair lands inside the watermark horizon — asserted against
``ops.dedup.exact_dedup`` in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ops.dedup import _md5


def stream_dedup_exact(
    stream: DataFrame,
    watermark: str = "1 hour",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """First-seen rows of the stream, keyed by the text digest.

    ``dropDuplicatesWithinWatermark`` keeps a digest in state only
    until the watermark passes its event time: duplicates arriving
    inside the horizon are dropped, state size tracks the horizon's
    row count (not the stream's history).  Emission is append-mode
    compatible (rows emit immediately; only state expiry waits on the
    watermark).
    """
    # the digest is ops.dedup._md5 — the SAME expression the batch
    # exact_dedup keys on, so batch/stream survivor sets stay aligned
    # by construction
    digested = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .withColumn("digest", _md5(F.col(text_col)))
    )
    return digested.dropDuplicatesWithinWatermark(["digest"]).drop("digest")
