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


def minhash_signature_col(
    text_col: str = "text", n: int = 3, num_hashes: int = 8
):
    """Comma-joined wide MinHash signature as ONE per-row expression —
    no aggregation, so it is computable inside an append-mode stream.

    Equals the batch ``ops.dedup.minhash_signatures_wide`` signature
    bit-for-bit: the batch path min-aggregates seeded md5 digests over
    exploded distinct shingles; the per-seed minimum over the same
    digests on the un-exploded distinct-shingle array is the same
    minimum (string ordering, identical tokenization) — asserted in
    tests/test_streaming.py.

    All ``num_hashes`` minima come from ONE ``aggregate`` fold with a
    struct accumulator — a per-seed ``array_min(transform(...))``
    would re-evaluate the whole tokenize→shingle→distinct pipeline
    once per seed (Catalyst evaluates each outer expression
    independently; ×8 per row on the ingest hot path)."""
    from ..functions.tokenize import tokens_col
    from ..ops.textstats import shingles_col

    shingles = F.array_distinct(shingles_col(n, tokens_col(text_col)))
    names = [f"m{i}" for i in range(num_hashes)]
    # 'g' > 'f': any md5 hex string sorts below the sentinel, and the
    # shingle array is never empty (empty docs get one "" shingle)
    sentinel = "g" * 32
    init = F.struct(
        *[F.lit(sentinel).alias(nm) for nm in names]
    )
    # the join happens in the aggregate's FINISH lambda: acc is bound
    # once there, while 8 outer GetStructField references would each
    # re-evaluate the whole fold
    return F.aggregate(
        shingles,
        init,
        lambda acc, sh: F.struct(
            *[
                F.least(
                    acc[nm],
                    _md5(F.concat_ws(":", F.lit(str(i)), sh)),
                ).alias(nm)
                for i, nm in enumerate(names)
            ]
        ),
        lambda acc: F.concat_ws(",", *[acc[nm] for nm in names]),
    )


def stream_dedup_minhash(
    stream: DataFrame,
    watermark: str = "1 hour",
    n: int = 3,
    num_hashes: int = 8,
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming NEAR-duplicate filter: drop rows whose FULL MinHash
    signature was seen inside the watermark horizon.

    Full-signature equality is the precision-biased end of the LSH
    family (one band of ``num_hashes`` rows): a pair with Jaccard J
    collides with probability J^num_hashes, so unrelated docs are
    essentially never dropped while near-identical docs (boilerplate
    re-crawls, whitespace/ordering variants that perturb a few
    shingles) collapse with probability ≈ J^8.  Recall-oriented banded
    matching needs cross-row candidate joins — that is the batch
    ``lsh_candidate_pairs`` path; this operator is the streaming
    ingest guard in front of it.  State is bounded by the horizon
    exactly like ``stream_dedup_exact``.
    """
    sig = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .withColumn(
            "mh_sig", minhash_signature_col(text_col, n, num_hashes)
        )
    )
    return sig.dropDuplicatesWithinWatermark(["mh_sig"]).drop("mh_sig")
