"""Skew-handling primitives: salted joins and two-phase aggregation.

Hot entities (one company mentioned in a large fraction of
conversations — the synth corpus's ``hot_mention`` knob) make the join
and agg keys head-heavy at 10^12-turn scale.  AQE's skew-join split
handles the join case at runtime; these helpers make the mitigation
explicit and deterministic where we want it regardless of runtime
statistics (north_rule: "salted aggregation for head-heavy
predicates").

Correctness property (tested): salted results == unsalted results.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, buckets: int) -> Column:
    # Salt derived from the FULL row content — genuinely deterministic:
    # the same row hashes to the same bucket on any recomputation.
    # monotonically_increasing_id/rand would scatter better but are
    # recompute-nondeterministic, and a nondeterministic shuffle key is
    # the SPARK-23207 correctness hazard (a retried map task re-salts
    # rows that surviving reducers already fetched → lost/duplicated
    # rows).  Rows identical in EVERY column share a bucket; for counts
    # those collapse in the map-side partial combine anyway, and real
    # fact rows carry distinguishing columns.
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]),
        F.lit(buckets),
    ).cast("int")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    buckets: int = 8,
    how: str = "left",
) -> DataFrame:
    """Equi-join robust to hot keys on the fact side.

    The dim side is exploded ``buckets``× with an explicit salt column;
    the fact side gets a deterministic salt in [0, buckets).  Joining on
    (key, salt) splits each hot key's rows across ``buckets`` tasks.
    Use when ``dim`` is too large to broadcast but small enough to
    replicate ``buckets``×; otherwise prefer ``F.broadcast``.

    Only ``inner`` and ``left`` joins are valid: any dim-preserving
    type (right/full/semi from the dim side) would return each
    unmatched dim key once per salt replica.

    Known limitation (shared with ``salted_count``): the deterministic
    salt hashes the FULL row, so fact rows that are byte-identical in
    every column land in the SAME bucket — a hot key whose rows are
    exact duplicates regains a single-task straggler.  Real fact rows
    carry distinguishing columns (ids/timestamps); if yours don't,
    persist a stable row id first and it will enter the salt hash.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the exploded dim "
            "side would multiply unmatched dim keys by `buckets`; use "
            "'inner' or 'left'"
        )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    salted_fact = fact.withColumn("__salt", _salt_col(fact, buckets))
    out = salted_fact.join(salted_dim, [on, "__salt"], how)
    return out.drop("__salt")


def salted_count(
    df: DataFrame, keys: Sequence[str], buckets: int = 16
) -> DataFrame:
    """Two-phase count for head-heavy keys: partial count per
    (keys, salt), then final sum per keys.  Equivalent to
    ``df.groupBy(*keys).count()`` (Spark's hash agg already does
    partial map-side combine; the explicit salt additionally bounds
    the reduce-side width of any single hot key)."""
    partial = (
        df.withColumn("__salt", _salt_col(df, buckets))
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return (
        partial.groupBy(*keys)
        .agg(F.sum("__partial").cast("long").alias("count"))
    )
