"""Bucketed transcript storage: the shuffle-free flagship input path.

The production design point (BASELINE.json input_hint) is an Iceberg
table of transcripts partitioned with the ``bucket(N, conv_id)``
transform.  Every flagship stage keys on ``conv_id`` — turn assembly
(groupBy), the raw↔tagged twin join, entity-link joins — so with the
input pre-clustered by ``conv_id`` none of them needs an exchange: at
10^12 turns the ONLY shuffle in the extraction pipeline disappears.

The sandbox profile carries no Iceberg runtime jar, so this module
provides the exchange-elimination property with Spark's native
(Hive-style) bucketing, which Catalyst treats the same way: a bucketed
scan reports ``HashPartitioning(conv_id, N)``, which satisfies the
``ClusteredDistribution`` required by aggregates and joins on
``conv_id``.  ``tests/test_bucketed.py`` asserts the property on the
physical plan: zero ``Exchange`` nodes in raw+tagged assembly over
bucketed tables (vs 2-3 over plain parquet), byte-identical results.

On an Iceberg deployment the same guarantee comes from
``CREATE TABLE ... PARTITIONED BY (bucket(N, conv_id))`` plus
storage-partitioned joins (``spark.sql.sources.v2.bucketing.enabled``,
Spark 3.3+, SPARK-37375); both sides of a join must use the same N,
which `write_bucketed_transcripts` defaults centrally for that reason.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 64

TRANSCRIPT_SORT = ("conv_id", "turn_idx")


def write_bucketed_transcripts(
    transcripts: DataFrame,
    table: str,
    buckets: int = DEFAULT_BUCKETS,
    path: Optional[str] = None,
    mode: str = "overwrite",
) -> None:
    """Persist a transcripts frame clustered by ``conv_id``.

    ``bucketBy(buckets, conv_id)`` fixes the layout the flagship reads;
    ``sortBy(conv_id, turn_idx)`` additionally orders turns within each
    bucket file so assembly's per-conversation sort is a near-no-op and
    scans stream conversations contiguously.  ``path`` makes the table
    external (used by tests to keep data in a temp dir); the catalog
    entry records the bucket spec either way.
    """
    writer = (
        transcripts.write.format("parquet")
        .mode(mode)
        .bucketBy(buckets, TRANSCRIPT_SORT[0])
        .sortBy(*TRANSCRIPT_SORT)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_transcripts(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed transcripts table.

    A plain ``spark.table`` — the bucket metadata rides along from the
    catalog; downstream ``groupBy("conv_id")`` / joins on ``conv_id``
    then plan without an exchange (asserted in tests/test_bucketed.py).
    """
    return spark.table(table)
