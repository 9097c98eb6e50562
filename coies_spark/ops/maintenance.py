"""Table-maintenance planning: small-file compaction over a file
manifest — the housekeeping half of the north rule's snapshot story.
A KG pipeline that checkpoints every stage into partitioned snapshots
(``pipeline.checkpoint``, ``pipeline.triples``) accretes small files
at exactly the rate it scales: 10⁴ partitions × 10³ incremental
appends = 10⁷ files whose open/seek overhead eventually dominates
scans.  Real table formats (Iceberg's ``rewrite_data_files``, Delta
OPTIMIZE) fix this by grouping small files into target-sized rewrite
tasks; the PLANNER is pure relational work over the manifest and
belongs in the engine even where the format's jar is absent (the
documented Iceberg stand-in, ARCHITECTURE.md).

``compaction_plan`` assigns every under-target file to a rewrite
group within its partition, by offset-chunking the size prefix-sum —
the ``pack_turns`` convention: a group can overflow the target by at
most its last file (the standard streaming approximation of bin
packing, which is NP-hard exactly).  Files already ≥ the target are
excluded (rewriting them is pure churn), as are singleton groups (a
lone small file gains nothing until siblings arrive — rewriting it
would churn every incremental append).

Determinism: files order by (bytes DESC, path) inside a partition —
first-fit-decreasing order, so group fill is near-optimal and the
plan is byte-identical on any engine/partitioning.

Scale: ONE window pass keyed on the table partition (manifests are
small relative to data — 10⁷ files is a few GB — but nothing here
assumes they fit anywhere: the window shuffles by partition key and
streams).  No collect, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def compaction_plan(
    manifest: DataFrame,
    target_bytes: int,
    partition_col: str = "partition",
    path_col: str = "path",
    size_col: str = "bytes",
) -> DataFrame:
    """(part, path, bytes, group_id, group_files, group_bytes):
    the rewrite work-list — every under-target file, assigned to the
    rewrite group (part, group_id) whose members one compaction
    task concatenates into ~``target_bytes``.  Groups with a single
    member are dropped (no-op rewrites).  See module docstring for
    ordering/overflow semantics.
    """
    if target_bytes < 1:
        raise ValueError("compaction_plan: target_bytes must be >= 1")
    small = manifest.select(
        F.col(partition_col).alias("part"),
        F.col(path_col).alias("path"),
        F.col(size_col).cast("long").alias("bytes"),
    ).where(F.col("bytes") < target_bytes)
    w = (
        Window.partitionBy("part")
        .orderBy(F.col("bytes").desc(), F.col("path"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grouped = small.withColumn(
        "group_id",
        F.floor(
            F.coalesce(F.sum("bytes").over(w), F.lit(0))
            / F.lit(target_bytes)
        ).cast("long"),
    )
    gw = Window.partitionBy("part", "group_id")
    return (
        grouped.withColumn(
            "group_files", F.count(F.lit(1)).over(gw).cast("long")
        )
        .withColumn("group_bytes", F.sum("bytes").over(gw).cast("long"))
        .where(F.col("group_files") >= 2)
    )


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> DataFrame:
    """Input + ``zkey``: the Morton (Z-order) interleaving of the
    given integer columns — the multi-dimensional sort key behind
    Iceberg's/Delta's Z-ORDER table layout.  Sorting (or
    range-partitioning) files by ``zkey`` clusters rows that are
    close in EVERY dimension into the same files, so min/max file
    statistics prune scans filtered on ANY of the dimensions — the
    data-skipping property a single-column sort only provides for
    its leading column.  The write-side complement of
    :func:`compaction_plan`: compaction decides WHICH files to
    rewrite, Z-ordering decides the ROW ORDER inside the rewrite.

    Determinism (so the key is oracle-checkable and stable across
    engines): each column is normalized to ``bits`` bits by EXACT
    integer arithmetic against the column's in-plan min/max —
    ``(v − min) · (2^bits − 1) DIV (max − min)`` (constant columns
    map to 0) — then bit b of every normalized column interleaves
    into bit ``b·k + i`` of the key (column i of k).  No floats, no
    sampling — unlike ``repartitionByRange`` (whose sampled
    boundaries vary run-to-run), the KEY is bit-exact; production
    writes then ``repartitionByRange(zkey).sortWithinPartitions
    (zkey)``, where boundary sampling only moves file splits, never
    row order.

    ``bits·k`` must fit a signed 64-bit key (≤ 62); 16 bits × 2-3
    dims is the standard layout resolution (file-level stats don't
    benefit from finer).  One in-plan broadcast min/max agg, then a
    pure projection — zero shuffles.
    """
    k = len(cols)
    if k < 2:
        raise ValueError("zorder_key: need >= 2 columns")
    if bits * k > 62:
        raise ValueError("zorder_key: bits * len(cols) must be <= 62")
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("long")).alias(f"__mn_{c}"))
        aggs.append(F.max(F.col(c).cast("long")).alias(f"__mx_{c}"))
    ranges = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(ranges))
    z: Column = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        span = F.col(f"__mx_{c}") - F.col(f"__mn_{c}")
        # integer DIV (Spark's / on longs is float division); the
        # (v-min)·(2^bits−1) product wants span < 2^47 — ANSI mode
        # errors loudly on a wider span rather than wrapping
        norm = F.when(
            span > 0,
            F.expr(
                f"(CAST(({c} - __mn_{c}) AS BIGINT)"
                f" * {(1 << bits) - 1}) DIV (__mx_{c} - __mn_{c})"
            ),
        ).otherwise(F.lit(0).cast("long"))
        for b in range(bits):
            bit = F.shiftright(norm, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(
                F.shiftleft(bit.cast("long"), b * k + i)
            )
    return out.select(*df.columns, z.alias("zkey"))


def snapshot_expiry(
    snapshots: DataFrame,
    retain_last: int = 3,
    retain_s: int = 7 * 24 * 3600,
    now=None,
) -> DataFrame:
    """(table_name, snapshot_id, action, reason): the expire-snapshots
    plan — which checkpoint snapshots the versioned store may drop,
    and why each survivor survives.  Iceberg's
    ``expire_snapshots(older_than, retain_last)`` semantics: a
    snapshot is RETAINED iff it is (in precedence order, which fixes
    ``reason`` deterministically)

    1. ``ref``     — referenced by a branch/tag head (non-null
                     ``ref`` column): never expirable,
    2. ``last_n``  — among the ``retain_last`` most recent snapshots
                     of its table (committed_at DESC, snapshot_id
                     DESC tiebreak), or
    3. ``recent``  — committed within ``retain_s`` of ``now``
                     (half-open: ``committed_at > now − retain_s``).

    Everything else is ``action='expire'`` (reason NULL) — the
    work-list the GC pass feeds on.  ``now`` may be a plain epoch int
    or a 1-row/1-column DataFrame (e.g. the in-plan corpus max), the
    ``kg_at_time`` convention, so the whole plan stays declarative.

    Scale: one window pass keyed on table_name (the recency rank) +
    pure filters; manifests are metadata-sized but nothing assumes a
    single task — the window shuffles by table and streams.  The
    resumable pipeline (``pipeline.checkpoint``) keeps every stage
    snapshot forever by default; this planner is its GC policy face.
    """
    if retain_last < 1:
        raise ValueError("snapshot_expiry: retain_last must be >= 1")
    if isinstance(now, DataFrame):
        frame = snapshots.crossJoin(
            F.broadcast(
                now.select(
                    F.col(now.columns[0]).cast("long").alias("__now")
                )
            )
        )
        now_col = F.col("__now")
    else:
        if now is None:
            raise ValueError(
                "snapshot_expiry: now must be an epoch int or a "
                "1-row DataFrame"
            )
        frame = snapshots
        now_col = F.lit(int(now)).cast("long")
    w = Window.partitionBy("table_name").orderBy(
        F.desc("committed_at"), F.desc("snapshot_id")
    )
    ranked = frame.withColumn("__rk", F.row_number().over(w))
    reason = (
        F.when(F.col("ref").isNotNull(), "ref")
        .when(F.col("__rk") <= retain_last, "last_n")
        .when(
            F.col("committed_at") > now_col - F.lit(retain_s), "recent"
        )
    )
    return ranked.select(
        "table_name",
        "snapshot_id",
        F.when(reason.isNotNull(), "retain")
        .otherwise("expire")
        .alias("action"),
        reason.alias("reason"),
    )


def _quantile_order_buckets(
    sized: DataFrame, n_buckets: int
) -> DataFrame:
    """(__id, __sz) + ``__bkt``: order-preserving bucket label from
    the B-quantile boundaries of ``__id`` (``percentile_approx``).
    Every bucket's ids sit strictly between its neighbours' (equal
    ids always share a bucket), so per-bucket cumsums compose into a
    global one; quantile boundaries keep buckets ~equal-sized even
    for gappy/clustered id spaces, and the arithmetic never
    multiplies the id (a value-range split's ``id·B`` wrapped for
    near-2^63 hashed ids).  Split out of
    :func:`exclusive_prefix_sum` so the balance property is directly
    testable.
    """
    if n_buckets == 1:
        return sized.select(
            "__id", "__sz", F.lit(0).cast("long").alias("__bkt")
        )
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bnds = sized.agg(
        F.percentile_approx("__id", qs, 10_000).alias("__bnds")
    )
    return sized.crossJoin(F.broadcast(bnds)).select(
        "__id",
        "__sz",
        F.aggregate(
            "__bnds",
            F.lit(0).cast("long"),
            lambda acc, b: acc
            + F.when(b <= F.col("__id"), F.lit(1).cast("long"))
            .otherwise(F.lit(0).cast("long")),
        ).alias("__bkt"),
    )


def exclusive_prefix_sum(
    df: DataFrame,
    id_col: str,
    size_col: str,
    n_buckets: int = 32,
) -> DataFrame:
    """(id_col, size_col, prev): the global EXCLUSIVE prefix sum of
    ``size_col`` over ``id_col`` ascending, computed the two-phase
    scan way (order-preserving range buckets → parallel local
    cumsums → B-row offset table broadcast back) so no step sorts
    the corpus on one task.  Shared by :func:`shard_plan` and the
    document packer (`ops.lm.pack_documents`); the oracle of each
    consumer is the naive single-window definition, so every green
    gate re-proves the decomposition.

    Bucket boundaries are the B-quantiles of the id column
    (``percentile_approx``), NOT a value-range split of
    [0, max_id]: quantiles stay balanced under gappy id spaces
    (snowflake-style ids, post-delete compaction — where a value
    split concentrates rows in few buckets and recreates the
    local-cumsum straggler this decomposition exists to avoid) and
    involve no ``id * B`` multiply, which silently wrapped for
    near-2^63 hashed ids.  The OUTPUT is bucketing-invariant — any
    order-preserving boundary set yields the same prefix sums — so
    the sketch's approximation affects balance only, never values;
    negative ids are fine.
    """
    if n_buckets < 1:
        raise ValueError("exclusive_prefix_sum: n_buckets must be >= 1")
    id_type = dict(df.dtypes).get(id_col, "")
    if id_type not in ("tinyint", "smallint", "int", "bigint", "long"):
        raise TypeError(
            f"exclusive_prefix_sum: {id_col!r} must be an integer "
            f"column (got {id_type or 'missing'}) — a string id would "
            "cast to NULL and silently join away every row; hash or "
            "zip ids to integers first"
        )
    sized = df.select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(size_col).cast("long").alias("__sz"),
    )
    bucketed = _quantile_order_buckets(sized, n_buckets)
    w_local = (
        Window.partitionBy("__bkt")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn("__cum", F.sum("__sz").over(w_local))
    w_bkt = (
        Window.orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        bucketed.groupBy("__bkt")
        .agg(F.sum("__sz").alias("__tot"))
        .select(
            "__bkt",
            (F.sum("__tot").over(w_bkt) - F.col("__tot")).alias(
                "__off"
            ),
        )
    )
    return (
        local.join(F.broadcast(offsets), "__bkt")
        .select(
            F.col("__id").alias(id_col),
            F.col("__sz").alias(size_col),
            (F.col("__off") + F.col("__cum") - F.col("__sz")).alias(
                "prev"
            ),
        )
    )


def shard_plan(
    docs: DataFrame,
    target_bytes: int,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    n_buckets: int = 32,
) -> DataFrame:
    """(doc_id, bytes, shard_id): assign every document to a
    fixed-size output shard — contiguous in ``id_col`` order, each
    shard packed to ~``target_bytes`` (overflow bounded by one
    document, the ``compaction_plan``/``pack_turns`` streaming
    bin-packing convention).  This is the WebDataset/TFRecord shard
    builder's planning step: training loaders want shards of equal
    byte weight so data-parallel readers finish together, and
    contiguity in id order keeps the plan stable under re-runs
    (shard k always holds the same documents — resumable writes).

    shard_id = floor(prefix_sum_exclusive(bytes) / target), i.e. the
    global running total BEFORE each doc, over ids ascending.  A
    naive global window is a single-task sort at 10^10 docs, so the
    prefix sum is computed the two-phase scan way instead:

    1. order-preserving QUANTILE bucketing — B-quantile boundaries of
       the id column (one tiny sketch aggregate, broadcast back) keep
       every bucket's ids between its neighbours' (unlike hash
       bucketing) AND balanced under gappy id spaces (unlike a
       value-range split);
    2. per-bucket local prefix sums in parallel (window keyed by
       bucket — B-way parallel, never global);
    3. bucket totals (B rows) get their own exclusive prefix sum on
       one trivially small task, and the offsets broadcast-join back.

    The DuckDB twin is the NAIVE single-window definition, so the
    oracle match IS the proof that the two-phase decomposition equals
    the global scan.
    """
    if target_bytes < 1:
        raise ValueError("shard_plan: target_bytes must be >= 1")
    ps = exclusive_prefix_sum(
        docs.select(F.col(id_col), F.col(size_col).alias("bytes")),
        id_col,
        "bytes",
        n_buckets,
    )
    return ps.select(
        id_col,
        "bytes",
        F.floor(F.col("prev") / target_bytes).cast("long").alias(
            "shard_id"
        ),
    )


def _shard_digest_col(digest_cols: list[str]) -> Column:
    """Order-independent 32-bit-md5-summand content digest — the
    engine's `_triple_digest` convention (map-side aggregable; int64
    headroom to ~2^31 rows/shard)."""
    return F.conv(
        F.substring(
            F.md5(
                F.encode(
                    F.concat_ws(
                        "\x1f",
                        *[F.col(c).cast("string") for c in digest_cols],
                    ),
                    "utf-8",
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")


def write_shards(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    target_bytes: int,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    digest_cols: list[str] | None = None,
    n_buckets: int = 32,
    shard_ids: list[int] | None = None,
) -> DataFrame:
    """EXECUTE a :func:`shard_plan`: write the documents as
    ``partitionBy(shard_id)`` parquet under ``path`` plus one
    manifest row per shard — (shard_id, n_rows, bytes, digest_sum) —
    the WebDataset/TFRecord-style shard builder's write step, and the
    last link of the curate → pack → shard story.  Returns the
    manifest read back from disk.

    * **Full runs replace the dataset**: with ``shard_ids=None`` the
      plan IS the complete dataset, so data and manifest write with
      a plain (static) overwrite — a re-run with a DIFFERENT plan
      (larger ``target_bytes``, fewer documents) leaves no stale
      shard partitions behind.  An earlier dynamic-overwrite version
      kept old shards the new plan no longer produced: the read-back
      manifest then reported them as live and every re-packed
      document existed twice on disk, with :func:`verify_shards`
      blessing the duplication (manifest and files agreed on the
      same stale content).
    * **Resume**: pass ``shard_ids`` to (re)write only those shards
      with the write-scoped dynamic partition overwrite
      (``refresh_triple_partitions``' pattern — no session-global
      conf mutation); the plan is contiguous in id order, so shard k
      always holds the same documents — a crashed run resumes by
      writing the missing partitions and the untouched ones stay
      byte-identical (pinned by test).  Resume assumes the SAME
      plan as the interrupted run (same target/corpus); a changed
      plan needs a full run.
    * **Manifest**: ``bytes`` is the plan's size column summed per
      shard (logical payload bytes — the quantity the plan balanced),
      ``digest_sum`` the order-independent md5-summand digest over
      ``digest_cols`` (default: id + size columns), so
      :func:`verify_shards` can audit manifest-vs-files without any
      ordering assumption.

    Scale: the plan is the two-phase prefix sum; the write adds ONE
    id equi-join (docs × plan) and a ``partitionBy`` shuffle-free
    file write (each task writes the shards its rows land in —
    contiguous ids cluster shards per task under the bucketed
    layout); the manifest is a shards-many-row aggregate.
    """
    plan = shard_plan(
        docs, target_bytes, id_col, size_col, n_buckets
    )
    data = docs.join(plan.select(id_col, "shard_id"), id_col)
    if shard_ids is not None:
        if not shard_ids:
            raise ValueError(
                "write_shards: shard_ids must be non-empty when given"
            )
        data = data.where(
            F.col("shard_id").isin([int(s) for s in shard_ids])
        )
    dcols = (
        list(digest_cols)
        if digest_cols is not None
        else [id_col, size_col]
    )
    def _write(df: DataFrame, sub: str) -> None:
        w = df.write.mode("overwrite")
        if shard_ids is not None:
            # resume: touch only the requested partitions
            w = w.option("partitionOverwriteMode", "dynamic")
        w.partitionBy("shard_id").parquet(f"{path}/{sub}")

    _write(data, "data")
    written = spark.read.parquet(f"{path}/data").where(
        F.col("shard_id").isin([int(s) for s in shard_ids])
        if shard_ids is not None
        else F.lit(True)
    )
    manifest = written.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col(size_col).cast("long")).alias("bytes"),
        F.sum(_shard_digest_col(dcols)).alias("digest_sum"),
    )
    _write(manifest, "manifest")
    return spark.read.parquet(f"{path}/manifest").select(
        "shard_id", "n_rows", "bytes", "digest_sum"
    )


def verify_shards(
    spark: SparkSession,
    path: str,
    size_col: str = "n_chars",
    digest_cols: list[str] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """(shard_id, n_rows, bytes, digest_sum, data_rows, data_bytes,
    data_digest, ok): byte-accounting audit of a :func:`write_shards`
    output — recompute every manifest quantity from the data files
    and compare.  ``ok`` is true iff rows, bytes, and digest all
    match; a shard present in only one side surfaces as a NULL row
    (full outer join), never silently passes.  One scan of the data
    files + a shards-many-row join."""
    dcols = (
        list(digest_cols)
        if digest_cols is not None
        else [id_col, size_col]
    )
    recomputed = (
        spark.read.parquet(f"{path}/data")
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("data_rows"),
            F.sum(F.col(size_col).cast("long")).alias("data_bytes"),
            F.sum(_shard_digest_col(dcols)).alias("data_digest"),
        )
    )
    manifest = spark.read.parquet(f"{path}/manifest").select(
        "shard_id", "n_rows", "bytes", "digest_sum"
    )
    joined = manifest.join(recomputed, "shard_id", "full_outer")
    ok = (
        (F.col("n_rows") == F.col("data_rows"))
        & (F.col("bytes") == F.col("data_bytes"))
        & (F.col("digest_sum") == F.col("data_digest"))
    )
    return joined.withColumn("ok", F.coalesce(ok, F.lit(False)))
