"""Mergeable sketch summaries: HyperLogLog distinct counting and
Count-Min frequency estimation.

Reference scope: the reference engine (ling60/coies) keeps corpus
gauges exact because its corpora are single-node sized (e.g. the
dictionary/vocabulary counts in aaer_corpus.py); at the 10¹²-turn
design point the exact gauges stay affordable for *keyed* outputs
(groupBy is linear) but NOT for ad-hoc distinct-count and
frequency probes over many dimensions at once — there the classic
mergeable summaries (Flajolet et al. 2007 HyperLogLog; Cormode &
Muthukrishnan 2005 Count-Min) are the standard answer: tiny register
tables that union across partitions, days, and corpus snapshots with
a plain ``max``/``sum`` groupBy, so yesterday's sketch never needs
yesterday's data again.

Engine-exact by construction
----------------------------
Both sketches here are DETERMINISTIC INTEGER pipelines: hashes are
md5-derived (hex → bigint, the repo-wide convention), HLL's rank-of-
first-one-bit comes from ``length(bin(x))`` (identical in Spark and
DuckDB — no float log2), and all register updates are
``max``/``sum`` aggregates — commutative-associative, map-side
combinable, order- and partitioning-independent.  The ONLY floats
are in the final 1-row HLL estimate expression, computed from an
exactly-summed integer and rounded — so every register table and
every estimate is bit-identical across engines and the DuckDB
oracles check them end-to-end (most sketch libraries can't be
oracle-tested at all because their hashes and float folds are
implementation-defined).

Streaming
---------
The register builds are plain ``max``/``sum`` groupBys over
register-key columns, so they run UNCHANGED as Structured Streaming
aggregations in complete/update output mode — and unlike most
streaming aggregations they need NO watermark: sketch state is
bounded by construction (≤ 2^p / depth·width rows) no matter how
unbounded the stream, which is precisely why sketches are the
standard continuous-gauge answer.  Batch ≡ streaming register
equality is pinned in tests/test_streaming.py.

Scale design
------------
A sketch's register table is O(2^p) / O(d·w) rows regardless of
input size; the build is one map-side-combinable groupBy (the
shuffle carries at most one partial register row per map partition).
Merging two corpora's sketches is the same groupBy over the unioned
register tables — the streaming/backfill/rollup story at 100 TB.
Accuracy: HLL standard error ≈ 1.04/√(2^p) (p=12 → ~1.6%); CMS
over-estimates by at most ε·N with probability 1-δ for w = ⌈e/ε⌉,
d = ⌈ln(1/δ)⌉.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex32(col: Column, lo: bool = False) -> Column:
    """bigint from the first (or second) 32 bits of md5(col)."""
    start = 9 if lo else 1
    return F.conv(
        F.substring(F.md5(F.encode(col.cast("string"), "utf-8")), start, 8),
        16,
        10,
    ).cast("long")


def hll_registers(
    df: DataFrame, key: str | Column, p: int = 12
) -> DataFrame:
    """(bucket, max_rho): the 2^``p``-register HyperLogLog table for
    the distinct values of ``key`` — bucket from the first 32 md5
    bits, rho = 1 + leading-zero-count of the second 32 bits
    (``33 - length(bin(lo))``, with lo=0 pinned to rho=33).

    Only touched buckets materialize (absent bucket ≡ max_rho 0);
    ``hll_estimate`` accounts for the missing zeros.  The build is
    one map-side-combinable ``max`` groupBy over ≤ 2^p keys — the
    shuffle is register-sized, never data-sized — and two register
    tables union-merge with the same groupBy (sketch unions are the
    cross-day/cross-snapshot rollup path).
    """
    if not 4 <= p <= 18:
        raise ValueError("hll_registers: p must be in [4, 18]")
    k = F.col(key) if isinstance(key, str) else key
    hi = _hex32(k)
    lo = _hex32(k, lo=True)
    rho = F.when(lo == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.bin(lo))
    )
    return (
        df.select(
            (hi % (1 << p)).alias("bucket"), rho.cast("int").alias("rho")
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame, p: int = 12) -> DataFrame:
    """1 row (estimate, n_buckets): the bias-corrected HLL distinct
    estimate from a register table (buckets absent from the table
    count as empty).

    Determinism: Z = Σ 2^(-max_rho) is summed as the INTEGER
    Σ 2^(33-max_rho) (max_rho ≤ 33, so every term is exact and the
    int64 sum is order-independent; empty buckets contribute 2^33
    each), then the α_m·m²/Z estimate and the small-range
    linear-counting correction (E ≤ 2.5m with empty buckets →
    m·ln(m/V)) are ONE float expression over that single exact
    integer — rounded to 4 dp, bit-stable on any engine or
    partitioning.  p ≤ 18 keeps the scaled sum ≤ 2^51.
    """
    if not 4 <= p <= 18:
        raise ValueError("hll_estimate: p must be in [4, 18]")
    m = 1 << p
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    agg = registers.agg(
        # shiftleft's bit count must be a column here: SQL form (the
        # Python API only accepts an int literal)
        # coalesce: an EMPTY register table sums to NULL; 0 routes the
        # estimate into the linear-counting branch, which returns the
        # correct m·ln(m/m) = 0
        F.coalesce(
            F.sum(
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(33 - max_rho AS INT))"
                )
            ),
            F.lit(0).cast("long"),
        ).alias("s_used"),
        F.count(F.lit(1)).alias("n_used"),
    )
    s_total = F.col("s_used") + (F.lit(m) - F.col("n_used")) * F.lit(
        1 << 33
    ).cast("long")
    zeros = F.lit(m) - F.col("n_used")
    raw = F.lit(alpha * m * m * float(1 << 33)) / s_total
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(
        F.round(est, 4).alias("estimate"),
        F.col("n_used").cast("long").alias("n_buckets"),
    )


def cms_registers(
    df: DataFrame,
    key: str | Column,
    weight: Column | None = None,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(row, col, cnt): the depth×width Count-Min register table for
    the ``key`` stream — row i hashes the key with md5 domain
    separation (``i || ':' || key``), registers accumulate ``weight``
    (default 1).

    Pure integer build, one map-side-combinable SUM groupBy over
    ≤ depth·width register keys; two tables union-merge with the
    same groupBy.  Only touched registers materialize.
    """
    if depth < 1 or width < 1:
        raise ValueError("cms_registers: depth and width must be >= 1")
    k = F.col(key) if isinstance(key, str) else key
    w = F.lit(1).cast("long") if weight is None else weight.cast("long")
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        (
                            _hex32(
                                F.concat(F.lit(f"{i}:"), k.cast("string"))
                            )
                            % width
                        ).alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rc"),
        w.alias("w"),
    )
    return (
        rows.select("rc.row", "rc.col", "w")
        .groupBy("row", "col")
        .agg(F.sum("w").alias("cnt"))
    )


def cms_query(
    registers: DataFrame,
    probes: DataFrame,
    key: str = "key",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(key, est): point-frequency estimates for each probe key —
    ``min`` over the key's ``depth`` registers (the Count-Min
    guarantee: est ≥ true count, over by ≤ εN w.h.p.).

    The probe explodes to ``depth`` rows, LEFT-joins the register
    table (broadcast — ≤ depth·width rows by construction; absent
    register ≡ 0), and folds back with ``min`` — the register table
    is the only corpus-derived input, so querying never rescans the
    stream.
    """
    k = F.col(key)
    exploded = probes.select(
        k.alias("key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        (
                            _hex32(
                                F.concat(F.lit(f"{i}:"), k.cast("string"))
                            )
                            % width
                        ).alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rc"),
    ).select("key", "rc.row", "rc.col")
    joined = exploded.join(F.broadcast(registers), ["row", "col"], "left")
    return joined.groupBy("key").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est")
    )


def histogram_registers(
    values: DataFrame,
    value_col: str = "value",
    n_bins: int = 64,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """(bin, lo, hi, n): the fixed-grid histogram sketch — the
    QUANTILE member of the mergeable-summary family (HLL distinct,
    CMS frequency, Bloom membership, and now rank/quantile).  ≤
    ``n_bins`` register rows regardless of input size; one map-side-
    combinable groupBy; two sketches over the SAME grid merge with a
    plain ``groupBy(bin).sum(n)`` — the streaming/backfill/rollup
    story, and why ``approx_percentile`` (whose GK state is neither
    mergeable-as-a-table nor engine-portable) is not enough.

    * grid: pass ``lo``/``hi`` explicitly for the mergeable path
      (fixed grid agreed across days/streams — the sketch contract);
      leave None to take them from the data (one extra 1-row agg
      scan, exact min/max, NOT mergeable with other grids);
    * bin = clamp(floor((x - lo)/(hi - lo) · n_bins), 0, n_bins-1):
      doubles with fixed op order, engine-identical; out-of-range
      values clamp into the edge bins (the honest convention — they
      stay counted, and the edge-bin error is bounded by the grid
      choice);
    * every register row CARRIES its full grid (lo, hi, n_bins):
      merging mismatched grids then fails loudly as distinct grid
      groups instead of silently corrupting counts, and the quantile
      face reads the bin count FROM the registers — a caller can no
      longer query a 32-bin sketch as if it were 64 bins (which
      would silently halve every estimate).

    Degenerate grid (hi == lo, e.g. constant column): everything
    lands in bin 0 and quantile estimates collapse to ``lo`` — exact.
    """
    if n_bins < 1:
        raise ValueError("histogram_registers: n_bins must be >= 1")
    x = F.col(value_col).cast("double")
    v = values.select(x.alias("__x")).where(F.col("__x").isNotNull())
    if lo is None or hi is None:
        bounds = v.agg(
            F.min("__x").alias("__lo"), F.max("__x").alias("__hi")
        )
        v = v.crossJoin(F.broadcast(bounds))
    else:
        v = v.select(
            "__x",
            F.lit(float(lo)).alias("__lo"),
            F.lit(float(hi)).alias("__hi"),
        )
    raw = F.floor(
        (F.col("__x") - F.col("__lo"))
        / (F.col("__hi") - F.col("__lo"))
        * F.lit(n_bins)
    )
    b = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), raw))
    )
    return (
        v.select(
            b.cast("long").alias("bin"),
            F.col("__lo").alias("lo"),
            F.col("__hi").alias("hi"),
            F.lit(int(n_bins)).cast("long").alias("n_bins"),
        )
        .groupBy("bin", "lo", "hi", "n_bins")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def histogram_quantiles(
    registers: DataFrame, qs: list[float]
) -> DataFrame:
    """(q, estimate, err_bound): quantile estimates from a histogram
    sketch — rank r = ceil(q·N) located in the cumulative register
    table, linearly interpolated inside its bin; ``err_bound`` is the
    bin width, the sketch's honest worst case (the true q-quantile
    lies in the same bin).

    The grid — including the bin count — is read FROM the registers
    (every row carries lo/hi/n_bins), so the query face can never
    disagree with the build face about the grid: an earlier version
    took ``n_bins`` as an independent parameter, and a 32-bin sketch
    queried with the default 64 silently halved every estimate.

    The registers frame is register-sized by construction, so the
    cumulative window and the per-quantile lookup are register-sized
    work — querying never touches the original data (the CMS-query
    property).  All arithmetic is doubles with fixed op order over
    exactly-summed longs, round 6 at the edge — engine-identical.
    """
    if not qs:
        raise ValueError("histogram_quantiles: qs must be non-empty")
    if any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError("histogram_quantiles: each q must be in (0, 1]")
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    spark = registers.sparkSession
    cum = registers.select(
        "bin",
        "lo",
        "hi",
        "n_bins",
        "n",
        F.sum("n").over(w).alias("cum"),
    )
    tot = registers.agg(F.sum("n").cast("long").alias("total"))
    probes = spark.createDataFrame(
        [(float(q),) for q in sorted(qs)], "q double"
    )
    width = (F.col("hi") - F.col("lo")) / F.col("n_bins")
    # rank of the q-quantile (1-based); the first bin whose cumsum
    # reaches it wins (min bin — a pinned total order)
    r = F.ceil(F.col("q") * F.col("total")).cast("long")
    hits = (
        probes.crossJoin(F.broadcast(tot))
        .join(cum, F.col("cum") >= r)
        .groupBy("q", "total")
        .agg(F.min("bin").alias("bin"))
        .join(cum, ["bin"])
    )
    est = F.col("lo") + width * (
        F.col("bin")
        + (r - (F.col("cum") - F.col("n"))) / F.col("n")
    )
    return hits.select(
        "q",
        F.round(
            F.when(F.col("hi") == F.col("lo"), F.col("lo")).otherwise(est),
            6,
        ).alias("estimate"),
        F.round(
            F.when(F.col("hi") == F.col("lo"), F.lit(0.0)).otherwise(width),
            6,
        ).alias("err_bound"),
    )
