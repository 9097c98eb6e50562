"""Numeric column profiling: the one-pass data-quality card.

``numeric_profile`` is the Deequ/TFDV-style gauge a pipeline runs on
every numeric column before trusting it — count/null/min/max, an
order-exact mean, and histogram-interpolated quantile ESTIMATES whose
error is bounded by the bin width (never by data order or
partitioning).  Exact distributed quantiles need a full sort or
per-key windows (the documented embedding_norm_stats single-task
shape); the fixed-grid histogram is the mergeable, bounded-state
alternative every monitoring system ships (counts add across
partitions, shards, and days — the sketch property, with a
deterministic construction a SQL oracle can replay bit-for-bit,
unlike rank-randomized KLL).

Plan: one stats aggregate (1 row, broadcast back), one
map-side-combinable groupBy onto ≤ ``bins`` keys, and column algebra
on the bin table.  Nothing is corpus-sized after the first scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DEC = "decimal(28,12)"


def numeric_profile(
    df: DataFrame,
    value_col: str = "value",
    bins: int = 32,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """1 row: (n, n_null, mn, mx, mean, p50, p90, p99, …).

    * ``mean`` sums in decimal(28,12) (order-independent) and rounds
      9 — exact to the printed precision on any partitioning;
    * quantile columns (``p50`` for q=0.5, …) interpolate linearly
      inside the covering histogram bin: with cum counts C_{i-1} < 
      q·n ≤ C_i over equal-width bins on [mn, mx], the estimate is
      ``lo_i + (q·n − C_{i-1}) / c_i · width`` — exact when a bin is
      uniform, ≤ one bin width off otherwise;
    * constant columns (mx = mn) report every quantile = mn; an
      all-NULL or empty column reports NULL stats (no 0/0 errors).

    Values are binned by ``least(bins−1, floor((x−mn)·bins/(mx−mn)))``
    — floor semantics, no ties, same expression in the DuckDB twin.
    """
    if bins < 2:
        raise ValueError("numeric_profile: bins must be >= 2")
    if not quantiles or any(not 0 < q < 1 for q in quantiles):
        raise ValueError(
            "numeric_profile: quantiles must be in (0, 1)"
        )
    x = F.col(value_col).cast("double")
    stats = df.agg(
        F.count(x).cast("long").alias("n"),
        F.coalesce(
            F.sum(F.col(value_col).isNull().cast("int")), F.lit(0)
        )
        .cast("long")
        .alias("n_null"),
        F.round(F.min(x), 9).alias("mn"),
        F.round(F.max(x), 9).alias("mx"),
        F.round(
            F.try_divide(
                F.sum(x.cast(_DEC)).cast("double"), F.count(x)
            ),
            9,
        ).alias("mean"),
    )
    binned = (
        df.where(x.isNotNull())
        .crossJoin(F.broadcast(stats.select("mn", "mx")))
        .select(
            F.when(
                F.col("mx") > F.col("mn"),
                F.least(
                    F.lit(bins - 1),
                    F.floor(
                        (x - F.col("mn"))
                        * bins
                        / (F.col("mx") - F.col("mn"))
                    ),
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = binned.select(
        "bin", "c", F.sum("c").over(w).cast("long").alias("cum")
    ).crossJoin(F.broadcast(stats.select("n", "mn", "mx")))
    qcols = []
    for q in quantiles:
        name = "p" + str(q)[2:].ljust(2, "0")  # 0.5→p50, 0.99→p99
        target = F.lit(q) * F.col("n")
        # the covering bin is UNIQUE: cum is strictly increasing (every
        # histogram row has c > 0) and target in (0, n], so exactly one
        # bin satisfies cum − c < target <= cum — max() just unwraps it
        covering = (F.col("cum") >= target) & (
            (F.col("cum") - F.col("c")) < target
        )
        est = F.when(
            F.col("mx") <= F.col("mn"), F.col("mn")
        ).otherwise(
            F.col("mn")
            + (
                F.col("bin")
                + (target - (F.col("cum") - F.col("c"))) / F.col("c")
            )
            * (F.col("mx") - F.col("mn"))
            / bins
        )
        qcols.append(
            F.max(F.when(covering, F.round(est, 9))).alias(name)
        )
    qrow = cum.agg(*qcols)
    return stats.crossJoin(F.broadcast(qrow))


def k_anonymity(
    df: DataFrame,
    quasi_cols: tuple[str, ...],
    sensitive_col: str | None = None,
    k: int = 5,
) -> DataFrame:
    """(quasi cols…, class_size, [l_diversity,] at_risk): the
    re-identification audit over a release candidate — rows grouped
    by their quasi-identifier combination are an EQUIVALENCE CLASS;
    a class smaller than ``k`` fails k-anonymity (Sweeney 2002: any
    member is re-identifiable by linking those attributes to an
    outside table).  With ``sensitive_col`` set, the class also
    reports its l-diversity (Machanavajjhala et al. 2007: distinct
    sensitive values in the class) and a class is at_risk when EITHER
    it is small OR every member shares one sensitive value
    (l_diversity <= 1 — the homogeneity attack: the attacker needn't
    re-identify the row to learn the secret).

    The caller picks the quasi-identifier columns — and BINS any
    high-cardinality ones first (raw lengths/timestamps make every
    row its own class and the audit trivially fails); the op stays a
    single map-side-combinable groupBy either way, output sized by
    the quasi-identifier domain, not the corpus.  Filter
    ``at_risk`` downstream to drive suppression/generalization.
    """
    if not quasi_cols:
        raise ValueError("k_anonymity: quasi_cols must be non-empty")
    if k < 2:
        raise ValueError("k_anonymity: k must be >= 2")
    aggs = [F.count(F.lit(1)).cast("long").alias("class_size")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col))
            .cast("long")
            .alias("l_diversity")
        )
    out = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)
    risk = F.col("class_size") < k
    if sensitive_col is not None:
        risk = risk | (F.col("l_diversity") <= 1)
    return out.withColumn("at_risk", risk)
