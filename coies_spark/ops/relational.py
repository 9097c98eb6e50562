"""Relational / windowed operators: the reusable DataFrame form of the
reference's ranking primitives plus span-assembly patterns.

* ``top_group_df`` — the adaptive top-cluster cut (reference
  ``get_top_group``, /root/reference/common/utilities.py:64-82) as a
  windowed DataFrame transform: threshold filter → desc sort → keep the
  prefix while each consecutive gap < average gap.  Pure window
  functions; one shuffle on the group key.  Exactly mirrors
  ``core.ranking.top_group`` (property-tested against it).
* ``sessionize`` — gap-based span assembly over an event stream (the
  windowed span-id trick also used for entity spans, SURVEY.md §2.2
  P5): ``new = gap > timeout``, ``span_id = running sum(new)``.
* ``rouge1_pairs`` — ROUGE-1 P/R/F(α=0.5) between document pairs as a
  clipped-unigram-overlap aggregation (reference
  common/rougescore.py:7-54): explode unigram counts, inner join,
  Σ min(c_peer, c_model).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.tokenize import tokens_col


def top_group_df(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    tiebreak_col: str,
    threshold: Optional[float] = None,
) -> DataFrame:
    """Keep, per group, the adaptive top cluster by ``value_col``.

    Semantics (parity with core.ranking.top_group / utilities.py:64-82,
    both reference quirks included): a ≤1-row group passes through
    unfiltered; the threshold filter fires only when the threshold is
    TRUTHY (0.0 = no filter) and keeps values > threshold (strict);
    groups of ≤1 survivor pass through; else sort desc, avg_gap =
    (max-min)/(n-1), keep the prefix while each consecutive gap is
    strictly < avg_gap.

    Deterministic total order: value desc, ``tiebreak_col`` asc.
    """
    g = [F.col(c) for c in group_cols]
    pool = df
    if threshold:
        n_pre = F.count(F.lit(1)).over(Window.partitionBy(*g))
        pool = (
            pool.withColumn("__npre", n_pre)
            .where(
                (F.col("__npre") <= 1) | (F.col(value_col) > threshold)
            )
            .drop("__npre")
        )
    wg = Window.partitionBy(*g)
    wo = wg.orderBy(F.desc(value_col), F.asc(tiebreak_col))
    wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    n = F.count(F.lit(1)).over(wg)
    # guarded: singleton groups must not evaluate the division (ANSI)
    avg_gap = F.when(
        n > 1,
        (F.max(value_col).over(wg) - F.min(value_col).over(wg)) / (n - 1),
    )
    prev = F.lag(value_col).over(wo)
    viol = F.when(
        prev.isNotNull() & ((prev - F.col(value_col)) >= avg_gap), 1
    ).otherwise(0)
    return (
        pool.withColumn("__viol", viol)
        .withColumn("__nviol", F.sum("__viol").over(wrun))
        .withColumn("__n", n)
        .where((F.col("__n") <= 1) | (F.col("__nviol") == 0))
        .drop("__viol", "__nviol", "__n")
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """(user_id, session_idx, n_events, duration_s): gap-based sessions.

    One shuffle on the user key; the span-id assignment is the windowed
    running-sum-of-boundaries trick (same machinery as BIE entity-span
    grouping, example_parsing.py:121-135 → SURVEY.md P5).
    Timestamps compare in exact integer microseconds.
    """
    wo = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(id_col))
    # cast handles TIMESTAMP_NTZ inputs (session TZ is UTC → lossless)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = us - F.lag(us).over(wo)
    new_session = F.when(
        gap.isNull() | (gap > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(
        F.asc(ts_col), F.asc(id_col)
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spans = events.withColumn(
        "session_idx", F.sum(new_session).over(run)
    )
    return spans.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        ((F.max(us) - F.min(us)) / 1_000_000.0).alias("duration_s"),
    )


def range_containment_join(
    items: DataFrame,
    windows: DataFrame,
    item_start: str = "start",
    item_end: str = "end",
    win_start: str = "w_start",
    win_end: str = "w_end",
    partition_cols: Sequence[str] = ("doc_id",),
    how: str = "inner",
) -> DataFrame:
    """Interval-containment join: item span ⊆ window span, co-partitioned
    on ``partition_cols``.

    This is the DataFrame form of the reference's context-membership
    filter (utilities.py:98-107, 156-165 → SURVEY.md P8/J2): candidate
    grams survive iff they lie inside a matched context window,
    expressed positionally instead of via delimiter-string containment.
    The equi-keys keep the join hash-partitioned (windows per document
    are few); the range predicate is evaluated post-match, and AQE's
    skew split handles documents with pathologically many windows.
    """
    keys = list(partition_cols)
    cond = None
    for k in keys:
        c = items[k] == windows[k]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (items[item_start] >= windows[win_start])
        & (items[item_end] <= windows[win_end])
    )
    return items.join(windows, cond, how).drop(*[windows[k] for k in keys])


def _source_pairs(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b): each doc paired with the next doc_id of the same
    source — the deterministic pair generator shared by the pairwise
    scoring operators."""
    w = Window.partitionBy("source").orderBy("doc_id")
    ranked = docs.select(
        "doc_id", "source", F.row_number().over(w).alias("rn")
    )
    return (
        ranked.alias("x")
        .join(
            ranked.alias("y"),
            (F.col("y.source") == F.col("x.source"))
            & (F.col("y.rn") == F.col("x.rn") + 1),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
    )


def rouge1_pairs(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, p, r, f): ROUGE-1 between within-source document
    pairs (each doc paired with the next doc_id of the same source;
    peer = a, model = b).

    Clipped-count semantics (rougescore.py:7-40): matches =
    Σ_token min(count_a, count_b); F uses α=0.5 →
    f = matches / ((total_a + total_b)/2).  All rounded 6dp.
    """
    pairs = _source_pairs(docs)
    toks = docs.select("doc_id", F.explode(tokens_col("text")).alias("tok"))
    counts = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("doc_id").agg(F.sum("c").alias("total"))
    a = counts.select(
        F.col("doc_id").alias("doc_a"), "tok", F.col("c").alias("ca")
    )
    b = counts.select(
        F.col("doc_id").alias("doc_b"), "tok", F.col("c").alias("cb")
    )
    matches = (
        pairs.join(a, "doc_a")
        .join(b, ["doc_b", "tok"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.least("ca", "cb")).alias("m"))
    )
    ta = totals.select(F.col("doc_id").alias("doc_a"), F.col("total").alias("na"))
    tb = totals.select(F.col("doc_id").alias("doc_b"), F.col("total").alias("nb"))
    # per-doc totals are O(corpus) rows — no forced broadcast (AQE
    # chooses broadcast at bench scale, sort-merge at the 100 TB regime)
    out = (
        pairs.join(matches, ["doc_a", "doc_b"], "left")
        .join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("m", F.coalesce("m", F.lit(0)))
    )
    return out.select(
        "doc_a",
        "doc_b",
        F.round(F.try_divide("m", "na"), 6).alias("p"),
        F.round(F.try_divide("m", "nb"), 6).alias("r"),
        F.round(
            F.try_divide("m", (F.col("na") + F.col("nb")) / 2.0), 6
        ).alias("f"),
    )


ROUGEL_SCHEMA = "doc_a long, doc_b long, p double, r double, f double"


def rougel_pairs(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, p, r, f): ROUGE-L (LCS-based F, rougescore.py:
    77-123; peer = a, model = b) between within-source document pairs.

    LCS is inherently sequential per pair, so the kernel runs as an
    Arrow-batched ``mapInPandas`` over ``core.metrics.lcs_len`` (bit-
    vector DP: one big-int op per token — ~μs per 100-token pair).  The
    join that ships both token arrays to the kernel is an equi-join on
    doc ids; nothing is quadratic in the corpus.

    p/r/f are exact IEEE doubles of integer ratios (L/n), so the DuckDB
    wavefront-LCS oracle reproduces them bit-for-bit without rounding.
    """
    from ..core.metrics import lcs_len
    from ..functions.tokenize import tokens_col as _tokens_col

    pairs = _source_pairs(docs)
    t = docs.select("doc_id", _tokens_col("text").alias("toks"))
    joined = pairs.join(
        t.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta")),
        "doc_a",
    ).join(
        t.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb")),
        "doc_b",
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for da, db, ta, tb in zip(
                pdf["doc_a"], pdf["doc_b"], pdf["ta"], pdf["tb"]
            ):
                ta, tb = list(ta), list(tb)
                n, m = len(ta), len(tb)
                lcs = lcs_len(tb, ta)
                rows.append(
                    (
                        da,
                        db,
                        lcs / n if n else 0.0,
                        lcs / m if m else 0.0,
                        lcs / ((n + m) / 2.0) if n + m else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_a", "doc_b", "p", "r", "f"]
            )

    return joined.mapInPandas(kernel, ROUGEL_SCHEMA)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = ("value",),
    right_id: str = "event_id",
    prefix: str = "r_",
) -> DataFrame:
    """LEFT AS-OF join: every ``left`` row gains the ``right_cols`` of
    the LATEST ``right`` row with ``right_ts <= left_ts`` on the same
    ``key`` (NULLs when no prior right row exists) — the
    point-in-time-correct lookup feature stores and event attribution
    need, which a naive range join turns into a per-key cross product.

    Implementation is the union-window pattern: tag right rows side=0
    and left rows side=1, union them, and carry the right payload
    forward with ``last(payload, ignorenulls=True)`` over
    (key ORDER BY ts, side, right_id ROWS UNBOUNDED PRECEDING..CURRENT).
    Ordering gives the exact as-of semantics by construction:

    * a right row at the same timestamp as a left row sorts FIRST
      (side 0 < 1), so ``<=`` ties match;
    * among right rows tied on (key, ts), the largest ``right_id``
      sorts last and wins — a deterministic, engine-portable tiebreak;
    * left rows carry NULL payload, so they never shadow a right row.

    Scale: ONE shuffle on the key (the union is append-only, the
    window is in-partition), vs. the range-join alternative's per-key
    O(|L|·|R|) candidate blow-up.  Payload travels as a struct, so a
    right row whose payload FIELDS are null still matches (the struct
    itself is non-null) — column-wise carrying would skip it.
    """
    pay = F.struct(*[F.col(c).alias(c) for c in right_cols])
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_id).alias("_tb"),
        pay.alias("_pay"),
    )
    tb_type = r.schema["_tb"].dataType
    pay_type = r.schema["_pay"].dataType
    lrow = F.struct(*[F.col(c) for c in left.columns])
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(tb_type).alias("_tb"),
        F.lit(None).cast(pay_type).alias("_pay"),
        lrow.alias("_lrow"),
    )
    lrow_type = l.schema["_lrow"].dataType
    u = l.unionByName(
        r.withColumn("_lrow", F.lit(None).cast(lrow_type))
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_ts"), F.asc("_side"), F.asc("_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(
        "_m", F.last("_pay", ignorenulls=True).over(w)
    ).where(F.col("_side") == 1)
    return matched.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(prefix + c) for c in right_cols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    bin_s: int,
) -> DataFrame:
    """(id_a, id_b, overlap_from, overlap_to): every pair of
    half-open intervals that overlap — left rows (id_a, from_a,
    to_a), right rows (id_b, from_b, to_b), epoch integers.  The
    keyless temporal join (which sessions overlapped which incident
    windows?) that a naive range predicate turns into a cartesian
    product.

    The binning trick makes it an EQUI-join: each interval explodes
    to the ``bin_s``-wide time bins it touches, candidates pair on
    bin equality, the exact overlap predicate filters, and a
    distinct collapses the multi-bin duplicates.  Shuffle keys on
    the bin — i.e. on TIME — so co-occurring intervals co-locate
    and the plan is sort-merge/hash, never a nested loop (plan-
    tested).

    Choosing ``bin_s``: ~ the typical interval length.  Cost per row
    is ceil(len/bin_s)+1 replicas (too-small bins replicate long
    intervals), while a bin's candidate pairs grow with how many
    intervals share it (too-large bins approach all-pairs within a
    bin).  A bin spanning the busiest hour's intervals is the
    classic compromise; AQE's skew split covers rush-hour bins.
    Empty/negative intervals (to <= from) match nothing and are
    dropped, matching the half-open predicate exactly.
    """
    if bin_s < 1:
        raise ValueError("interval_join: bin_s must be >= 1")

    def bins(frm: str, to: str):
        return F.explode(
            F.sequence(
                F.floor(F.col(frm) / bin_s).cast("long"),
                F.floor((F.col(to) - 1) / bin_s).cast("long"),
            )
        ).alias("__bin")

    l = left.where(F.col("to_a") > F.col("from_a")).select(
        "id_a", "from_a", "to_a", bins("from_a", "to_a")
    )
    r = right.where(F.col("to_b") > F.col("from_b")).select(
        "id_b", "from_b", "to_b", bins("from_b", "to_b")
    )
    return (
        l.join(r, "__bin")
        .where(
            (F.col("from_a") < F.col("to_b"))
            & (F.col("from_b") < F.col("to_a"))
        )
        .select(
            "id_a",
            "id_b",
            F.greatest("from_a", "from_b").alias("overlap_from"),
            F.least("to_a", "to_b").alias("overlap_to"),
        )
        .distinct()
    )


def ndcg_at_k(
    ranked: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """(query_id, dcg, idcg, ndcg): normalized discounted cumulative
    gain at ``k`` (Järvelin & Kekäläinen, TOIS'02) per query — the
    graded-relevance retrieval gauge alongside the binary MRR
    (``graph.link_prediction_mrr``) and the threshold sweep
    (``classify.pr_curve``).  Input is any ranked candidate table
    with a relevance column; the ideal ordering is computed over the
    SAME candidate set (the judged-pool convention — pass the pool
    you want the ranking judged against).

    Exactness: per-item gains rel/log2(rank+1) round 9dp and sum in
    decimal(28,12) (order-independent); the ideal ranking orders by
    (rel DESC, rank ASC) — the original rank as tiebreak, so ideal
    positions are deterministic under equal relevance.  ndcg rounds
    6; a query whose pool has zero total relevance reports NULL (0/0
    try_divide), distinguishable from a genuinely bad ranking.

    One exchange on query_id serves both window passes and the final
    groupBy — the conversation_stats plan shape.
    """
    if k < 1:
        raise ValueError("ndcg_at_k: k must be >= 1")
    take = ranked.where(F.col(rank_col) <= k).select(
        F.col(query_col).alias("query_id"),
        F.col(rank_col).alias("rnk"),
        F.col(rel_col).cast("double").alias("rel"),
    )
    wi = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc("rnk")
    )
    gains = take.select(
        "query_id",
        F.round(
            F.col("rel") / F.log2(F.col("rnk").cast("double") + 1.0), 9
        ).alias("g"),
        F.round(
            F.col("rel")
            / F.log2(F.row_number().over(wi).cast("double") + 1.0),
            9,
        ).alias("ig"),
    )
    agg = gains.groupBy("query_id").agg(
        F.round(
            F.sum(F.col("g").cast("decimal(28,12)")).cast("double"), 9
        ).alias("dcg"),
        F.round(
            F.sum(F.col("ig").cast("decimal(28,12)")).cast("double"),
            9,
        ).alias("idcg"),
    )
    return agg.select(
        "query_id",
        "dcg",
        "idcg",
        F.round(F.try_divide(F.col("dcg"), F.col("idcg")), 6).alias(
            "ndcg"
        ),
    )
