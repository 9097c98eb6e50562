"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick raw-corpus documents that look like a target
distribution, using hashed-n-gram bag-of-words importance weights.

The recipe, re-expressed as declarative Spark stages:

1. featurize every document into hashed n-gram bucket counts
   (unigrams + bigrams, hashed into 256 buckets);
2. fit two smoothed bag-of-words models — bucket probabilities under
   the TARGET slice and under the RAW corpus;
3. per-document importance weight
   ``logw(x) = Σ_b counts_b(x) · (ln p_target[b] − ln p_raw[b])``;
4. keep the top-k documents by weight (the paper resamples with
   Gumbel noise for diversity; the deterministic top-k is the
   engine-portable default).

Engine-portability choices (the module's determinism story):

* the hash bucket IS the first two hex chars of md5(gram) — a string
  group key both engines compute byte-identically, so the bucket
  count is fixed at 256 and no hex→integer conversion is needed;
* the per-bucket log-ratio is rounded to 9dp FIRST (a 256-row table,
  so the rounding is free) and the per-document Σ counts·ratio runs
  in ``decimal(28,12)`` — exact and order-independent, immune to the
  float-reassociation noise of a distributed sum.

Scale shape: the gram explode feeds ONE map-side-combinable groupBy
(id, bucket) — at most 256 rows per document survive the combine and
the target flag rides along as a grouping key (functionally dependent
on id, so it adds no groups and no join); both bag-of-words models
aggregate FROM that frame (256-row outputs); the tiny ratio table
broadcast-joins back; the final selection is ``orderBy().limit(k)`` =
TakeOrderedAndProject (per-partition top-k, k-row merge — never a
global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col

N_BUCKETS = 256  # 2 hex chars of md5 — fixed by the portability trick
_DEC = "decimal(28,12)"


def md5_bucket(col: Column | str) -> Column:
    """The 256-way hashed feature bucket: first two hex chars of
    ``md5(utf8(col))`` — a string group key both engines compute
    byte-identically.  THE single definition of the portability trick
    (ops.classify imports it; a second copy could drift)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.md5(F.encode(c, "utf-8")), 1, 2)


def _grams_col(text_col: str = "text") -> Column:
    """Unigrams + bigrams of the engine tokenizer's output.  The token
    array sits in the HOF's argument position and the lambda body
    touches only lambda-bound vars (the measured Catalyst CSE rule)."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(toks, bigrams)


def hashed_gram_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry: list[str] | None = None,
) -> DataFrame:
    """(id, bucket, n [, carry…]): hashed n-gram feature counts per
    document — bucket = first 2 hex chars of md5(gram), 256 buckets.
    ``carry`` columns (functionally dependent on the id, e.g. a target
    flag) ride through as extra grouping keys."""
    carry = carry or []
    return (
        docs.select(
            F.col(id_col).alias("id"),
            *carry,
            F.explode(_grams_col(text_col)).alias("gram"),
        )
        .select(
            "id",
            *carry,
            md5_bucket("gram").alias("bucket"),
        )
        .groupBy("id", "bucket", *carry)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _bucket_logprob_ratio(counts: DataFrame) -> DataFrame:
    """(bucket, ratio): 9dp-rounded ln p_target[b] − ln p_raw[b] with
    add-one smoothing over the 256-bucket space, computed from the
    per-doc counts frame (``is_t`` flag column) — one tiny agg that
    reuses the counts frame's exchange."""
    per_bucket = counts.groupBy("bucket").agg(
        F.sum(
            F.when(F.col("is_t"), F.col("n")).otherwise(F.lit(0))
        ).alias("t"),
        F.sum("n").alias("r"),
    )

    def lp(c: str, total: str) -> Column:
        return F.log(
            (F.col(c) + 1).cast("double")
            / (F.col(total) + N_BUCKETS).cast("double")
        )

    tot = per_bucket.agg(F.sum("t").alias("tt"), F.sum("r").alias("rt"))
    return per_bucket.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(lp("t", "tt") - lp("r", "rt"), 9).alias("ratio"),
    )


def dsir_logweights(
    docs: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, logw): per-document DSIR importance weight of the raw
    corpus against the ``target`` slice (a boolean column over
    ``docs``, e.g. ``F.col('lang') == 'en'``).

    logw = Σ_b counts_b · ratio_b, summed exactly in decimal(28,12)
    (9dp ratio × integer count is exact at that scale), so the result
    is independent of partitioning and engine — surfaced as a 9dp
    double."""
    flagged = docs.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
        target.alias("is_t"),
    )
    counts = hashed_gram_counts(flagged, "id", "text", carry=["is_t"])
    ratios = _bucket_logprob_ratio(counts)
    return (
        counts.join(F.broadcast(ratios), "bucket")
        .groupBy("id")
        .agg(F.sum((F.col("n") * F.col("ratio")).cast(_DEC)).alias("w"))
        .select(
            "id", F.round(F.col("w").cast("double"), 9).alias("logw")
        )
    )


def dsir_select(
    docs: DataFrame,
    target: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, logw, rank): the ``k`` raw documents most like the target
    distribution — deterministic top-k by (logw desc, id asc)."""
    topk = (
        dsir_logweights(docs, target, id_col, text_col)
        .orderBy(F.desc("logw"), F.asc("id"))
        .limit(k)
    )
    # rank over the k survivors only (a k-row single-partition window,
    # NOT a corpus-wide one)
    w = Window.orderBy(F.desc("logw"), F.asc("id"))
    return topk.select(
        "id", "logw", F.row_number().over(w).alias("rank")
    )
