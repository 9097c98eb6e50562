"""End-to-end corpus curation: the composed pretraining-data pass.

``curate_corpus`` chains the pipeline every LLM corpus goes through —
quality gate → repetition gate → near-copy dedup → PII scrub →
mixture sampling — as ONE declarative Spark plan, so Catalyst sees
the whole thing and a 100 TB run costs:

* one projection-only pass over the corpus computing quality features,
  the scrubbed text, the array-side repetition ratio, AND the
  bag-dedup digest together (all from shared column builders —
  ``quality_feature_cols``/``scrub_cols``/``dup_ngram_frac_col``/
  ``bag_digest_col`` — so the fused pass and the standalone operators
  cannot drift);
* one aggregate branch that must rescan/shuffle by nature: the
  modal-2-gram count (explode + map-side-combinable double groupBy);
* the dedup-survivor selection over the GATED rows (gate-then-dedup,
  the C4/Gopher ordering: a junk near-copy can never be the group's
  representative and drag clean content out with it) — a min-over-
  window on the bag digest, one exchange, no self-join, so the gated
  subtree is never duplicated (digest groups are intrinsically small,
  so the window is skew-safe);
* the deterministic mixture sample as a final map-side filter
  (engine-portable md5 hash-Bernoulli, see ``ops.sampling``) — it
  commutes with the projections, so survivors are stable across
  partitionings and reruns.

Dedup keeps each gated bag-duplicate group's min-doc_id member
(survivorship is deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.tokenize import tokens_col
from .dedup import bag_digest_col
from .sampling import stratified_sample
from .textstats import (
    dup_ngram_frac_col,
    quality_feature_cols,
    repetition_keep_col,
    scrub_cols,
    shingles_col,
)


def _flag_frame(docs: DataFrame, min_quality: float) -> DataFrame:
    """The shared gate scaffolding of :func:`curate_corpus` and
    :func:`curation_report`: the 2-corpus-scan feature build (quality
    score, scrubbed text, repetition ratios, bag digest — all from
    the shared column builders) plus the per-doc gate verdicts
    ``q_ok`` / ``r_ok`` (thresholds defined ONCE:
    ``textstats.repetition_keep_col`` and ``min_quality``).  One
    frame so the pass and the report it describes cannot drift;
    Catalyst prunes whichever columns a consumer leaves unused."""
    feats = quality_feature_cols("toks")
    scrubbed, counts = scrub_cols()
    pii_hits = None
    for c in counts:
        pii_hits = c if pii_hits is None else pii_hits + c
    base = docs.select(
        "doc_id",
        "lang",
        "source",
        "text",
        tokens_col("text").alias("toks"),
    ).select(
        "doc_id",
        "lang",
        "source",
        feats["n_tokens"],
        feats["quality"],
        scrubbed.alias("scrubbed"),
        pii_hits.cast("long").alias("pii_hits"),
        dup_ngram_frac_col(3, "toks").alias("dup_3gram_frac"),
        bag_digest_col().alias("bag_key"),
    )
    t = docs.select("doc_id", tokens_col("text").alias("toks"))
    a2 = (
        t.select("doc_id", F.explode(shingles_col(2)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n2"), F.max("c").alias("top2"))
        .select(
            "doc_id",
            F.round(F.try_divide("top2", "n2"), 6).alias(
                "top_2gram_frac"
            ),
        )
    )
    # coalesce: a NULL verdict (empty-text doc → NULL quality via
    # try_divide) must read as a deterministic FAIL in boolean
    # algebra, not as a three-valued NULL that NULL-skipping
    # aggregates and CASE fall-throughs interpret differently across
    # engines.  (Today the a2 inner join already drops token-less
    # docs, so NULL cannot reach these columns — the coalesce makes
    # the fail-closed semantics explicit rather than incidental.)
    return base.join(a2, "doc_id").withColumns(
        {
            "q_ok": F.coalesce(
                F.col("quality") >= min_quality, F.lit(False)
            ),
            "r_ok": F.coalesce(repetition_keep_col(), F.lit(False)),
        }
    )


def _gated_rep(flagged: DataFrame) -> DataFrame:
    """Adds ``rep`` — each bag-dup group's survivor (min doc_id among
    the GATED members) — via one skew-safe bag_key window.  The ONE
    definition of survivorship, shared by :func:`curation_report` and
    :func:`source_stats` (and semantically by :func:`curate_corpus`,
    whose gated-subset window is the same rule restricted to rows
    where the gate already holds)."""
    w = Window.partitionBy("bag_key")
    return flagged.withColumn(
        "rep",
        F.min(
            F.when(F.col("q_ok") & F.col("r_ok"), F.col("doc_id"))
        ).over(w),
    )


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.62,
    fractions: dict[str, float] | None = None,
    default_rate: float = 1.0,
) -> DataFrame:
    """→ (doc_id, lang, source, n_tokens, quality, scrubbed): the
    curated corpus — docs that clear the quality floor and the
    repetition filter, are their gated bag-dedup group's
    representative, with PII scrubbed, mixture-sampled per
    ``fractions``.
    """
    # scans 1+2 and the gate verdicts live in _flag_frame (shared
    # with curation_report; identical formulas/rounding to the
    # standalone ops via the shared column builders)
    gated = _flag_frame(docs, min_quality).where(
        F.col("q_ok") & F.col("r_ok")
    )
    # dedup over the GATED rows (gate-then-dedup): keep the min-doc_id
    # member of each gated digest group via a window — one exchange on
    # bag_key, no self-join, so the gated subtree is never duplicated.
    # A bag_key window is skew-safe where the Jaccard df window was
    # not: duplicate groups are intrinsically small (a group IS a set
    # of near-copies), never stop-key sized.
    w = Window.partitionBy("bag_key")
    out = (
        gated.withColumn("rep", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("rep"))
        .select("doc_id", "lang", "source", "n_tokens", "quality", "scrubbed")
    )
    if fractions is not None:
        out = stratified_sample(out, fractions, default=default_rate)
    return out


def curation_report(
    docs: DataFrame, min_quality: float = 0.62
) -> DataFrame:
    """(lang, stage, n_docs, n_tokens): the curation FUNNEL — every
    document attributed to exactly one outcome, so nothing the pass
    drops is silent (the "no silent caps" rule made a table):

    * ``quality_fail`` — below the quality floor;
    * ``repetition_fail`` — cleared quality, failed the Gopher
      repetition gates;
    * ``dedup_drop`` — cleared both gates but another gated member of
      its bag-dedup group is the representative (gate-then-dedup, the
      same ordering :func:`curate_corpus` ships);
    * ``kept`` — the rows curate_corpus emits (pre-sampling).

    Attribution is first-failure, so the stage counts sum to the
    corpus count per language and the funnel reads top-to-bottom.
    Identical shared column builders as the fused pass — the report
    can never disagree with the pass it describes.

    Scale: the same 2 corpus scans as :func:`curate_corpus` (features
    projection + modal-2-gram aggregate), one bag_key window over the
    GATED subset, then a lang×stage groupBy over per-doc flags —
    map-side combinable, output is languages × 4 rows.
    """
    flagged = _flag_frame(docs, min_quality).select(
        "doc_id", "lang", "n_tokens", "bag_key", "q_ok", "r_ok"
    )
    gated_rep = _gated_rep(flagged)
    stage = (
        F.when(~F.col("q_ok"), F.lit("quality_fail"))
        .when(~F.col("r_ok"), F.lit("repetition_fail"))
        .when(F.col("doc_id") != F.col("rep"), F.lit("dedup_drop"))
        .otherwise(F.lit("kept"))
    )
    return (
        gated_rep.withColumn("stage", stage)
        .groupBy("lang", "stage")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )


def source_stats(
    docs: DataFrame, min_quality: float = 0.62
) -> DataFrame:
    """(source, n_docs, n_tokens, mean_quality, quality_fail_rate,
    repetition_fail_rate, dedup_drop_rate, pii_per_doc, keep_rate):
    the per-SOURCE curation health gauge — the table a corpus owner
    reads to decide which upstream feeds to down-weight or drop
    (RefinedWeb/Dolma-style source triage: a feed whose docs mostly
    fail the quality floor, collapse into other feeds' duplicates, or
    carry heavy PII is a candidate for exclusion BEFORE it costs a
    full processing pass at the next crawl).

    Attribution is first-failure over the same per-doc verdicts as
    :func:`curation_report` (quality → repetition → dedup-survivor),
    so ``quality_fail_rate + repetition_fail_rate + dedup_drop_rate +
    keep_rate = 1`` per source and this gauge can never disagree with
    the funnel or the fused pass — all three read
    :func:`_flag_frame`'s shared column builders.  Dedup survivorship
    is GLOBAL (the bag_key window spans sources), so a source whose
    content merely restates another's shows up here as dedup drops —
    exactly the cross-feed syndication signal source triage wants.

    Scale: the same 2 corpus scans as the pass, one bag_key window
    (skew-safe: duplicate groups are intrinsically small), then a
    source groupBy over per-doc flags — map-side combinable, output
    is one row per source.
    """
    flagged = _flag_frame(docs, min_quality).select(
        "doc_id",
        "source",
        "n_tokens",
        "quality",
        "pii_hits",
        "bag_key",
        "q_ok",
        "r_ok",
    )
    gated_rep = _gated_rep(flagged)
    q_fail = (~F.col("q_ok")).cast("double")
    r_fail = (F.col("q_ok") & ~F.col("r_ok")).cast("double")
    d_drop = (
        F.col("q_ok") & F.col("r_ok") & (F.col("doc_id") != F.col("rep"))
    ).cast("double")
    kept = (
        F.col("q_ok") & F.col("r_ok") & (F.col("doc_id") == F.col("rep"))
    ).cast("double")
    return gated_rep.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.avg("quality"), 6).alias("mean_quality"),
        F.round(F.avg(q_fail), 6).alias("quality_fail_rate"),
        F.round(F.avg(r_fail), 6).alias("repetition_fail_rate"),
        F.round(F.avg(d_drop), 6).alias("dedup_drop_rate"),
        F.round(F.avg(F.col("pii_hits").cast("double")), 6).alias(
            "pii_per_doc"
        ),
        F.round(F.avg(kept), 6).alias("keep_rate"),
    )


def corpus_diff(
    old: DataFrame, new: DataFrame, key: str = "doc_id"
) -> DataFrame:
    """(doc_id, status, old_digest, new_digest): the incremental
    work-list between two corpus snapshots — ``added`` (key only in
    ``new``), ``removed`` (only in ``old``), ``changed`` (both, text
    digests differ).  Unchanged docs are NOT emitted: the output IS
    the set of rows downstream incremental passes must touch, so on
    a mostly-stable 100 TB corpus it is small by construction (the
    point of running diff-then-process instead of reprocess-all).

    Digest = ``md5(text)`` — byte equality, the same "per-row text
    equality" invariant the north rule pins for turns.  Presence is
    tracked by explicit flags, never by digest nullity (md5(NULL) is
    NULL, so a present-row-with-NULL-text must not read as an absent
    key); NULL-vs-NULL text is unchanged (dropped), NULL-vs-text is
    changed.

    Scale: two projection scans + ONE full-outer hash join on the
    key.  No windows, no skew surface (keys are unique per snapshot);
    with both snapshots stored bucketed by the key the join is
    exchange-free.
    """
    # presence flags, NOT digest nullity, decide added/removed:
    # md5(NULL text) is NULL, so a present-row-with-NULL-text would
    # otherwise be indistinguishable from an absent key
    od = old.select(
        F.col(key).alias("k"),
        F.md5("text").alias("old_digest"),
        F.lit(True).alias("_in_old"),
    )
    nd = new.select(
        F.col(key).alias("k"),
        F.md5("text").alias("new_digest"),
        F.lit(True).alias("_in_new"),
    )
    j = od.join(nd, "k", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("old_digest").eqNullSafe(F.col("new_digest")),
            F.lit("changed"),
        )
    )
    return (
        j.withColumn("status", status)
        .where(F.col("status").isNotNull())
        .select(
            F.col("k").alias(key), "status", "old_digest", "new_digest"
        )
    )
