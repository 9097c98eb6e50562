"""End-to-end corpus curation: the composed pretraining-data pass.

``curate_corpus`` chains the pipeline every LLM corpus goes through —
quality gate → repetition gate → near-copy dedup → PII scrub →
mixture sampling — as ONE declarative Spark plan, so Catalyst sees
the whole thing and a 100 TB run costs:

* one projection-only pass over the corpus computing quality features
  AND the scrubbed text together (``quality_feature_cols`` +
  ``scrub_cols`` fused into a single select — not one scan per
  feature family);
* two aggregate branches that must rescan/shuffle by nature: the
  repetition verdict (modal-2-gram count, one shuffle) and the
  bag-dedup representative (token-multiset digest groupBy, one
  shuffle);
* two doc_id-keyed joins folding the branches back (co-partitioned
  after the first exchange; AQE picks broadcast when a branch is
  small);
* the deterministic mixture sample as a final map-side filter
  (engine-portable md5 hash-Bernoulli, see ``ops.sampling``) — it
  commutes with everything above, so survivors are stable across
  partitionings and reruns.

Gate placement: the quality/repetition filters run BEFORE the join
results are needed downstream, so dropped docs never reach the
sample; dedup keeps each bag-duplicate group's min-doc_id
representative (survivorship is deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col
from .dedup import _md5
from .sampling import stratified_sample
from .textstats import quality_feature_cols, scrub_cols, shingles_col


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.62,
    fractions: dict[str, float] | None = None,
    default_rate: float = 1.0,
) -> DataFrame:
    """→ (doc_id, lang, source, n_tokens, quality, scrubbed): the
    curated corpus — docs that clear the quality floor and the
    repetition filter, are their bag-dedup group's representative,
    with PII scrubbed, mixture-sampled per ``fractions``.
    """
    feats = quality_feature_cols("toks")
    scrubbed, _counts = scrub_cols()
    sh3 = shingles_col(3)
    # scan 1: every projection-side feature in one pass — quality
    # score, scrubbed text, AND the array-side repetition ratios
    # (identical formulas to repetition_stats, incl. the 6dp rounding
    # the keep verdict compares on)
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
        F.round(
            1 - F.try_divide(F.size(F.array_distinct(sh3)), F.size(sh3)), 6
        ).alias("dup_3gram_frac"),
    )
    # scan 2: the modal-2-gram count (the one repetition feature that
    # needs an aggregate) — explode + two groupBys, map-side combine
    t = docs.select("doc_id", tokens_col("text").alias("toks"))
    a2 = (
        t.select("doc_id", F.explode(shingles_col(2)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n2"), F.max("c").alias("top2"))
        .select(
            "doc_id",
            F.round(F.try_divide("top2", "n2"), 6).alias("top_2gram_frac"),
        )
    )
    # scan 3: bag-dedup survivors — groupBy(digest).min(doc_id) emits
    # each group's representative id directly (no join-back rescan);
    # the inner join below doubles as the keep-only-representatives
    # semi-join
    survivors = (
        docs.select(
            "doc_id",
            _md5(
                F.array_join(
                    F.array_sort(F.array_distinct(tokens_col("text"))), " "
                )
            ).alias("h"),
        )
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    out = (
        base.join(a2, "doc_id")
        .join(survivors, "doc_id")
        .where(
            (F.col("quality") >= min_quality)
            & (F.col("top_2gram_frac") <= 0.20)
            & (F.col("dup_3gram_frac") <= 0.18)
        )
        .select("doc_id", "lang", "source", "n_tokens", "quality", "scrubbed")
    )
    if fractions is not None:
        out = stratified_sample(out, fractions, default=default_rate)
    return out
