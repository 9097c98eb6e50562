"""N-gram language-model perplexity filtering (CCNet-style).

Wenzek et al. 2020 ("CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") rank web documents by the perplexity
of a language model trained on a trusted corpus and keep the
low-perplexity head.  This module is that filter as pure DataFrame
algebra: a bigram LM with stupid-backoff smoothing (Brants et al.
2007, "Large Language Models in Machine Translation" — THE n-gram
scheme built for distributed count tables, no normalization pass)
trained on a deterministic slice of the corpus, then every document
scored and bucketed head/middle/tail.

Model (α = backoff factor, add-one unigram smoothing for OOV):

    p(w2 | w1) = c(w1 w2) / c(w1)                   if c(w1 w2) > 0
               = α · (c(w2) + 1) / (N + V)          otherwise

Scale shapes (10¹²-token corpus):

* counts are two map-side-combinable groupBys (unigram, bigram) over
  an exploded token stream — the classic distributed-LM build, no
  driver state;
* bigram assembly is posexplode + one ``lead`` window keyed on
  doc_id — a document's tokens land in one partition (documents are
  bounded), and the same exchange serves the final per-doc
  aggregation;
* scoring joins the corpus bigram stream to the count tables on
  token keys — shuffle hash joins, map-side combinable at no point
  wider than the observed-bigram table.  At web scale, hash the
  token strings to 64-bit ids first (xxhash64) to shrink shuffle
  width, and bucket the count tables by token so repeated scoring
  runs skip the exchange;
* only the 1-row (N, V) totals are broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col


def _doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, w1, w2): the token bigram stream.  posexplode
    evaluates the tokenizer ONCE per document (never a higher-order
    lambda over a computed column — the measured O(len²) Catalyst
    re-evaluation trap); ``lead`` pairs each token with its
    successor inside a single doc_id-keyed window pass."""
    tok = docs.select(
        "doc_id", F.posexplode(tokens_col("text")).alias("pos", "w")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        tok.select(
            "doc_id",
            "pos",
            F.col("w").alias("w1"),
            F.lead("w").over(w).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
    )


def lm_perplexity(
    docs: DataFrame,
    alpha: float = 0.4,
    train_mod: int = 2,
    head_ppl: float = 30.0,
    tail_ppl: float = 60.0,
) -> DataFrame:
    """(doc_id, n_scored, n_backoff, nll, ppl, bucket): per-document
    bigram-LM perplexity and the CCNet head/middle/tail bucket.

    The LM trains on the deterministic corpus slice
    ``doc_id % train_mod == 0`` (CCNet trains on trusted text and
    scores the crawl; the held-out slice here makes the backoff path
    real — self-scoring a corpus with its own counts would never
    back off).  ``n_backoff`` counts positions scored by the unigram
    backoff — the OOV-pressure gauge.  Documents with fewer than two
    tokens have no bigram and drop out (both engines agree).

    ``nll`` is the mean negative log-likelihood per scored position,
    ``ppl = exp(nll)``; both rounded 6dp for cross-engine float
    stability.  Buckets use FIXED thresholds (head < ``head_ppl`` ≤
    middle ≤ ``tail_ppl`` < tail): corpus-quantile cutoffs à la CCNet
    are one extra ``approx_percentile`` pass, but fixed cuts keep the
    operator deterministic across engines and runs.
    """
    big = _doc_bigrams(docs)
    train = big.where(F.col("doc_id") % train_mod == 0)

    # the bigram count table IS the language model — materialize it
    # once (lazy localCheckpoint) so the unigram marginal, the totals
    # row, and both scoring joins read the counts instead of each
    # re-scanning the training corpus through their own lineage (the
    # unchecked plan runs 5 corpus scans; this one runs 2: one to
    # count, one to score).  In production the same point is a
    # bucketed-by-token table write, reused across scoring runs.
    bi = (
        train.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=False)
    )
    # unigram counts over w1 positions (every token except each doc's
    # last) derived by MARGINALIZING the bigram table — c(w1) =
    # Σ_w2 c(w1,w2) — so p(w2|w1) stays a true conditional by
    # construction
    uni = bi.groupBy(F.col("w1").alias("w")).agg(
        F.sum("c12").alias("c1")
    )
    totals = uni.agg(
        F.sum("c1").alias("n_tokens"), F.count(F.lit(1)).alias("v")
    )

    scored = (
        big.join(bi, ["w1", "w2"], "left")
        .join(uni.select(F.col("w").alias("w1"), "c1"), "w1", "left")
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c1").alias("c2")),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.when(
                F.col("c12").isNotNull(),
                F.log(F.col("c12") / F.col("c1")),
            )
            .otherwise(
                F.log(
                    F.lit(alpha)
                    * (F.coalesce(F.col("c2"), F.lit(0)) + 1)
                    / (F.col("n_tokens") + F.col("v"))
                )
            )
            .alias("logp"),
            F.col("c12").isNull().cast("int").alias("backoff"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_scored"),
        F.sum("backoff").cast("long").alias("n_backoff"),
        F.avg("logp").alias("avg_lp"),
    )
    # bucket cuts on the ROUNDED ppl so a value sitting within float
    # noise of a threshold buckets identically in every engine
    ppl = F.round(F.exp(-F.col("avg_lp")), 6)
    return agg.select(
        "doc_id",
        "n_scored",
        "n_backoff",
        F.round(-F.col("avg_lp"), 6).alias("nll"),
        ppl.alias("ppl"),
        F.when(ppl < head_ppl, "head")
        .when(ppl <= tail_ppl, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


def span_corruption(
    docs: DataFrame,
    block: int = 10,
    span: int = 3,
    rate: float = 0.5,
) -> DataFrame:
    """(doc_id, n_tokens, n_corrupted, input, target): T5-style span
    corruption (Raffel et al., JMLR 2020) as ONE deterministic
    projection — the denoising-objective data-prep step: selected
    token spans are cut from the input and replaced with sentinel
    tokens; the target is the sentinel-prefixed concatenation of the
    cut spans.

    Determinism/scale variant: the corpus position stream is cut
    into fixed ``block``-token windows; window b of a document is
    corrupted iff the first 8 hex chars of ``md5(doc_id:b)`` fall
    below the ``rate`` threshold (the hash-Bernoulli convention of
    ``deterministic_sample`` — reproducible across engines, runs,
    partitionings), and a corrupted window loses its FIRST ``span``
    tokens to the sentinel ``<extra_id_b>``.  T5's reference
    implementation draws Poisson span lengths sequentially per
    document — an inherently serial scan a distributed projection
    cannot replay — so this is the block-ALIGNED variant: expected
    corruption density = rate · span/block (defaults: 15%, the T5
    number), sentinel ids are block indices (not consecutive — T5
    only requires input/target sentinel AGREEMENT, which block ids
    give for free, sparing the serial renumbering fold).

    Whole-stage-codegen plan: tokenize, one ``transform`` over the
    block index sequence building per-block fragments (slice + join
    — no explode, the document never becomes rows), two
    ``array_join``s.  Zero shuffle, embarrassingly parallel.
    """
    if block < 1 or span < 1 or span > block:
        raise ValueError(
            "span_corruption: need 1 <= span <= block"
        )
    if not 0.0 <= rate <= 1.0:
        raise ValueError("span_corruption: rate must be in [0, 1]")
    from .sampling import threshold_hex

    thr = threshold_hex(rate)
    toks = tokens_col("text")
    n = F.size(toks)
    nb = F.ceil(n / F.lit(block)).cast("int")
    bidx = F.sequence(F.lit(0), nb - 1)

    def _hit(b):
        h = F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    b.cast("string"),
                )
            ),
            1,
            8,
        )
        if thr is None:  # rate == 1.0: every block corrupted
            return F.lit(True)
        return h < F.lit(thr)

    def _in_frag(t, b):
        kept = F.slice(t, b * block + span + 1, block - span)
        full = F.slice(t, b * block + 1, block)
        return F.when(
            _hit(b),
            F.concat(
                F.lit("<extra_id_"),
                b.cast("string"),
                F.lit(">"),
                F.when(
                    F.size(kept) > 0,
                    F.concat(F.lit(" "), F.array_join(kept, " ")),
                ).otherwise(F.lit("")),
            ),
        ).otherwise(F.array_join(full, " "))

    def _tg_frag(t, b):
        cut = F.slice(t, b * block + 1, span)
        return F.when(
            _hit(b),
            F.concat(
                F.lit("<extra_id_"),
                b.cast("string"),
                F.lit("> "),
                F.array_join(cut, " "),
            ),
        ).otherwise(F.lit(None))

    t = toks
    inp = F.array_join(
        F.transform(bidx, lambda b: _in_frag(t, b)), " "
    )
    tgt = F.array_join(
        F.filter(
            F.transform(bidx, lambda b: _tg_frag(t, b)),
            lambda x: x.isNotNull(),
        ),
        " ",
    )
    n_cor = F.size(
        F.filter(bidx, lambda b: _hit(b))
    )
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.when(n > 0, n_cor).otherwise(F.lit(0)).cast("long").alias(
            "n_corrupted"
        ),
        F.when(n > 0, inp).otherwise(F.lit("")).alias("input"),
        F.when(n > 0, tgt).otherwise(F.lit("")).alias("target"),
    )


def fim_split(docs: DataFrame, spm_rate: float = 0.5) -> DataFrame:
    """(doc_id, n_tokens, n_prefix, n_middle, mode, output): the
    fill-in-the-middle transformation (Bavarian et al. 2022,
    "Efficient Training of Language Models to Fill in the Middle") —
    each document is cut into prefix/middle/suffix at two
    deterministic pivots and re-serialized with sentinel tokens so a
    causal LM learns infilling "for free".  The document-level
    complement of :func:`span_corruption`'s many-small-spans
    objective.

    * pivots: ``md5(doc_id:a) mod (n+1)`` and ``md5(doc_id:b) mod
      (n+1)``, sorted — engine-portable hash randomness (uniform per
      document, reproducible on any run/partitioning; degenerate
      cuts — empty prefix/middle/suffix — are kept, as in the paper:
      the model must handle them at inference);
    * mode: PSM (``<PRE> p <SUF> s <MID> m``) or SPM (``<SUF> s
      <PRE> p <MID> m``), chosen per document by the same hash rule
      at ``spm_rate`` (the paper's 50/50 joint training);
    * the untouched token counts ride along so a loss-masking
      packer (``pack_turns``'s offset convention) can find the
      middle without re-tokenizing.

    Pure zero-shuffle projection: tokenize, two hash mods, three
    slices, one concat — whole-stage codegen, embarrassingly
    parallel.
    """
    if not 0.0 <= spm_rate <= 1.0:
        raise ValueError("fim_split: spm_rate must be in [0, 1]")
    from .sampling import threshold_hex

    thr = threshold_hex(spm_rate)
    toks = tokens_col("text")
    n = F.size(toks)

    def _mod(tag: str):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit(":" + tag)
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        return h % (n.cast("long") + 1)

    a, b = _mod("a"), _mod("b")
    lo, hi = F.least(a, b).cast("int"), F.greatest(a, b).cast("int")
    pre = F.array_join(F.slice(toks, 1, lo), " ")
    mid = F.array_join(
        F.slice(toks, lo + 1, hi - lo), " "
    )
    suf = F.array_join(
        F.slice(toks, hi + 1, n - hi), " "
    )
    if thr is None:
        is_spm = F.lit(True)
    else:
        is_spm = (
            F.substring(
                F.md5(
                    F.concat(F.col("doc_id").cast("string"), F.lit(":m"))
                ),
                1,
                8,
            )
            < F.lit(thr)
        )
    psm = F.concat(
        F.lit("<PRE> "), pre, F.lit(" <SUF> "), suf,
        F.lit(" <MID> "), mid,
    )
    spm = F.concat(
        F.lit("<SUF> "), suf, F.lit(" <PRE> "), pre,
        F.lit(" <MID> "), mid,
    )
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        lo.cast("long").alias("n_prefix"),
        (hi - lo).cast("long").alias("n_middle"),
        F.when(is_spm, F.lit("spm")).otherwise(F.lit("psm")).alias(
            "mode"
        ),
        F.when(is_spm, spm).otherwise(psm).alias("output"),
    )


def pack_documents(
    docs: DataFrame,
    row_tokens: int,
    id_col: str = "doc_id",
    n_tokens_col: str | None = None,
    n_buckets: int = 32,
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """(doc_id, row_id, offset_in_row, offset_in_doc, seg_tokens,
    n_tokens): the GPT-style PACKING MANIFEST — documents
    concatenated in id order and cut into fixed ``row_tokens``
    training rows, documents SPLITTING across row boundaries (the
    pretraining convention; :func:`~coies_spark.ops.transcripts.
    pack_turns` is the never-split instruct-data sibling).  One
    output row per (document, training-row) segment: where in the
    row it sits, where in the document it starts, and how many
    tokens it contributes — everything a loader needs to materialize
    row k without touching any other row, and everything a
    loss-masker needs to put document boundaries back.

    Token counts come from ``n_tokens_col`` if given, else from a
    trained BPE merge list if ``merges`` is given (manifest offsets
    and segment sizes are then in TOKENIZER tokens — the unit the
    training loader's ``row_tokens`` is specified in; whitespace
    counts mis-size rows by the fertility factor), else the engine
    whitespace tokenizer.  ``n_tokens_col`` and ``merges`` are
    mutually exclusive.  Zero-token documents occupy no space and
    emit nothing.  NOTE: :func:`materialize_rows` slices WHITESPACE
    tokens by manifest offsets, so it reassembles text only for
    whitespace-unit manifests; a BPE-unit manifest is consumed by a
    loader that tokenizes with the same merge table (offsets index
    its token stream).  Global token positions come from
    :func:`~coies_spark.ops.maintenance.exclusive_prefix_sum` (the
    two-phase scan — no single-task global sort), and the row fan-out
    is ``sequence(first_row, last_row)`` exploded per document —
    bounded by ceil(n_tokens / row_tokens) + 1 segments per doc.
    Invariants pinned by test: every row except the last is exactly
    full, segments tile each document, and segment offsets tile each
    row.
    """
    if row_tokens < 1:
        raise ValueError("pack_documents: row_tokens must be >= 1")
    if n_tokens_col is not None and merges is not None:
        raise ValueError(
            "pack_documents: n_tokens_col and merges are mutually "
            "exclusive — pass the count column OR the merge table"
        )
    from .maintenance import exclusive_prefix_sum

    if merges is not None:
        from .bpe import bpe_symbol_count_col

        sized = docs.select(
            F.col(id_col),
            bpe_symbol_count_col("text", merges).alias("n_tokens"),
        )
    elif n_tokens_col is None:
        sized = docs.select(
            F.col(id_col),
            F.size(tokens_col("text")).cast("long").alias("n_tokens"),
        )
    else:
        sized = docs.select(
            F.col(id_col),
            F.col(n_tokens_col).cast("long").alias("n_tokens"),
        )
    sized = sized.where(F.col("n_tokens") > 0)
    ps = exclusive_prefix_sum(sized, id_col, "n_tokens", n_buckets)
    start = F.col("prev")
    end = F.col("prev") + F.col("n_tokens")
    first_row = F.floor(start / row_tokens).cast("long")
    last_row = F.floor((end - 1) / row_tokens).cast("long")
    rows = ps.select(
        id_col,
        "n_tokens",
        start.alias("__start"),
        F.explode(F.sequence(first_row, last_row)).alias("row_id"),
    )
    seg_start = F.greatest(
        F.col("__start"), F.col("row_id") * row_tokens
    )
    seg_end = F.least(
        F.col("__start") + F.col("n_tokens"),
        (F.col("row_id") + 1) * row_tokens,
    )
    return rows.select(
        id_col,
        "row_id",
        (seg_start - F.col("row_id") * row_tokens)
        .cast("long")
        .alias("offset_in_row"),
        (seg_start - F.col("__start")).cast("long").alias(
            "offset_in_doc"
        ),
        (seg_end - seg_start).cast("long").alias("seg_tokens"),
        "n_tokens",
    )


def materialize_rows(
    docs: DataFrame,
    manifest: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(row_id, n_docs, n_tokens, text): materialize the
    :func:`pack_documents` manifest into actual training-row text —
    each document segment's tokens are sliced by (offset_in_doc,
    seg_tokens) and stitched in offset_in_row order.  The manifest
    IS the contract: this op reads only the documents a row
    references (semi-join shape), so materializing any subset of
    rows — one shard, one retry, one debugging row — never rescans
    the corpus.

    Trailing rows may be short (n_tokens < row size); everything
    else arrives exactly full (the manifest invariant, re-checked
    here only by construction).  Token slicing re-runs the engine
    tokenizer, so text joined back from the SAME docs frame used for
    planning reproduces the counts bit-for-bit.

    Plan: one join manifest→docs on the doc id (the manifest side
    carries only offsets — tiny columns), per-segment slice+join
    projection, then ONE row_id groupBy whose concat orders by a
    sorted struct array (the char_entropy convention: deterministic
    on any partitioning).
    """
    segs = manifest.join(
        docs.select(F.col(id_col), tokens_col("text").alias("__t")),
        id_col,
    ).select(
        "row_id",
        "offset_in_row",
        "seg_tokens",
        F.array_join(
            F.slice(
                F.col("__t"),
                F.col("offset_in_doc").cast("int") + 1,
                F.col("seg_tokens").cast("int"),
            ),
            " ",
        ).alias("__frag"),
    )
    return (
        segs.groupBy("row_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("seg_tokens").cast("long").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("offset_in_row", "__frag")
                        )
                    ),
                    lambda s: s["__frag"],
                ),
                " ",
            ).alias("text"),
        )
    )
