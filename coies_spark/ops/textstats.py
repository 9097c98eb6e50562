"""Text-analysis operators over a documents table.

Inputs: ``documents(doc_id bigint, text string, lang string,
source string, n_chars bigint)``.

All operators are pure Catalyst expressions (split / higher-order
array functions / window aggregation) — no Python in the hot path, so
they stay inside whole-stage codegen and scale linearly with input
splits.  Token semantics reuse the reference tokenizer class
(``functions.tokenize.tokens_col``, parity with
/root/reference/common/file_tools.py:66-71).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.tokenize import tokens_col

_DEC = "decimal(28,12)"  # the order-exact accumulation convention

# BPE-ish pre-tokenization classes: letter runs, digit runs, single
# non-alphanumeric marks (GPT-2-style pre-split, simplified; RE2- and
# Java-regex-compatible).
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# ASCII punctuation class, shared with the reference tokenizer.
PUNCT_CLASS = "[!-/:-@\\[-`{-~]"


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting three ways: reference tokenizer, whitespace,
    BPE-ish regex pre-tokenizer."""
    toks = tokens_col("text")
    ws = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    bpe = F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_PATTERN), 0)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(ws).alias("n_ws_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic document-quality features + combined score.

    Features (all ratios in [0,1], rounded to 6dp for cross-engine
    comparability): mean token length, stopword ratio, digit-token
    ratio, punctuation-character ratio.
    """
    d = docs.select("doc_id", "text", tokens_col("text").alias("toks"))
    return d.select("doc_id", *quality_feature_cols("toks").values())


def quality_feature_cols(tokens: str = "toks") -> dict[str, Column]:
    """The quality feature/score columns over a pre-aliased token
    array column plus ``text`` — shared between ``quality_scores`` and
    the fused curation pass so the formula can never drift."""
    n_tok = F.size(tokens)
    tok_chars = F.length(F.array_join(tokens, ""))
    n_stop = F.size(F.filter(tokens, lambda t: t.isin(*STOPWORDS)))
    n_digit = F.size(F.filter(tokens, lambda t: t.rlike("^[0-9]+$")))
    n_punct = F.length("text") - F.length(
        F.regexp_replace("text", PUNCT_CLASS, "")
    )
    # try_divide: empty/punct-only docs yield NULL ratios instead of an
    # ANSI divide-by-zero error (matches DuckDB's x/0 → NULL)
    stop_ratio = F.round(F.try_divide(n_stop, n_tok), 6)
    digit_ratio = F.round(F.try_divide(n_digit, n_tok), 6)
    punct_ratio = F.round(F.try_divide(n_punct, F.length("text")), 6)
    return {
        "n_tokens": n_tok.alias("n_tokens"),
        "avg_token_len": F.round(F.try_divide(tok_chars, n_tok), 6).alias(
            "avg_token_len"
        ),
        "stopword_ratio": stop_ratio.alias("stopword_ratio"),
        "digit_ratio": digit_ratio.alias("digit_ratio"),
        "punct_ratio": punct_ratio.alias("punct_ratio"),
        "quality": F.round(
            0.4 * stop_ratio
            + 0.3 * (1.0 - digit_ratio)
            + 0.3 * (1.0 - punct_ratio),
            6,
        ).alias("quality"),
    }


def language_id(docs: DataFrame, top_k: int = 20) -> DataFrame:
    """Corpus-trained token-profile language ID (n-gram-heuristic
    family): build per-language top-``top_k`` token profiles from the
    labeled corpus, then classify each document by profile-hit count
    (ties → lexicographically smallest language; no hits → 'und').

    Two shuffles: profile build (tiny output → broadcast) and the
    per-document argmax.  The profile table is O(langs × top_k) —
    broadcast-joined, so classification adds no shuffle on the big side.
    """
    toks = docs.select("doc_id", "lang", F.explode(tokens_col("text")).alias("tok"))
    return _profile_classify(docs, toks, top_k)


def language_id_chargram(
    docs: DataFrame, n: int = 3, top_k: int = 40
) -> DataFrame:
    """Character-n-gram language ID (the textcat/CLD heuristic,
    Cavnar & Trenkle '94 family): same corpus-trained-profile + argmax
    classifier as ``language_id``, but featurized on lowercased char
    ``n``-grams (including spaces) instead of whole tokens — the
    variant that works on unsegmented scripts and catches
    orthographic signals tokens miss.

    Char grams come from the linear ``shingles_col`` over the
    char-split text (sep="") — never per-index substring inside a
    lambda (the documented O(len²) trap).  Unicode note: Spark splits
    on UTF-16 code units, DuckDB's substr on characters; identical on
    BMP text (the corpus), divergent only for supplementary-plane
    chars.
    """
    chars = F.split(F.lower(F.col("text")), "")
    grams = docs.select(
        "doc_id",
        "lang",
        F.explode(shingles_col(n, chars, sep="")).alias("tok"),
    )
    return _profile_classify(docs, grams, top_k)


def _profile_classify(
    docs: DataFrame, feats: DataFrame, top_k: int
) -> DataFrame:
    """Shared profile-train + argmax-classify core: ``feats`` is a
    (doc_id, lang, tok) long frame; see ``language_id`` for the
    two-stage sharded top-k rationale."""
    toks = feats
    freq = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    # Two-stage top-k: rank within (lang, salt) shards first, then rank
    # the ≤ n_salts × top_k shard winners per lang.  A language's global
    # top-k is necessarily in its shard's top-k, so the result is
    # identical to the single-window form — but no task ever sees more
    # than one shard of a language's vocabulary (the web-scale fix for
    # the per-lang window straggler; same ordering → same rows).
    n_salts = 16
    salt = F.pmod(F.xxhash64("tok"), F.lit(n_salts))
    w_shard = Window.partitionBy("lang", "salt").orderBy(
        F.desc("cnt"), F.asc("tok")
    )
    shard_top = (
        freq.withColumn("salt", salt)
        .withColumn("srn", F.row_number().over(w_shard))
        .where(F.col("srn") <= top_k)
    )
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("tok"))
    profile = (
        shard_top.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_k)
        .select("lang", "tok")
        .withColumnRenamed("lang", "profile_lang")
    )
    hits = (
        toks.select("doc_id", "tok")
        .join(F.broadcast(profile), "tok")
        .groupBy("doc_id", "profile_lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    w2 = Window.partitionBy("doc_id").orderBy(
        F.desc("hits"), F.asc("profile_lang")
    )
    best = (
        hits.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("profile_lang").alias("pred_lang"))
    )
    return (
        docs.select("doc_id", "lang")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("pred_lang", F.lit("und")).alias("pred_lang"),
            (F.col("pred_lang") == F.col("lang")).alias("correct"),
        )
    )


def shingles_col(
    n: int, tokens: Column | str = "toks", sep: str = " "
) -> Column:
    """array<string> of ``sep``-joined ``n``-token shingles (stride 1).

    Documents shorter than ``n`` tokens yield one truncated shingle
    (empty docs one ``""`` shingle) — the same convention as DuckDB
    inclusive slicing, so oracles match.

    Construction is ``zip_with`` over n−1 shifted suffix slices, with
    every reference to ``tokens`` OUTSIDE lambda bodies.  The obvious
    per-index form — ``transform(sequence(...), i → array_join(
    slice(t, i, n)))`` — re-evaluates ``t`` for every element when it
    is a computed expression (Catalyst does no subexpression
    elimination inside higher-order lambdas), turning shingling
    O(len²): measured 87 s for ONE 20k-token document, i.e. every
    shingle consumer (Jaccard, MinHash, decontamination, repetition)
    stalls on web-length docs.  The zip form evaluates ``t`` a
    constant number of times per row.
    """
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    size = F.size(t)
    acc = t
    for k in range(2, n + 1):
        # suffix starting at position k; zip_with pads the shorter
        # side with NULL and concat_ws skips NULLs, so trailing
        # elements shorten naturally before the final truncation
        acc = F.zip_with(
            acc,
            F.slice(t, k, size),
            lambda a, b: F.concat_ws(sep, a, b),
        )
    out = F.slice(acc, 1, F.greatest(size - (n - 1), F.lit(1)))
    return F.when(size == 0, F.array(F.lit(""))).otherwise(out)


def dup_ngram_frac_col(n: int, tokens: Column | str = "toks") -> Column:
    """1 − distinct/total stride-1 n-grams, rounded 6dp — the Gopher
    duplicate n-gram fraction as a single array-side column; shared by
    ``repetition_stats`` and both curation passes."""
    sh = shingles_col(n, tokens)
    return F.round(
        1 - F.try_divide(F.size(F.array_distinct(sh)), F.size(sh)), 6
    )


def doc_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct n-token shingles per document."""
    return (
        docs.select("doc_id", tokens_col("text").alias("toks"))
        .select("doc_id", F.explode(shingles_col(n)).alias("shingle"))
        .distinct()
    )


def ngram_windows(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, n_windows, n_distinct): stride-1 n-token window count
    (W1, utilities.py:126-129 semantics: len(tokens)-n+1, min 1) and the
    deduplicated count (W2 'sequenced' windows as a set,
    utilities.py:134-139)."""
    t = docs.select("doc_id", tokens_col("text").alias("toks"))
    sh = shingles_col(n)
    return t.select(
        "doc_id",
        F.size(sh).cast("long").alias("n_windows"),
        F.size(F.array_distinct(sh)).cast("long").alias("n_distinct"),
    )


def tfidf_keywords(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, tok, score, rank): top-``k`` tokens per document by
    tf·idf (idf = ln(N/df) over the corpus), deterministic tie-break
    (score desc, token asc).

    Two shuffles: the (doc, token) count and the token df; the df table
    is vocabulary-sized → broadcast back onto the counts.  The corpus
    size N is a broadcast 1-row aggregate cross-joined into the plan —
    no separate driver-side job/scan to fetch the scalar.
    """
    toks = docs.select("doc_id", F.explode(tokens_col("text")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.agg(F.countDistinct("doc_id").alias("__n_docs"))
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf")
                * F.log(F.col("__n_docs").cast("double") / F.col("df")),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("doc_id", "tok", "score", "rank")
    )


def bm25_topk(
    docs: DataFrame,
    query: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
) -> DataFrame:
    """(doc_id, score, rank): the ``topk`` documents by BM25 against a
    bag-of-terms query (Robertson-Spärck Jones; the Lucene
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf, which is non-negative
    for any df).

    Per (doc, term): idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    rounded 9dp; the per-doc sum re-rounds to 6dp, so scores — and the
    (score DESC, doc_id ASC) ranking built on them — are bit-identical
    across engines (the PageRank two-stage rounding convention).

    Plan: the exploded token stream is filtered to the query terms
    BEFORE any aggregation (an isin literal filter, pushed into the
    scan projection), so tf/df aggregate over corpus-frequency-of-
    query-terms rows, not the corpus; N and avgdl are one broadcast
    1-row aggregate.  The global top-k is ``orderBy().limit(topk)`` —
    Spark's distributed TakeOrdered, NOT a single-partition rank
    window over the corpus — with the rank assigned afterwards on the
    k-row result.  Two corpus scans (doc lengths; query-term tf).
    """
    if not query:
        raise ValueError("bm25_topk: query must be non-empty")
    # materialize doc lengths once: lens feeds both the stats
    # aggregate and the scored join, and Catalyst does not dedupe the
    # shared subtree — without the cut the corpus would be tokenized
    # a third time (the pagerank/LPA shared-frame convention)
    lens = docs.select(
        "doc_id", F.size(tokens_col("text")).alias("dl")
    ).localCheckpoint(eager=False)
    stats = lens.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("dl").alias("__avgdl"),
    )
    tf = (
        docs.select(
            "doc_id", F.explode(tokens_col("text")).alias("tok")
        )
        .where(F.col("tok").isin(list(query)))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df), "tok")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                F.log(
                    1.0
                    + (F.col("__n") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1
                    * (1.0 - b + b * F.col("dl") / F.col("__avgdl"))
                ),
                9,
            ).alias("term_score"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 6).alias("score"))
    )
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(topk)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select("doc_id", "score", "rank")


def textrank_terms(
    docs: DataFrame,
    window: int = 2,
    iters: int = 3,
    damping: float = 0.85,
    topk: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """(term, pr, rank): TextRank keyword extraction (Mihalcea &
    Tarau, EMNLP 2004, "TextRank: Bringing Order into Text") — build
    the corpus term co-occurrence graph (two candidate terms within
    ``window`` token positions in a document share an undirected,
    unweighted edge) and rank terms by PageRank over it; the top
    ``topk`` terms are the corpus keywords.  Candidate terms are
    engine-tokenizer tokens minus :data:`STOPWORDS` and single
    characters (the length/stopword gate stands in for the paper's
    POS filter — no tagger in this engine by design); positions are
    counted in the tokenized stream BEFORE the gate, so removed
    tokens still separate their neighbours.

    Reuses :func:`~coies_spark.operators.graph.pagerank` verbatim —
    same unrolled power iteration, same per-round 9dp rounding, so
    iterates and the (pr DESC, term ASC) ranking are bit-identical
    across engines.

    Scale: the co-occurrence join is an EQUI-join on
    (doc_id, pos + δ) with δ exploded to 1..``window`` — O(tokens ·
    window) pair rows, never a per-document all-pairs; the edge set
    dedups to vocabulary² at most but in practice Zipf-thins, and
    PageRank's 2-shuffles-per-round bound takes over.  The global
    top-k is ``orderBy().limit()`` — distributed TakeOrdered, never
    a single-partition rank over the vocabulary.
    """
    if window < 1:
        raise ValueError("textrank_terms: window must be >= 1")
    from ..operators.graph import pagerank

    toks = docs.select(
        "doc_id", F.posexplode(tokens_col(text_col)).alias("pos", "tok")
    ).where(
        (F.length("tok") > 1) & ~F.col("tok").isin(*STOPWORDS)
    )
    a = toks.select(
        "doc_id",
        "tok",
        F.explode(
            F.sequence(F.lit(1), F.lit(int(window)))
        ).alias("__d"),
        "pos",
    ).select(
        "doc_id",
        F.col("tok").alias("ta"),
        (F.col("pos") + F.col("__d")).alias("pb"),
    )
    b = toks.select(
        "doc_id", F.col("pos").alias("pb"), F.col("tok").alias("tb")
    )
    edges = (
        a.join(b, ["doc_id", "pb"])
        .where(F.col("ta") != F.col("tb"))
        .select(
            F.least("ta", "tb").alias("src"),
            F.greatest("ta", "tb").alias("dst"),
        )
        .distinct()
    )
    pr = pagerank(edges, iters=iters, damping=damping)
    top = pr.orderBy(F.desc("pr"), F.asc("node")).limit(topk)
    w = Window.orderBy(F.desc("pr"), F.asc("node"))
    return top.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select(F.col("node").alias("term"), "pr", "rank")


def textrank_sentences(
    docs: DataFrame,
    topk: int = 2,
    iters: int = 3,
    damping: float = 0.85,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, sent_idx, sentence, pr, rank): extractive
    summarization by sentence-level TextRank (Mihalcea & Tarau 2004
    §4) — per document, rank sentences by weighted PageRank over the
    sentence-similarity graph and keep the top ``topk``; read back
    in ``sent_idx`` order they are the extractive summary (the
    summarization task whose ROUGE evaluation machinery this engine
    already carries — ``rouge1_pairs``/``rougel_pairs`` score these
    against gold abstracts directly).

    Conventions:

    * sentence boundaries are the clause recipe (``[.;!?]``, trim,
      empties dropped, ORIGINAL split indexes — the
      ``kg.assertion_clauses`` convention);
    * similarity w(Si, Sj) = |content-token overlap| / (|Si| + |Sj|)
      over gated distinct tokens (the :func:`textrank_terms` gate) —
      the paper's log-length normalization is replaced by the common
      length-sum variant because ln() is not correctly-rounded
      identically across engines, and the rational form keeps the
      cross-engine bit-exact contract with no transcendental;
    * weighted PageRank per DOCUMENT: pr' = (1−d)/N_doc +
      d·Σ_j pr_j·w_ij/W_j, per-round 9dp rounding (the
      ``operators.graph.pagerank`` convention); sentences with no
      similar sibling still rank (they hold the (1−d)/N floor).

    Scale: the overlap join is an equi-join on (doc_id, token) — the
    inverted-index shape, never per-document all-pairs unless the
    document IS all-similar (the SemDeDup block-cap argument);
    PageRank rounds are two keyed shuffles each; the final top-k
    window partitions by doc_id, so no global sort anywhere.
    """
    if topk < 1:
        raise ValueError("textrank_sentences: topk must be >= 1")
    d = float(damping)
    sents = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col(text_col), r"[.;!?]")).alias(
                "sent_idx", "__s"
            ),
        )
        .select(
            "doc_id",
            "sent_idx",
            F.trim(F.col("__s")).alias("sentence"),
        )
        .where(F.col("sentence") != "")
        .localCheckpoint(eager=False)
    )
    stoks = sents.select(
        "doc_id",
        "sent_idx",
        F.explode(F.array_distinct(tokens_col("sentence"))).alias("tok"),
    ).where((F.length("tok") > 1) & ~F.col("tok").isin(*STOPWORDS))
    ncnt = stoks.groupBy("doc_id", "sent_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ov = (
        stoks.select("doc_id", F.col("sent_idx").alias("ia"), "tok")
        .join(
            stoks.select(
                "doc_id", F.col("sent_idx").alias("ib"), "tok"
            ),
            ["doc_id", "tok"],
        )
        .where(F.col("ia") < F.col("ib"))
        .groupBy("doc_id", "ia", "ib")
        .agg(F.count(F.lit(1)).cast("long").alias("ov"))
    )
    half = (
        ov.join(
            ncnt.select(
                "doc_id",
                F.col("sent_idx").alias("ia"),
                F.col("n").alias("na"),
            ),
            ["doc_id", "ia"],
        )
        .join(
            ncnt.select(
                "doc_id",
                F.col("sent_idx").alias("ib"),
                F.col("n").alias("nb"),
            ),
            ["doc_id", "ib"],
        )
        .select(
            "doc_id",
            "ia",
            "ib",
            F.round(
                F.col("ov") / (F.col("na") + F.col("nb")), 9
            ).alias("w"),
        )
    )
    edges = half.select(
        "doc_id",
        F.col("ia").alias("src"),
        F.col("ib").alias("dst"),
        "w",
    ).unionByName(
        half.select(
            "doc_id",
            F.col("ib").alias("src"),
            F.col("ia").alias("dst"),
            "w",
        )
    ).localCheckpoint(eager=False)
    wsum = edges.groupBy("doc_id", "src").agg(
        F.sum(F.col("w").cast("decimal(28,12)"))
        .cast("double")
        .alias("wsum")
    )
    nodes = sents.select("doc_id", "sent_idx")
    nd = nodes.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("nd")
    )
    pr = nodes.join(nd, "doc_id").select(
        "doc_id",
        "sent_idx",
        F.round(F.lit(1.0) / F.col("nd"), 9).alias("pr"),
    )
    for _ in range(iters):
        contrib = (
            edges.join(
                pr.select(
                    "doc_id",
                    F.col("sent_idx").alias("src"),
                    "pr",
                ),
                ["doc_id", "src"],
            )
            .join(wsum, ["doc_id", "src"])
            .groupBy("doc_id", F.col("dst").alias("sent_idx"))
            .agg(
                F.sum(
                    F.col("pr") * F.col("w") / F.col("wsum")
                ).alias("s")
            )
        )
        pr = (
            nodes.join(nd, "doc_id")
            .join(contrib, ["doc_id", "sent_idx"], "left")
            .select(
                "doc_id",
                "sent_idx",
                F.round(
                    F.lit(1.0 - d) / F.col("nd")
                    + F.lit(d) * F.coalesce("s", F.lit(0.0)),
                    9,
                ).alias("pr"),
            )
        )
    wtop = Window.partitionBy("doc_id").orderBy(
        F.desc("pr"), F.asc("sent_idx")
    )
    return (
        pr.withColumn("rank", F.row_number().over(wtop).cast("long"))
        .where(F.col("rank") <= topk)
        .join(sents, ["doc_id", "sent_idx"])
        .select("doc_id", "sent_idx", "sentence", "pr", "rank")
    )


def doc_fingerprint(docs: DataFrame, n: int = 3) -> DataFrame:
    """Rolling-shingle fingerprint: the minimum shingle digest per
    document (winnowing-style 1-of-document selection) plus the
    distinct-shingle count.  md5 is the cross-engine-portable digest."""
    sh = doc_shingles(docs, n)
    return sh.groupBy("doc_id").agg(
        F.min(F.md5(F.encode("shingle", "utf-8"))).alias("fingerprint"),
        F.countDistinct("shingle").alias("n_shingles"),
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = 3, w: int = 4
) -> DataFrame:
    """(doc_id, n_fp, fp_min, fp_digest): MOSS winnowing fingerprints
    (Schleimer, Wilkerson, Aiken, "Winnowing: Local Algorithms for
    Document Fingerprinting", SIGMOD'03).

    Every window of ``w`` consecutive ``k``-token shingle hashes
    selects its minimum; ties break to the RIGHTMOST minimal hash
    (robust winnowing), so two documents sharing a run of text select
    the SAME (hash, offset-aligned) fingerprints — the guarantee that
    makes the selected set a plagiarism/overlap index, which the
    1-of-document ``doc_fingerprint`` cannot provide.  Documents with
    fewer than ``w`` shingles form one whole-document window.

    Selection is encoded arithmetically so one ``array_min`` does the
    (hash asc, position desc) tie-break: key = hash·2²⁰ + (2²⁰−1−pos)
    (hash is the portable 32-bit md5 prefix, so keys stay < 2⁵²).
    The windowed min is a ``zip_with`` fold against ``w−1`` shifted
    suffix slices — the same O(len·w) no-lambda-recompute shape as
    :func:`shingles_col` (the per-index ``transform``+``slice`` form
    is O(len²) on web-length docs; see that docstring's measurement).
    Everything is array-side per row: ZERO shuffles, no Python, and
    the per-doc output is 3 scalars (count, min, digest-sum of the
    selected distinct (hash, pos) keys), so the operator composes
    with any downstream join without fan-out.
    """
    if w < 1 or k < 1:
        raise ValueError("winnow_fingerprints: k and w must be >= 1")
    m = 1 << 20  # position field width; docs cap at 2^20 shingles
    t = docs.select("doc_id", tokens_col("text").alias("toks"))
    sh = t.select("doc_id", shingles_col(k).alias("sh"))
    # enforce the key-packing cap: at pos >= 2^20 the position field
    # underflows into the hash field and fp_digest silently collides
    # with (hash-1, pos 0) keys — fail loudly instead (split
    # over-long docs, e.g. by turn, before fingerprinting)
    checked = F.when(F.size("sh") <= m, F.col("sh")).otherwise(
        F.raise_error(
            F.concat(
                F.lit("winnow_fingerprints: document "),
                F.col("doc_id"),
                F.lit(
                    f" exceeds {m} shingles; the 52-bit key packing"
                    " caps at 2^20 shingles per document"
                ),
            )
        )
    )
    hashed = sh.select(
        "doc_id",
        F.transform(
            checked,
            lambda s, i: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast(
                "long"
            )
            * m
            + (m - 1 - i),
        ).alias("keys"),
    )
    keys = F.col("keys")
    acc = keys
    for shift in range(1, w):
        # min against the suffix shifted by `shift`; slice args are
        # evaluated once per row (they are operator arguments, not
        # lambda-body references), keeping the fold O(len·w)
        acc = F.zip_with(
            acc,
            F.slice(keys, shift + 1, F.greatest(F.size(keys) - shift, F.lit(1))),
            lambda x, y: F.least(x, F.coalesce(y, x)),
        )
    n_h = F.size(keys)
    w_eff = F.least(F.lit(w), n_h)
    picked = F.array_distinct(F.slice(acc, 1, n_h - w_eff + 1))
    return hashed.select(
        "doc_id",
        F.size(picked).cast("long").alias("n_fp"),
        F.array_min(picked).cast("long").alias("fp_min"),
        F.aggregate(
            picked,
            F.lit(0).cast("long"),
            lambda a, x: a + F.floor(x / m).cast("long"),
        ).alias("fp_digest"),
    )


# the Gopher repetition gate thresholds — ONE definition shared by
# repetition_stats' keep verdict and the fused curation pass/report
# (ops.curate), so a tweak can never leave a stale copy behind
REP_TOP2_MAX = 0.20
REP_DUP3_MAX = 0.18


def repetition_keep_col() -> Column:
    """The repetition keep verdict as an expression over the
    ``top_2gram_frac`` / ``dup_3gram_frac`` columns."""
    return (F.col("top_2gram_frac") <= REP_TOP2_MAX) & (
        F.col("dup_3gram_frac") <= REP_DUP3_MAX
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021,
    "Scaling Language Models", §A1.1 quality heuristics), adapted from
    characters/lines to the reference tokenizer's token stream — the
    transcript corpus has no line structure.  Per document:

    - ``dup_token_frac``: 1 − distinct/total tokens (type-token
      complement);
    - ``dup_2gram_frac`` / ``dup_3gram_frac``: 1 − distinct/total
      stride-1 n-grams (Gopher's duplicate n-gram fraction);
    - ``top_2gram_frac``: occurrences of the modal 2-gram over total
      2-grams (Gopher's "fraction in most common n-gram");
    - ``keep``: the filter verdict at Gopher-like thresholds
      (top-2-gram ≤ 0.20 ∧ dup-3-gram ≤ 0.18).  Absolute thresholds
      are only meaningful past a minimum length — very short documents
      trivially exceed the modal-2-gram bound (3 tokens → 0.5), same
      as in the Gopher pipeline, which gates these filters behind a
      min word count.

    Shorter-than-n documents follow the repo's shingle convention (one
    truncated shingle; empty doc → one ``""`` shingle), so ratios stay
    defined and oracles match.  Empty docs have NULL token ratios
    (``try_divide``, matching DuckDB x/0 → NULL).

    Scale: token/3-gram ratios are array-side per row (zero shuffle,
    codegen); only the modal-2-gram count needs an explode +
    ``groupBy(doc_id, gram)`` — one shuffle with map-side partial
    aggregation, then a doc_id-keyed join back.  No corpus-global
    state, so the op is embarrassingly parallel over documents.
    """
    t = docs.select("doc_id", tokens_col("text").alias("toks"))
    arr = t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("nd_tok"),
        dup_ngram_frac_col(3).alias("dup_3gram_frac"),
    )
    f2 = (
        t.select("doc_id", F.explode(shingles_col(2)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a2 = f2.groupBy("doc_id").agg(
        F.sum("c").alias("n2"),
        F.count(F.lit(1)).alias("nd2"),
        F.max("c").alias("top2"),
    )
    scored = arr.join(a2, "doc_id").select(
        "doc_id",
        "n_tokens",
        F.round(1 - F.try_divide("nd_tok", "n_tokens"), 6).alias(
            "dup_token_frac"
        ),
        F.round(1 - F.try_divide("nd2", "n2"), 6).alias("dup_2gram_frac"),
        "dup_3gram_frac",
        F.round(F.try_divide("top2", "n2"), 6).alias("top_2gram_frac"),
    )
    return scored.withColumn("keep", repetition_keep_col())


# PII patterns, ordered: URLs first (they can contain @ and digits),
# then emails, IPv4, phone-shaped digit groups.  Each pattern is valid
# and equivalent in both Java regex (Spark) and RE2 (DuckDB oracles).
#
# The phone shape requires THREE separator-delimited digit groups
# (optional +/parens on the first) — a naive "9+ chars of digits and
# separators" class redacts ISO dates and number series as phones
# (measured: '2026-08-17' and '10 20 30 40 50' both matched), which
# corrupts the curated corpus.  Group sizes exclude the date shapes
# (YYYY-MM-DD / DD-MM-YYYY have a 2-digit middle or trailing group
# where the pattern demands 3-6).  Tradeoff, documented: bare
# separator-less numbers ('5551234567') are NOT matched — they are
# indistinguishable from ids/order numbers; thousand-separated
# numerals ('12 345 678') do match.
PII_PATTERNS = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    (
        "phone",
        r"\+?\(?[0-9]{2,4}\)?[\s.-][0-9]{3,6}[\s.-][0-9]{2,6}"
        r"([\s.-][0-9]{2,5})?",
        "<PHONE>",
    ),
)


def scrub_pii(docs: DataFrame) -> DataFrame:
    """(doc_id, scrubbed, n_url, n_email, n_ip, n_phone): text with
    URLs / emails / IPv4s / phone-shaped digit runs replaced by typed
    placeholder tokens, plus per-category match counts — the standard
    pre-training PII-redaction pass (C4/CCNet-style rule scrubbing).

    Patterns apply in order (URL before email before IP before phone)
    so a URL containing ``@`` or digit runs is redacted once as
    ``<URL>``; counts are measured on the same intermediate the
    replacement saw, so they always agree with the emitted text.

    Scale: a pure ``regexp_replace``/``regexp_extract_all`` projection
    — whole-stage codegen, zero shuffle, embarrassingly parallel.
    """
    scrubbed, counts = scrub_cols()
    return docs.select("doc_id", scrubbed.alias("scrubbed"), *counts)


def scrub_cols() -> tuple[Column, list[Column]]:
    """(scrubbed text column, per-category count columns) over
    ``text`` — shared between ``scrub_pii`` and the fused curation
    pass."""
    scrubbed = F.col("text")
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(scrubbed, F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return scrubbed, counts


def normalize_text(docs: DataFrame) -> DataFrame:
    """(doc_id, text_norm, changed, n_before, n_after): Unicode-NFC
    text normalization — the canonical first step of any multilingual
    curation pass (decomposed accents, compatibility variants, and
    stray control bytes otherwise split token identities: 'café' with
    a combining acute and 'café' precomposed are DIFFERENT shingles,
    dedup keys, and vocabulary entries until normalized).

    Three stages, cheapest engine for each:

    1. control-char strip (C0 minus tab/newline/CR, plus DEL) —
       JVM ``regexp_replace``, whole-stage codegen;
    2. NFC composition — a vectorized Arrow pandas UDF over
       ``pandas.Series.str.normalize('NFC')``: the ONE stage Spark has
       no built-in for, so it is the legitimate Python-boundary case
       (Arrow batches, no per-row Python);
    3. whitespace-run collapse + trim — JVM ``regexp_replace``.

    ``changed`` flags rows the pass altered (the monitoring hook: a
    sudden spike in changed-rate usually means an upstream ingest
    encoding regression).  DuckDB twin: ``nfc_normalize`` + the same
    two RE2-compatible regexes — NFC is a Unicode standard, so both
    engines compose identically.
    """
    from pyspark.sql.functions import pandas_udf

    # lambda form: the module's `from __future__ import annotations`
    # would stringify def-style type hints, which pandas_udf cannot
    # resolve for a function-local `pd` import
    _nfc = pandas_udf(lambda s: s.str.normalize("NFC"), "string")

    stripped = F.regexp_replace(
        F.col("text"), "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", ""
    )
    composed = _nfc(stripped)
    norm = F.trim(F.regexp_replace(composed, "\\s+", " "))
    return docs.select(
        "doc_id",
        norm.alias("text_norm"),
        (norm != F.col("text")).alias("changed"),
        F.length("text").cast("long").alias("n_before"),
        F.length(norm).cast("long").alias("n_after"),
    )


def char_entropy(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_distinct_chars, entropy): Shannon character
    entropy per document (bits/char, 6dp) — the compressibility
    quality signal: keyboard-mash, repeated-character padding, and
    template boilerplate sit far below natural text (English prose
    ≈ 4.0-4.4 bits/char over raw characters), while encrypted/binary
    junk pasted into text sits near the alphabet ceiling.  Standard
    curation stacks gate on a compression ratio; char entropy is the
    SQL-expressible equivalent with no codec dependency.

    Plan: ZERO shuffles — the character histogram is built array-side
    per row (distinct chars of the lowercased text, then one count
    per distinct char via ``array_size(filter(...))``), so the whole
    gauge is a projection inside whole-stage codegen.  Cost is
    O(distinct_chars × len) per document with distinct_chars bounded
    by the alphabet (≤ a few hundred for any natural script), NOT
    O(len²).  Empty documents yield NULL entropy (no distribution to
    measure), matching SQL aggregate semantics.
    """
    # filter the empty element Spark's split('','') emits, so an
    # empty document measures 0 chars (and NULL entropy), not 1
    chars = F.filter(
        F.split(F.lower(F.col("text")), ""), lambda x: x != ""
    )
    uniq = F.array_distinct(chars)
    n = F.size(chars)
    # one count per distinct char, computed ONCE (the O(distinct ×
    # len) scan is the dominant per-row cost — folding over a counts
    # array instead of re-filtering inside the entropy term halves
    # it); the counts ride the SORTED distinct chars so the float
    # accumulation order (hence the last bit before rounding) is
    # engine-identical
    counts = F.transform(
        F.array_sort(uniq),
        lambda c: F.size(F.filter(chars, lambda x: x == c)),
    )
    ent = F.aggregate(
        counts,
        F.lit(0.0),
        lambda acc, cnt: acc - (cnt / n) * F.log2(cnt / n),
    )
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_chars"),
        F.size(uniq).cast("long").alias("n_distinct_chars"),
        F.when(n > 0, F.round(ent, 6)).alias("entropy"),
    )


def rrf_fuse(
    routes: list[DataFrame],
    k0: int = 60,
    topk: int = 10,
) -> DataFrame:
    """(doc_id, score, n_routes, rank): reciprocal-rank fusion
    (Cormack/Clarke/Büttcher SIGIR'09) of ``m`` ranked retrieval
    routes, each a small (doc_id, rank) frame — the standard hybrid-
    retrieval combiner (BM25 lexical route + ANN dense route + any
    reranker) that needs NO score calibration because it consumes
    only ranks: score = Σ_routes 1 / (k0 + rank).

    Exactness: per-doc contributions fold over the SORTED (route,
    rank) structs (the ``char_entropy`` sorted-fold convention), so
    float summation order — hence the 6dp-rounded score and the
    ranking built on it — is engine-identical.  Ties break (score
    DESC, doc_id ASC).

    Plan: the route frames are already top-k-sized (the expensive
    corpus work happened inside each route), so fusion is a union of
    m tiny frames → ONE groupBy(doc_id); the fused top-k is
    ``orderBy().limit()`` — distributed TakeOrdered, never a
    single-partition rank window over the union.
    """
    if not routes:
        raise ValueError("rrf_fuse: routes must be non-empty")
    if k0 < 0:
        # ranks are >= 1; a negative k0 would hit 1/(k0 + rank) = 1/0
        # as a mid-job ANSI ArithmeticException instead of here
        raise ValueError("rrf_fuse: k0 must be >= 0")
    if topk < 1:
        raise ValueError("rrf_fuse: topk must be >= 1")
    tagged = None
    for i, r in enumerate(routes):
        t = r.select(
            "doc_id",
            F.lit(i).alias("route"),
            F.col("rank").cast("long").alias("rank"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    fused = tagged.groupBy("doc_id").agg(
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("route", "rank"))),
                F.lit(0.0),
                lambda acc, x: acc + 1.0 / (F.lit(k0) + x["rank"]),
            ),
            6,
        ).alias("score"),
        F.count(F.lit(1)).cast("long").alias("n_routes"),
    )
    top = fused.orderBy(F.desc("score"), F.asc("doc_id")).limit(topk)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select("doc_id", "score", "n_routes", "rank")


def collocations(
    docs: DataFrame,
    min_count: int = 5,
    topk: int = 20,
) -> DataFrame:
    """(a, b, n_ab, n_a, n_b, pmi, rank): the ``topk`` adjacent-token
    bigrams by pointwise mutual information (Church & Hanks, CL 1990)
    — the oracled query face of the phrase-detection family
    (``core.embed.PhraseTable`` trains the same collocation signal
    for the reference's bigram phrasing, aaer_corpus.py:105-117).

    pmi = ln(n_ab · N² / (B · n_a · n_b)) with N = corpus tokens and
    B = corpus bigrams — a SINGLE float expression over integer
    counts, so scores are engine-exact with no rounding convention
    needed (rounded 6dp anyway for display stability).  ``min_count``
    suppresses the degenerate hapax-pair PMI spike (the reason raw
    PMI is unusable without a floor).

    Scale: two map-side-combinable counts (bigrams via zip_with of
    the token array against its own tail — array-side, no
    explode-then-window; unigrams via explode+groupBy), the unigram
    table joined back onto the bigram counts twice WITHOUT a
    broadcast hint — a web corpus's distinct-token vocabulary runs
    10⁸-10⁹ rows (Heaps' law), which would OOM a forced broadcast;
    AQE picks broadcast at bench scale and sort-merge at scale (the
    ``jaccard_pairs`` per-doc-sizes convention).  N/B ride one
    broadcast 1-row aggregate.  The global top-k is
    ``orderBy().limit()`` — distributed TakeOrdered, never a
    single-partition rank window over the vocabulary.
    """
    if min_count < 1:
        raise ValueError("collocations: min_count must be >= 1")
    toks = docs.select(tokens_col("text").alias("tk"))
    bi = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("tk"), 1, F.greatest(F.size("tk") - 1, F.lit(0))),
                F.slice(
                    F.col("tk"), 2, F.greatest(F.size("tk") - 1, F.lit(0))
                ),
                lambda x, y: F.struct(x.alias("a"), y.alias("b")),
            )
        ).alias("p")
    ).select("p.a", "p.b")
    nab = bi.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    uni = toks.select(F.explode("tk").alias("t")).groupBy("t").agg(
        F.count(F.lit(1)).alias("n_t")
    )
    totals = uni.agg(
        F.sum("n_t").alias("__n"),
    ).crossJoin(nab.agg(F.sum("n_ab").alias("__b")))
    scored = (
        nab.where(F.col("n_ab") >= min_count)
        .join(
            uni.select(F.col("t").alias("a"), F.col("n_t").alias("n_a")),
            "a",
        )
        .join(
            uni.select(F.col("t").alias("b"), F.col("n_t").alias("n_b")),
            "b",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "a",
            "b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(
                F.log(
                    F.col("n_ab")
                    * F.col("__n").cast("double")
                    * F.col("__n")
                    / (
                        F.col("__b").cast("double")
                        * F.col("n_a")
                        * F.col("n_b")
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    top = scored.orderBy(
        F.desc("pmi"), F.asc("a"), F.asc("b")
    ).limit(topk)
    wr = Window.orderBy(F.desc("pmi"), F.asc("a"), F.asc("b"))
    return top.withColumn(
        "rank", F.row_number().over(wr).cast("long")
    ).select("a", "b", "n_ab", "n_a", "n_b", "pmi", "rank")


def token_drift(
    docs_a: DataFrame,
    docs_b: DataFrame,
    min_count: int = 5,
    alpha0: float = 100.0,
    text_col: str = "text",
) -> DataFrame:
    """(token, cnt_a, cnt_b, delta, z): which tokens shifted between
    two corpus snapshots — the log-odds-ratio with an informative
    Dirichlet prior (Monroe, Colaresi & Quinn, "Fightin' Words",
    Political Analysis 2008).  The feed-monitoring gauge behind
    ``corpus_diff``'s row-level work-list: corpus_diff says WHICH
    docs changed, token_drift says WHAT the change is about — a
    template rollout, a language shift, a new spam family — before
    it reaches training.  Raw frequency ratios overweight rare
    tokens and χ² overweights common ones; the prior-smoothed
    z-score is the standard fix.

    Per token w with counts y_aw / y_bw, corpus totals n_a / n_b and
    prior α_w = alpha0 · (y_aw + y_bw) / (n_a + n_b):

    * delta = ln((y_aw + α_w)/(n_a + alpha0 − y_aw − α_w))
            − ln((y_bw + α_w)/(n_b + alpha0 − y_bw − α_w))
    * z = delta / sqrt(1/(y_aw + α_w) + 1/(y_bw + α_w))

    Exactness: counts are integer aggregates; every float is a
    PER-ROW scalar expression over them (no float summation), so the
    result is partitioning-independent; delta and z round 6dp.

    Scale: two map-side-combinable token-count groupBys, one
    full-outer join on token, totals carried by an in-plan broadcast
    crossJoin (no collect).  Tokens absent from one side get count 0
    — they drift hardest and must not be dropped by the join.
    ``min_count`` gates on the COMBINED count, symmetrically.
    """
    if alpha0 <= 0:
        raise ValueError("token_drift: alpha0 must be > 0")

    def _counts(d: DataFrame, name: str) -> DataFrame:
        return (
            d.select(
                F.explode(tokens_col(text_col)).alias("token")
            )
            .groupBy("token")
            .agg(F.count(F.lit(1)).cast("long").alias(name))
        )

    ca = _counts(docs_a, "cnt_a")
    cb = _counts(docs_b, "cnt_b")
    joined = ca.join(cb, "token", "full_outer").select(
        "token",
        F.coalesce("cnt_a", F.lit(0)).cast("long").alias("cnt_a"),
        F.coalesce("cnt_b", F.lit(0)).cast("long").alias("cnt_b"),
    )
    tot = joined.agg(
        F.sum("cnt_a").cast("long").alias("n_a"),
        F.sum("cnt_b").cast("long").alias("n_b"),
    )
    a0 = F.lit(float(alpha0))
    aw = a0 * (F.col("cnt_a") + F.col("cnt_b")) / (
        F.col("n_a") + F.col("n_b")
    )
    ya, yb = F.col("cnt_a").cast("double"), F.col("cnt_b").cast("double")
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    delta = F.log((ya + aw) / (na + a0 - ya - aw)) - F.log(
        (yb + aw) / (nb + a0 - yb - aw)
    )
    var = F.lit(1.0) / (ya + aw) + F.lit(1.0) / (yb + aw)
    return (
        joined.crossJoin(F.broadcast(tot))
        .where((F.col("cnt_a") + F.col("cnt_b")) >= min_count)
        .select(
            "token",
            "cnt_a",
            "cnt_b",
            F.round(delta, 6).alias("delta"),
            F.round(delta / F.sqrt(var), 6).alias("z"),
        )
    )


def zipf_alpha(docs: DataFrame, top_k: int = 200) -> DataFrame:
    """1 row (n_ranks, alpha, intercept, r2): the Zipf exponent of the
    corpus's token frequency distribution — OLS of ln(freq) on
    ln(rank) over the ``top_k`` most frequent tokens.  Natural
    language sits near alpha ≈ 1 (Zipf 1949); templated/synthetic/
    boilerplate-heavy corpora flatten (small alpha) or cliff (the
    r2 drops) — a corpus-level naturalness gauge alongside the
    per-doc quality/repetition filters, and a drift tripwire between
    snapshots (compare alpha, not 10⁶ token rows).

    Exactness: the (x, y) = (ln rank, ln count) terms are rounded 9dp
    and every OLS sum (Σx, Σy, Σxy, Σx²) runs in decimal(28,12) —
    order-independent — with slope/intercept/r² as closed-form
    column algebra on the 1-row sums, rounded 6.  alpha = −slope.

    Plan: one map-side-combinable token count, a distributed top-k
    (orderBy count desc, token asc + limit — TakeOrdered, no global
    sort materialized), then math on ``top_k`` rows.  r2 is NULL for
    degenerate fits (all counts equal → zero variance).
    """
    if top_k < 3:
        raise ValueError("zipf_alpha: top_k must be >= 3")
    counts = (
        docs.select(F.explode(tokens_col("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(top_k)
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    xy = counts.select(
        F.round(F.log(F.row_number().over(w).cast("double")), 9)
        .alias("x"),
        F.round(F.log(F.col("cnt").cast("double")), 9).alias("y"),
    )
    d = F.col
    sums = xy.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(d("x").cast(_DEC)).cast("double").alias("sx"),
        F.sum(d("y").cast(_DEC)).cast("double").alias("sy"),
        F.sum((d("x") * d("y")).cast(_DEC)).cast("double").alias("sxy"),
        F.sum((d("x") * d("x")).cast(_DEC)).cast("double").alias("sxx"),
        F.sum((d("y") * d("y")).cast(_DEC)).cast("double").alias("syy"),
    )
    slope = F.try_divide(
        d("k") * d("sxy") - d("sx") * d("sy"),
        d("k") * d("sxx") - d("sx") * d("sx"),
    )
    return sums.select(
        F.col("k").alias("n_ranks"),
        F.round(-slope, 6).alias("alpha"),
        F.round((d("sy") - slope * d("sx")) / d("k"), 6).alias(
            "intercept"
        ),
        F.round(
            F.try_divide(
                (d("k") * d("sxy") - d("sx") * d("sy"))
                * (d("k") * d("sxy") - d("sx") * d("sy")),
                (d("k") * d("sxx") - d("sx") * d("sx"))
                * (d("k") * d("syy") - d("sy") * d("sy")),
            ),
            6,
        ).alias("r2"),
    )


# Unicode script ranges shared by script_profile and its DuckDB twin:
# \x{...} class escapes parse identically in java.util.regex and RE2,
# and each named class matches EXACTLY one code point per hit, so
# regexp_count (Spark) == len(regexp_extract_all) (DuckDB).
SCRIPT_RANGES: tuple[tuple[str, str], ...] = (
    ("latin", "[A-Za-z]"),
    ("cjk", "[\\x{4e00}-\\x{9fff}]"),
    ("cyrillic", "[\\x{0400}-\\x{04ff}]"),
    ("arabic", "[\\x{0600}-\\x{06ff}]"),
    ("digit", "[0-9]"),
    ("space", "[\\x{0009}\\x{000a}\\x{000d}\\x{0020}]"),
)


def script_profile(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, latin_ratio, cjk_ratio, cyrillic_ratio,
    arabic_ratio, digit_ratio, space_ratio, other_ratio,
    dominant_script): per-document Unicode-SCRIPT composition — the
    lang-ID complement that catches what a token-profile model
    cannot: mixed-script spam (Cyrillic lookalikes inside Latin
    words), mojibake/encoding damage (high other_ratio), and
    wrong-script contamination inside a language shard (a "zh" shard
    whose docs are 90% Latin).  Web-scale curation gates on these
    ratios BEFORE spending model-based lang-ID or quality scoring.

    Each ratio counts code points in an explicit range class
    (``SCRIPT_RANGES`` — \\x{…} classes behave identically in Java
    regex and RE2, one code point per match) over total string
    length; other = 1 − Σ named.  Empty text → NULL ratios
    (try_divide) and dominant_script 'none'.  dominant_script is the
    argmax over the four SCRIPT classes (latin/cjk/cyrillic/arabic,
    ties to the first in that fixed order), 'none' when all four are
    zero.  Pure single-pass projection: no shuffle, no UDF,
    whole-stage codegen, embarrassingly parallel at any corpus size.
    """
    counts = {
        name: F.regexp_count(F.col("text"), F.lit(pat))
        for name, pat in SCRIPT_RANGES
    }
    n = F.length("text")
    named_sum = None
    for c in counts.values():
        named_sum = c if named_sum is None else named_sum + c
    scripts = ("latin", "cjk", "cyrillic", "arabic")
    mx = F.greatest(*[counts[s] for s in scripts])
    dominant = F.lit("none")
    for s in reversed(scripts):
        dominant = F.when(
            (counts[s] > 0) & (counts[s] == mx), F.lit(s)
        ).otherwise(dominant)
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_chars"),
        *[
            F.round(F.try_divide(counts[name], n), 6).alias(
                f"{name}_ratio"
            )
            for name, _ in SCRIPT_RANGES
        ],
        F.round(F.try_divide(n - named_sum, n), 6).alias("other_ratio"),
        dominant.alias("dominant_script"),
    )
