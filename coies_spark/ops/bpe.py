"""Distributed BPE tokenizer induction: learn byte-pair-encoding
merges from the corpus (Sennrich et al. 2016, ACL — the algorithm
behind GPT/LLaMA tokenizers) as unrolled declarative rounds.  The
third trainable operator (after the CBOW embedder and the logistic
quality classifier), and the only one that is float-free: every
quantity is an integer count or a string, so the trained merge table
is EXACT on any engine, partitioning, or task order — no rounding
pins needed.

The production shape (why this scales to 100 TB):

* ONE corpus pass builds the word-frequency table (explode tokens →
  map-side-combinable groupBy) — the classic trainer optimization:
  BPE statistics only depend on (distinct word, count), and the word
  table is millions of rows where the corpus is trillions;
* every merge round then runs on the compact word table: adjacent
  symbol pairs weighted by word count (one small groupBy), argmax by
  (count DESC, pair ASC) — a deterministic 1-row ``orderBy.limit(1)``
  broadcast — and the merge applied to all words at once.

Merge application is the portable trick that keeps engines
bit-identical WITHOUT per-row loop UDFs: word symbol state is a
string in which every symbol owns BOTH its flanking spaces
(``"abc"`` → ``" a  b  c "`` — two spaces between symbols), so the
occurrences of merge (l, r) — the literal ``" l  r "`` — never share
characters, and one left-to-right non-overlapping literal
``replace(s, " l  r ", " lr ")`` IS classic greedy BPE application
(leftmost-first, restart after each merge).  With a shared-space
encoding (`" a b c "`) that equivalence fails: in a run of 5+ equal
symbols the replace scan and the greedy scan pick different pairs.
Java (`F.replace`), DuckDB `replace`, and Python `str.replace` all
implement the same leftmost non-overlapping scan (verified against a
pure-Python greedy reference in tests), so trainer and oracle agree
bit-for-bit.

Unrolling bounds the merge count per plan (each round adds one small
aggregate + one projection layer); real vocabularies want thousands
of merges, which a driver loop over the SAME round body provides —
each round is one tiny job on the word table, not a corpus pass, so
30k merges cost 30k word-table aggregates and zero corpus rescans.
The unrolled form here keeps the whole trainer a single inspectable
(and DuckDB-oracle-able) plan for moderate merge counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col

# Two spaces: the inter-symbol boundary in the owned-flanks encoding.
SYM_SEP = "  "


def _sym_init(word: Column) -> Column:
    """Initial symbol string: each character rendered with its own
    flanking spaces (``"abc"`` → ``" a  b  c "``)."""
    return F.regexp_replace(word, "(.)", " $1 ")


def _sym_count(s: Column) -> Column:
    """Number of symbols in a state string."""
    return F.size(F.split(F.trim(s), SYM_SEP))


def word_freqs(docs: DataFrame) -> DataFrame:
    """(word, n, s): the word-frequency table with initial symbol
    state — the ONE corpus-sized pass of BPE training."""
    return (
        docs.select(F.explode(tokens_col("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select("word", "n", _sym_init(F.col("word")).alias("s"))
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(lhs, rhs, c): adjacent symbol pairs weighted by word count."""
    sym = F.split(F.trim(F.col("s")), SYM_SEP)
    n_sym = F.size(sym)
    pairs = F.zip_with(
        F.slice(sym, 1, F.greatest(n_sym - 1, F.lit(0))),
        F.slice(sym, 2, F.greatest(n_sym - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
    )
    return (
        words.select("n", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("n").cast("long").alias("c"))
    )


def _apply_merge(s: Column, lhs: Column, rhs: Column) -> Column:
    """Greedy BPE application of one merge to a symbol string: one
    literal replace (see module docstring for why this is exact)."""
    pat = F.concat(F.lit(" "), lhs, F.lit(SYM_SEP), rhs, F.lit(" "))
    rep = F.concat(F.lit(" "), lhs, rhs, F.lit(" "))
    return F.replace(s, pat, rep)


def bpe_merges(docs: DataFrame, n_merges: int = 8) -> DataFrame:
    """(rank, lhs, rhs, merged): the learned merge table — rank is
    the merge order (0-based), ``merged = lhs || rhs`` joins the
    vocabulary as a new symbol from that round on.  Ties in pair
    frequency break to the lexicographically smallest (lhs, rhs), so
    the table is fully deterministic (symbols are token substrings —
    no spaces — so binary string order agrees across engines).

    If the corpus exhausts mergeable pairs before ``n_merges`` (every
    word a single symbol), later rounds emit no row — the output may
    be shorter than requested, never padded.

    Scale: one corpus pass (the word-frequency build), then per round
    one word-table aggregate + a 1-row broadcast + a projection — see
    module docstring for the unrolled-vs-driver-loop trade.
    """
    if n_merges < 1:
        raise ValueError("bpe_merges: n_merges must be >= 1")
    words = word_freqs(docs).localCheckpoint(eager=False)
    out = None
    for rank in range(n_merges):
        best = (
            _pair_counts(words)
            .orderBy(F.col("c").desc(), "lhs", "rhs")
            .limit(1)
        )
        row = best.select(
            F.lit(rank).cast("long").alias("rank"),
            "lhs",
            "rhs",
            F.concat("lhs", "rhs").alias("merged"),
        )
        out = row if out is None else out.unionByName(row)
        words = (
            words.crossJoin(F.broadcast(best))
            .select(
                "word",
                "n",
                _apply_merge(
                    F.col("s"), F.col("lhs"), F.col("rhs")
                ).alias("s"),
            )
            # lineage cut per round: round k's pair counts otherwise
            # re-apply every prior round's merge chain from the base
            # word table (O(rounds²) recomputation) and the unrolled
            # codegen grows with the round number
            .localCheckpoint(eager=False)
        )
    return out


def bpe_symbol_count_col(
    text_col: str, merges: list[tuple[str, str]]
) -> Column:
    """The number of BPE tokens a trained merge list produces for a
    text column — as ONE pure string expression (long), the unit
    every packing/budget op should count in, because training
    loaders consume TOKENIZER tokens, not whitespace words, and the
    two differ by exactly the per-language fertility factor
    (:func:`bpe_fertility` measures it at 1.3–2× on real mixes).
    Shared by :func:`bpe_segment` and the ``merges=`` mode of
    ``pack_turns`` / ``sliding_chunks`` / ``pack_documents`` /
    ``with_bpe_token_counts``, so budget counting and segmentation
    can never drift apart.  Zero shuffle, whole-stage codegen."""
    toks = tokens_col(text_col)
    word_state = F.transform(toks, lambda t: _sym_init(t))
    for lhs, rhs in merges:
        word_state = F.transform(
            word_state,
            lambda s: _apply_merge(s, F.lit(lhs), F.lit(rhs)),
        )
    return F.aggregate(
        word_state,
        F.lit(0).cast("long"),
        lambda acc, s: acc + _sym_count(s),
    )


def with_bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Input + ``out_col``: every row annotated with its trained-
    tokenizer token count — the enrichment that turns any op with an
    ``n_tokens_col`` knob (``token_budget_sample``, ``epoch_plan``,
    ``mixture_rates``, ``pack_documents``) into a BPE-budgeted one by
    composition.  Pure projection; the merge table ships as plan
    literals (the streaming-weights pattern — vocab-scale tables are
    driver-safe by construction)."""
    return docs.withColumn(
        out_col, bpe_symbol_count_col(text_col, merges)
    )


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, n_tokens, n_bpe_symbols, compression): apply a
    trained merge list (``[(r.lhs, r.rhs) for r in
    bpe_merges(...).collect()]`` — the merge table is tiny and
    driver-safe by construction, shipping as plan literals, the
    streaming-weights pattern) to every document and report the
    symbol-level compression the tokenizer achieves — the number a
    tokenizer owner actually watches (symbols/token ↓ as merges
    learn the corpus).

    Application order = training order, each merge the same exact
    greedy replace as training, so segmenting the training corpus
    reproduces the trainer's final word states bit-for-bit (pinned
    by test).

    Scale: a pure string-expression projection over the corpus —
    whole-stage codegen, zero shuffle (plan-tested).
    """
    toks = tokens_col("text")
    n_sym = bpe_symbol_count_col("text", merges)
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        n_sym.alias("n_bpe_symbols"),
        F.round(
            F.try_divide(n_sym, F.size(toks).cast("long")), 6
        ).alias("compression"),
        *keep_cols,
    )


def bpe_fertility(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    lang_col: str = "lang",
) -> DataFrame:
    """(lang, n_docs, n_tokens, n_symbols, fertility): per-language
    tokenizer-equity table — corpus-level BPE symbols per whitespace
    word, by language.  Fertility is THE multilingual tokenizer
    gauge: a merge table trained on one language's distribution
    segments other languages into more symbols per word, which taxes
    their context budget and training compute proportionally
    (the reason tokenizer reports always publish per-language
    fertility next to vocabulary size).

    Corpus-level ratio (Σ symbols / Σ tokens, round 6) rather than a
    mean of per-doc ratios, so long documents weigh what they cost;
    empty-token languages yield NULL (try_divide).

    Scale: :func:`bpe_segment`'s zero-shuffle projection with the
    language column riding along, then one map-side-combinable
    groupBy onto languages-many keys.
    """
    seg = bpe_segment(docs, merges, keep_cols=(lang_col,))
    return (
        seg.groupBy(F.col(lang_col).alias("lang"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("n_bpe_symbols").cast("long").alias("n_symbols"),
        )
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "n_symbols",
            F.round(
                F.try_divide(F.col("n_symbols"), F.col("n_tokens")), 6
            ).alias("fertility"),
        )
    )
