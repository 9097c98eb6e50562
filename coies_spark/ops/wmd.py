"""Word Mover's Distance family (the reference's M9 WMD variant slot).

The reference ranks candidate grams by gensim ``wmdistance`` (exact
earth-mover transport over word vectors; oneshot_test.py:500-513).
Exact EMD needs an LP/network-simplex solver (gensim delegates to
pyemd) — not available here and O(V³ log V) per pair anyway, which is
not a 100 TB-shape primitive.  What large-scale systems actually
compute — including gensim's own pruning pass — is the **Relaxed WMD
lower bound** (Kusner et al., "From Word Embeddings To Document
Distances", ICML'15 §4.2): each word moves all its mass to its nearest
counterpart, relaxing one of the two transport constraints; taking the
max of both directions gives the tightest of the two relaxations:

    RWMD(A,B) = max( Σ_t w_t^A · min_u d(t,u),  Σ_u w_u^B · min_t d(t,u) )

RWMD is exact whenever one side has a single token (the reference's
dominant 1-token-gram case) and is the standard prune-then-verify
candidate scorer at scale.

Word vectors here are md5-derived (8 dims from the 32-hex digest),
giving a deterministic, cross-engine-reproducible geometry so the
DuckDB oracle verifies the full pipeline bit-for-bit; production swaps
in a trained vocabulary table (ops/embedding_train.py) via the same
join shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col
from .relational import _source_pairs

WMD_VEC_DIM = 8


def md5_token_vec(col, dim: int = WMD_VEC_DIM) -> Column:
    """array<double> in [0,1]^dim derived from the token's md5 digest
    (4 hex chars per component) — portable across engines bit-for-bit."""
    h = F.md5(F.encode(col, "utf-8"))
    return F.array(
        *[
            F.conv(F.substring(h, 1 + 4 * k, 4), 16, 10).cast("double")
            / 65535.0
            for k in range(dim)
        ]
    )


def _euclid(a, b) -> Column:
    diffs = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.round(
        F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)), 6
    )


def rwmd_pairs(docs: DataFrame, dim: int = WMD_VEC_DIM) -> DataFrame:
    """(doc_a, doc_b, rwmd): Relaxed WMD between within-source document
    pairs (same pair generator as the ROUGE operators).

    Plan shape: token-count tables (one shuffle), pairwise token cross
    join per pair (|A|·|B| rows per pair — bounded by document length,
    never by corpus size), per-token nearest-neighbor min, then an
    order-independent DECIMAL-summed weighted mean per direction.  At
    scale, the per-pair token square is the cost driver; prune the
    vocabulary side with an ANN join (ops/similarity) before the exact
    min when documents exceed ~10³ distinct tokens.
    """
    counts = (
        docs.select("doc_id", F.explode(tokens_col("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("vec", md5_token_vec(F.col("tok"), dim))
    )
    totals = counts.groupBy("doc_id").agg(F.sum("c").alias("total"))
    pairs = _source_pairs(docs)

    at = pairs.join(
        counts.select(
            F.col("doc_id").alias("doc_a"),
            F.col("tok").alias("tok_a"),
            F.col("c").alias("ca"),
            F.col("vec").alias("va"),
        ),
        "doc_a",
    )
    bt = counts.select(
        F.col("doc_id").alias("doc_b"),
        F.col("tok").alias("tok_b"),
        F.col("c").alias("cb"),
        F.col("vec").alias("vb"),
    )
    dists = at.join(bt, "doc_b").select(
        "doc_a",
        "doc_b",
        "tok_a",
        "ca",
        "tok_b",
        "cb",
        _euclid(F.col("va"), F.col("vb")).alias("d"),
    )

    def directed(key_tok: str, key_c: str) -> DataFrame:
        mins = dists.groupBy("doc_a", "doc_b", key_tok, key_c).agg(
            F.min("d").alias("mind")
        )
        # integer count × 6dp-rounded distance summed as DECIMAL →
        # order-independent, bit-identical to the DuckDB oracle
        return mins.groupBy("doc_a", "doc_b").agg(
            F.sum(
                (F.col(key_c) * F.col("mind")).cast("decimal(28,10)")
            ).alias("s")
        )

    la = (
        directed("tok_a", "ca")
        .join(totals.select(F.col("doc_id").alias("doc_a"), "total"), "doc_a")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("s").cast("double") / F.col("total"), 6).alias(
                "la"
            ),
        )
    )
    lb = (
        directed("tok_b", "cb")
        .join(totals.select(F.col("doc_id").alias("doc_b"), "total"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("s").cast("double") / F.col("total"), 6).alias(
                "lb"
            ),
        )
    )
    return la.join(lb, ["doc_a", "doc_b"]).select(
        "doc_a", "doc_b", F.greatest("la", "lb").alias("rwmd")
    )
