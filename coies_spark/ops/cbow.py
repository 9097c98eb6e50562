"""Distributed CBOW + negative-sampling word2vec (the reference's
training mode).

The reference trains gensim ``Word2Vec(sg=0, hs=0, negative=5,
cbow_mean=1, sample=1e-3, window=5, size=512, iter=5)``
(word2vec_models.py:38-47).  ``pyspark.ml.feature.Word2Vec`` implements
only skip-gram + hierarchical softmax, whose vector geometry differs
materially (CBOW clusters frequent words far more tightly, which is
what pushes the reference's mean-context cosines above its 0.9
flagship threshold).  This module supplies the missing mode as a
Spark-native operator:

* vocabulary, frequency subsampling probabilities, and the
  unigram^0.75 negative-sampling table are built with one DataFrame
  aggregation and broadcast;
* each epoch runs partition-parallel SGD (numpy kernel inside
  ``mapPartitions``) from the SAME broadcast weights, and the per-
  partition results are averaged — the standard parameter-averaging
  scheme Spark ML's own Word2Vec uses (one aggregate per epoch, no
  parameter server needed);
* all randomness is seeded per (partition, epoch): same input + same
  partitioning → same vectors.

At 100 TB the training input is a bounded sample (embedding quality
saturates far below corpus size); the weight matrices are O(vocab ×
dim) — broadcastable by construction.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

NEG_TABLE_POWER = 0.75
_BLOCK_ROWS = 8192


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(x, -8.0, 8.0)))


def _train_partition(
    sent_ids_list,
    syn0,
    syn1,
    neg_cum,
    keep_prob,
    window: int,
    negative: int,
    alpha: float,
    seed: int,
):
    """In-place CBOW-NS SGD over one partition's sentences (gensim
    semantics: reduced window, cbow_mean=1, shared-negative updates)."""
    rng = np.random.RandomState(seed)
    syn0 = syn0.copy()
    syn1 = syn1.copy()
    for ids in sent_ids_list:
        if len(ids) < 2:
            continue
        keep = rng.random_sample(len(ids)) < keep_prob[ids]
        ids = ids[keep]
        n = len(ids)
        if n < 2:
            continue
        reduced = rng.randint(1, window + 1, size=n)
        negs = np.searchsorted(neg_cum, rng.random_sample((n, negative)))
        for pos in range(n):
            b = reduced[pos]
            lo, hi = max(0, pos - b), min(n, pos + b + 1)
            ctx = np.concatenate([ids[lo:pos], ids[pos + 1 : hi]])
            if len(ctx) == 0:
                continue
            h = syn0[ctx].mean(axis=0)
            targets = np.concatenate([[ids[pos]], negs[pos]])
            labels = np.zeros(len(targets), dtype=np.float32)
            labels[0] = 1.0
            t_rows = syn1[targets]
            f = _sigmoid(t_rows @ h)
            g = (labels - f) * alpha
            # gensim skips a negative sample equal to the center word
            # (word2vec.c: `if (target == word) continue;`): zeroing its
            # gradient removes both its syn1 update and its contribution
            # to the context gradient
            g[1:][negs[pos] == ids[pos]] = 0.0
            # scatter-adds must ACCUMULATE on duplicate indices (same
            # word twice in the window / duplicate negatives); fancy
            # `+=` is last-write-wins, so branch to np.add.at when
            # duplicates are present (rare — keep the fast path hot)
            gt = g @ t_rows
            if len(np.unique(ctx)) == len(ctx):
                syn0[ctx] += gt
            else:
                np.add.at(syn0, ctx, gt)
            delta = np.outer(g, h)
            if len(np.unique(targets)) == len(targets):
                syn1[targets] += delta
            else:
                np.add.at(syn1, targets, delta)
    return syn0, syn1


def train_cbow(
    sentences: DataFrame,
    dim: int = 512,
    window: int = 5,
    min_count: int = 1,
    negative: int = 5,
    sample: float = 1e-3,
    epochs: int = 5,
    alpha: float = 0.025,
    min_alpha: float = 1e-4,
    n_parts: int = 8,
    seed: int = 42,
) -> DataFrame:
    """→ (token string, vector array<float>): CBOW-NS vector table.

    ``sentences``: one ``sentence array<string>`` column.  The learning
    rate decays linearly per epoch (alpha → min_alpha), matching the
    word2vec schedule at epoch granularity.
    """
    if epochs >= 100 or n_parts >= 10_000:
        # the per-(epoch, partition) seed spacing guarantees distinct
        # RandomState streams only inside these bounds — beyond them
        # adjacent epochs would silently reuse streams (correlated
        # subsampling/negatives), so fail loudly instead
        raise ValueError(
            f"train_cbow: epochs ({epochs}) must be < 100 and n_parts "
            f"({n_parts}) < 10_000 to keep per-partition RNG streams "
            "distinct"
        )
    spark = sentences.sparkSession
    sc = spark.sparkContext

    # ---- vocabulary + subsampling + negative table (one aggregation) ----
    from pyspark.sql import functions as F

    counts = (
        sentences.select(F.explode("sentence").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_count)
        .orderBy(F.desc("c"), F.asc("tok"))
        .collect()
    )
    vocab = [r.tok for r in counts]
    freq = np.array([r.c for r in counts], dtype=np.float64)
    index = {t: i for i, t in enumerate(vocab)}
    total = freq.sum()
    # gensim subsampling keep probability
    thresh = sample * total
    keep_prob = np.minimum(
        1.0, (np.sqrt(freq / thresh) + 1.0) * (thresh / freq)
    ).astype(np.float64)
    pow_freq = freq**NEG_TABLE_POWER
    neg_cum = np.cumsum(pow_freq / pow_freq.sum())
    neg_cum[-1] = 1.0

    # ---- sentence id arrays, deterministic partitioning -----------------
    b_index = sc.broadcast(index)

    def to_ids(rows):
        idx = b_index.value
        for row in rows:
            ids = [idx[t] for t in row.sentence if t in idx]
            if len(ids) >= 2:
                yield np.array(ids, dtype=np.int64)

    ids_rdd = (
        sentences.rdd.mapPartitions(to_ids)
        .zipWithIndex()
        .map(lambda kv: (kv[1] % n_parts, kv[0]))
        .partitionBy(n_parts, lambda k: k)
        .map(lambda kv: kv[1])
        .cache()
    )
    ids_rdd.count()

    # ---- init weights (deterministic) -----------------------------------
    rng = np.random.RandomState(seed)
    syn0 = (
        (rng.random_sample((len(vocab), dim)) - 0.5) / dim
    ).astype(np.float32)
    syn1 = np.zeros((len(vocab), dim), dtype=np.float32)

    # ---- epochs: broadcast → partition SGD → deterministic average ------
    # constant across epochs — broadcast once, not once per epoch
    b_keep = sc.broadcast(keep_prob)
    b_neg = sc.broadcast(neg_cum)
    for ep in range(epochs):
        lr = alpha + (min_alpha - alpha) * ep / max(epochs - 1, 1)
        b_syn0 = sc.broadcast(syn0)
        b_syn1 = sc.broadcast(syn1)

        def run(split_idx, it, _ep=ep, _lr=lr):
            sents = list(it)
            s0, s1 = _train_partition(
                sents,
                b_syn0.value,
                b_syn1.value,
                b_neg.value,
                b_keep.value,
                window,
                negative,
                _lr,
                # spacing bounds: epochs < 100, n_parts < 10_000 —
                # wide enough that (epoch, partition) seeds never
                # collide across epochs; mod 2^32 keeps the value in
                # RandomState's accepted range for any user seed
                seed=(seed * 1_000_000 + _ep * 10_000 + split_idx)
                % (2**32),
            )
            # emit row blocks so the average is a parallel executor-side
            # reduceByKey (no n_parts × |vocab| × dim driver collect);
            # float64 blocks keep the summation exact, the final cast
            # back to float32 bounds the fetched result
            for lo in range(0, s0.shape[0], _BLOCK_ROWS):
                yield (
                    lo,
                    (
                        s0[lo : lo + _BLOCK_ROWS].astype(np.float64),
                        s1[lo : lo + _BLOCK_ROWS].astype(np.float64),
                    ),
                )

        blocks = dict(
            ids_rdd.mapPartitionsWithIndex(run)
            .reduceByKey(lambda a, b: (a[0] + b[0], a[1] + b[1]))
            .mapValues(
                lambda t: (
                    (t[0] / n_parts).astype(np.float32),
                    (t[1] / n_parts).astype(np.float32),
                )
            )
            .collect()
        )
        syn0 = np.concatenate([blocks[lo][0] for lo in sorted(blocks)])
        syn1 = np.concatenate([blocks[lo][1] for lo in sorted(blocks)])
        for b in (b_syn0, b_syn1):
            b.unpersist()
    for b in (b_keep, b_neg, b_index):
        b.unpersist()
    ids_rdd.unpersist()

    rows = [(t, syn0[i].astype(float).tolist()) for t, i in index.items()]
    return spark.createDataFrame(rows, "token string, vector array<float>")
