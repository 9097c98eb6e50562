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
  aggregation (optionally capped at ``max_vocab`` by a distributed
  top-V) and broadcast;
* each sync round runs partition-parallel SGD (numpy kernel inside
  ``mapPartitions``) from the SAME broadcast weights, and the per-
  partition results are combined either by

  - ``combine="mean"`` (default, the SHIPPED scheme): parameter
    averaging (Spark ML's scheme).  The mean divides the summed
    weights by ``n_parts``, so a word's effective step size shrinks
    ~1/n_parts (empty partitions contribute the unchanged broadcast
    weights) — PAIR IT with ``n_parts × epochs`` so total per-word
    movement matches sequential training (e.g. n_parts=8 × epochs=40
    ≡ gensim iter=5);
  - ``combine="sum"``: **delta sum** — ``W ← W₀ + Σ_p (W_p − W₀)`` —
    every partition's updates land, the synchronous approximation of
    gensim's hogwild workers.  MEASURED HAZARD (BENCH.md §Quality):
    with n_parts≳16 the synchronized writers compound shared
    directions every round and weight norms grow exponentially
    (1e9-1e12 after 5 epochs on the aaer corpus); cosine structure
    survives via sigmoid clipping but frequent-word norms dominate
    window sums.  Use only with small n_parts and monitor norms;

* the learning rate decays **linearly in global training progress at
  sentence granularity** (word2vec.c / gensim decay ``alpha →
  min_alpha`` over all epochs), not per-epoch steps;
* all randomness is seeded per (round, partition): same input + same
  partitioning → same vectors.

At 100 TB the training input is a bounded sample (embedding quality
saturates far below corpus size); the weight matrices are O(vocab ×
dim) — broadcast per sync round, so the driver/executor budget is
``2 × max_vocab × dim × 4`` bytes (e.g. 400 MiB at V=100k, d=512);
cap ``max_vocab`` accordingly.  The output vector table is built
distributed (executors materialize rows from the broadcast weights),
never as a driver-side list of Python float lists.
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
    alpha_start: float,
    alpha_end: float,
    seed: int,
):
    """In-place CBOW-NS SGD over one partition's sentences (gensim
    semantics: reduced window, cbow_mean=1, shared-negative updates).
    The learning rate decays linearly from ``alpha_start`` to
    ``alpha_end`` across the partition's sentences — word-level decay
    at sentence granularity, matching word2vec.c's progress-linear
    schedule when every partition covers the same progress slice."""
    rng = np.random.RandomState(seed)
    syn0 = syn0.copy()
    syn1 = syn1.copy()
    n_sents = len(sent_ids_list)
    for si, ids in enumerate(sent_ids_list):
        alpha = alpha_start + (alpha_end - alpha_start) * (
            si / n_sents if n_sents else 0.0
        )
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


def _train_partition_batch(
    sent_ids_list,
    syn0,
    syn1,
    neg_cum,
    keep_prob,
    window: int,
    negative: int,
    alpha_start: float,
    alpha_end: float,
    seed: int,
):
    """Vectorized twin of ``_train_partition``: one numpy batch per
    SENTENCE (all positions' gradients computed at the sentence-start
    weights, applied summed) instead of one Python iteration per
    position.  Sentence-level mini-batch SGD — the standard
    approximation at word2vec learning rates (~16-word batches at
    alpha 0.025).  MEASURED: ~3.6× faster at d≤64 (per-position numpy
    overhead dominates there); ~1× at d=512, where the matrix math and
    the scatter-adds are the cost — at production dim the training
    wall is the per-sync-round broadcast+reduce of the 2·V·d weight
    blocks, not the SGD kernel, so prefer fewer/cheaper sync rounds
    over kernel tuning.  Consumes the RNG in the
    same draw order as the exact kernel (keep mask, reduced windows,
    negatives), so subsampling/window/negative choices are identical —
    only the within-sentence update interleaving differs."""
    rng = np.random.RandomState(seed)
    syn0 = syn0.copy()
    syn1 = syn1.copy()
    n_sents = len(sent_ids_list)
    dim = syn0.shape[1]
    for si, ids in enumerate(sent_ids_list):
        alpha = alpha_start + (alpha_end - alpha_start) * (
            si / n_sents if n_sents else 0.0
        )
        if len(ids) < 2:
            continue
        keep = rng.random_sample(len(ids)) < keep_prob[ids]
        ids = ids[keep]
        n = len(ids)
        if n < 2:
            continue
        reduced = rng.randint(1, window + 1, size=n)
        negs = np.searchsorted(neg_cum, rng.random_sample((n, negative)))

        pos = np.arange(n)
        lo = np.maximum(0, pos - reduced)
        hi = np.minimum(n, pos + reduced + 1)
        m = hi - lo - 1  # context sizes (center excluded)
        ok = m > 0  # positions with a non-empty context
        if not ok.any():
            continue
        lo, hi, m, cpos = lo[ok], hi[ok], m[ok], pos[ok]
        negs_ok = negs[ok]
        k = len(cpos)

        # context means via prefix sums of the sentence token matrix
        S = syn0[ids].astype(np.float64)
        P = np.concatenate([np.zeros((1, dim)), np.cumsum(S, axis=0)])
        H = ((P[hi] - P[lo] - S[cpos]) / m[:, None]).astype(np.float32)

        targets = np.concatenate([ids[cpos][:, None], negs_ok], axis=1)
        t_rows = syn1[targets]  # (k, 1+neg, d)
        f = _sigmoid(np.einsum("knd,kd->kn", t_rows, H))
        labels = np.zeros((k, 1 + negative), dtype=np.float32)
        labels[:, 0] = 1.0
        g = (labels - f) * alpha
        # gensim's target==center skip (word2vec.c `continue`)
        g[:, 1:][negs_ok == ids[cpos][:, None]] = 0.0

        # syn1 += outer(g, H) scattered over targets (accumulating)
        delta1 = g[:, :, None] * H[:, None, :]
        np.add.at(syn1, targets.reshape(-1), delta1.reshape(-1, dim))

        # context gradient per window, scattered to every member
        gt = np.einsum("kn,knd->kd", g, t_rows)  # pre-update syn1 rows
        # flat member positions of each window (center excluded):
        # windows expand to [lo, hi) ranges minus the center slot
        lens = hi - lo
        offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
        flat = (
            np.arange(lens.sum())
            - np.repeat(offs, lens)
            + np.repeat(lo, lens)
        )
        win_of = np.repeat(np.arange(k), lens)
        member = flat != cpos[win_of]
        np.add.at(
            syn0, ids[flat[member]], gt[win_of[member]]
        )
    return syn0, syn1


def _dense_sums(ids_rdd, run):
    """Full-matrix block reduce: Σ_p W_p per _BLOCK_ROWS block."""
    sums = dict(
        ids_rdd.mapPartitionsWithIndex(run)
        .reduceByKey(lambda a, b: (a[0] + b[0], a[1] + b[1]))
        .collect()
    )
    return (
        np.concatenate([sums[lo][0] for lo in sorted(sums)]),
        np.concatenate([sums[lo][1] for lo in sorted(sums)]),
    )


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
    combine: str = "mean",
    sync_per_epoch: int = 1,
    max_vocab: int | None = None,
    kernel: str = "exact",
    sync: str = "dense",
) -> DataFrame:
    """→ (token string, vector array<float>): CBOW-NS vector table.

    ``sentences``: one ``sentence array<string>`` column.  See the
    module docstring for the ``combine`` semantics ("mean" =
    parameter averaging, the shipped default — scale ``epochs`` by
    ``n_parts`` to compensate the dilution; "sum" = hogwild-equivalent
    delta sum with the documented norm-blowup hazard at
    ``n_parts >= 16``) and the ``max_vocab`` /
    broadcast memory budget.  ``sync_per_epoch`` splits each epoch
    into that many synchronization rounds (shorter staleness, more
    broadcast+reduce rounds).

    ``sync`` picks the combine transport, NOT the math (both modes
    support either): ``"dense"`` ships every partition's full weight
    matrices through a block reduceByKey — O(n_parts × 2·V·d) shuffle
    per round regardless of what the round touched; ``"sparse"`` ships
    only each partition's TOUCHED rows as float64 deltas, keyed by
    weight-matrix block and summed in an EXECUTOR-SIDE grouped
    reduce, O(Σ_p touched_p × d) shuffle — the 100-TB shape, where a
    mini-epoch slice of a web corpus touches ~10⁵ rows of a 10⁷-row
    vocabulary.  MEASURED: 2.1× end-to-end (7.7→3.6 s) at V=5k,
    d=128, 8 partitions × 8 sync rounds on zipf sentences; the gap
    widens with V/touched.  MEMORY ENVELOPE: per-partition deltas
    meet at the shuffle's reduce tasks (each task holds one block's
    contributions, ≤ n_parts × _BLOCK_ROWS × d × 16 bytes), and the
    DRIVER fetches only the already-summed per-block accumulators —
    ≤ 2·V·d × 8 bytes total, i.e. O(V·d), the same order as the
    weights it already holds, independent of n_parts.  Deltas of
    float32 weights are exact in float64, and the per-block fold
    orders contributions by originating partition before summing, so
    sparse is bit-for-bit deterministic across reruns; it agrees with dense to float32
    rounding (the final-cast tie can differ by 1 ulp), not
    bit-for-bit — the shipped default stays dense.
    """
    total_rounds = epochs * max(sync_per_epoch, 1)
    if total_rounds >= 100 or n_parts >= 10_000:
        # the per-(round, partition) seed spacing guarantees distinct
        # RandomState streams only inside these bounds — beyond them
        # adjacent rounds would silently reuse streams (correlated
        # subsampling/negatives), so fail loudly instead
        raise ValueError(
            f"train_cbow: epochs*sync_per_epoch ({total_rounds}) must be "
            f"< 100 and n_parts ({n_parts}) < 10_000 to keep "
            "per-partition RNG streams distinct"
        )
    if combine not in ("sum", "mean"):
        raise ValueError(f"train_cbow: unknown combine mode {combine!r}")
    if kernel not in ("exact", "batch"):
        raise ValueError(f"train_cbow: unknown kernel {kernel!r}")
    if sync not in ("dense", "sparse"):
        raise ValueError(f"train_cbow: unknown sync {sync!r}")
    part_fn = _train_partition if kernel == "exact" else _train_partition_batch
    spark = sentences.sparkSession
    sc = spark.sparkContext

    # ---- vocabulary + subsampling + negative table (one aggregation) ----
    from pyspark.sql import functions as F

    counts_df = (
        sentences.select(F.explode("sentence").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_count)
        .orderBy(F.desc("c"), F.asc("tok"))
    )
    if max_vocab is not None:
        # distributed top-V (orderBy+limit = TakeOrdered, map-side
        # partial): bounds the broadcast/driver weight matrices to
        # 2 × max_vocab × dim floats no matter the corpus vocabulary
        counts_df = counts_df.limit(max_vocab)
    counts = counts_df.collect()
    if not counts:
        raise ValueError(
            "train_cbow: vocabulary is empty after min_count filtering — "
            "nothing to train on"
        )
    vocab = [r.tok for r in counts]
    freq = np.array([r.c for r in counts], dtype=np.float64)
    index = {t: i for i, t in enumerate(vocab)}
    total = freq.sum()
    if sample and sample > 0:
        # gensim subsampling keep probability
        thresh = sample * total
        keep_prob = np.minimum(
            1.0, (np.sqrt(freq / thresh) + 1.0) * (thresh / freq)
        ).astype(np.float64)
    else:
        # sample<=0 disables subsampling (gensim: sample=0) — guard the
        # division instead of emitting NaN keep probabilities
        keep_prob = np.ones(len(vocab), dtype=np.float64)
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

    # ---- sync rounds: broadcast → partition SGD → combine ---------------
    # constant across rounds — broadcast once, not once per round
    b_keep = sc.broadcast(keep_prob)
    b_neg = sc.broadcast(neg_cum)
    n_sync = max(sync_per_epoch, 1)
    for rnd in range(total_rounds):
        # global linear alpha schedule over ALL training progress
        # (word2vec.c: alpha decays per word processed, not per epoch)
        lr0 = alpha + (min_alpha - alpha) * (rnd / total_rounds)
        lr1 = alpha + (min_alpha - alpha) * ((rnd + 1) / total_rounds)
        sub = rnd % n_sync
        b_syn0 = sc.broadcast(syn0)
        b_syn1 = sc.broadcast(syn1)

        def part_result(split_idx, it, _rnd=rnd, _sub=sub, _lr0=lr0, _lr1=lr1):
            # mini-epoch slice: round r of an epoch trains every
            # n_sync-th sentence starting at r (stride slicing keeps
            # each round's slice stable across epochs)
            sents = [s for i, s in enumerate(it) if i % n_sync == _sub]
            return part_fn(
                sents,
                b_syn0.value,
                b_syn1.value,
                b_neg.value,
                b_keep.value,
                window,
                negative,
                _lr0,
                _lr1,
                # spacing bounds: total_rounds < 100, n_parts < 10_000 —
                # wide enough that (round, partition) seeds never
                # collide across rounds; mod 2^32 keeps the value in
                # RandomState's accepted range for any user seed
                seed=(seed * 1_000_000 + _rnd * 10_000 + split_idx)
                % (2**32),
            )

        def run(split_idx, it):
            s0, s1 = part_result(split_idx, it)
            # emit row blocks so the combine is a parallel executor-side
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

        def run_sparse(split_idx, it):
            s0, s1 = part_result(split_idx, it)
            w0, w1 = b_syn0.value, b_syn1.value
            # only rows the round's SGD actually moved leave the
            # executor; a float32 difference is exact in float64.
            # Keyed by weight-matrix block so each reduce task folds
            # ONE block's contributions — the driver never sees raw
            # per-partition deltas.
            touched = np.flatnonzero(
                np.any(s0 != w0, axis=1) | np.any(s1 != w1, axis=1)
            )
            for lo in range(0, s0.shape[0], _BLOCK_ROWS):
                ids = touched[(touched >= lo) & (touched < lo + _BLOCK_ROWS)]
                if len(ids):
                    yield (
                        lo,
                        (
                            split_idx,
                            ids - lo,
                            s0[ids].astype(np.float64) - w0[ids],
                            s1[ids].astype(np.float64) - w1[ids],
                        ),
                    )

        dim = syn0.shape[1]
        n_rows = syn0.shape[0]

        def fold_block(kv):
            # executor-side: sum one block's contributions in
            # partition order (sorted by split_idx → deterministic
            # float64 fold), return only the touched rows
            lo, contribs = kv
            rows = min(_BLOCK_ROWS, n_rows - lo)
            a0 = np.zeros((rows, dim), dtype=np.float64)
            a1 = np.zeros((rows, dim), dtype=np.float64)
            for _, ids, d0, d1 in sorted(contribs, key=lambda c: c[0]):
                a0[ids] += d0
                a1[ids] += d1
            u = np.flatnonzero(np.any(a0 != 0, axis=1) | np.any(a1 != 0, axis=1))
            return (lo, (u, a0[u], a1[u]))

        if sync == "sparse":
            # deltas summed per block on the EXECUTORS (groupByKey →
            # sorted fold); the driver fetches only the already-summed
            # touched rows — O(Σ touched × d), bounded by O(V·d).
            # Both combine modes are delta-expressible (mean: W₀ +
            # ΣΔ/n ≡ ΣW_p/n because empty partitions contribute zero
            # delta)
            acc0 = np.zeros(syn0.shape, dtype=np.float64)
            acc1 = np.zeros(syn1.shape, dtype=np.float64)
            for lo, (ids, d0, d1) in (
                ids_rdd.mapPartitionsWithIndex(run_sparse)
                .groupByKey()
                .map(fold_block)
                .collect()
            ):
                acc0[lo + ids] += d0
                acc1[lo + ids] += d1
            scale = 1.0 / n_parts if combine == "mean" else 1.0
            syn0 = (syn0.astype(np.float64) + acc0 * scale).astype(
                np.float32
            )
            syn1 = (syn1.astype(np.float64) + acc1 * scale).astype(
                np.float32
            )
        elif combine == "mean":
            s0_sum, s1_sum = _dense_sums(ids_rdd, run)
            syn0 = (s0_sum / n_parts).astype(np.float32)
            syn1 = (s1_sum / n_parts).astype(np.float32)
        else:
            # delta sum: Σ_p W_p = n·W₀ + Σ_p Δ_p, so
            # W₀ + Σ_p Δ_p = Σ_p W_p − (n−1)·W₀ — empty partitions
            # return W₀ unchanged and cancel exactly
            s0_sum, s1_sum = _dense_sums(ids_rdd, run)
            syn0 = (
                s0_sum - (n_parts - 1) * syn0.astype(np.float64)
            ).astype(np.float32)
            syn1 = (
                s1_sum - (n_parts - 1) * syn1.astype(np.float64)
            ).astype(np.float32)
        for b in (b_syn0, b_syn1):
            b.unpersist()
    for b in (b_keep, b_neg, b_index):
        b.unpersist()
    ids_rdd.unpersist()

    # ---- output table: built distributed from the broadcast weights -----
    # (a driver-side [(token, [float]*dim)] list costs ~20× the raw
    # matrix in Python object overhead at V=100k, d=512)
    b_final = sc.broadcast(syn0)
    blocks = [
        (lo, vocab[lo : lo + _BLOCK_ROWS])
        for lo in range(0, len(vocab), _BLOCK_ROWS)
    ]

    def emit(block):
        lo, toks = block
        s0 = b_final.value
        for i, t in enumerate(toks):
            yield t, s0[lo + i].astype(float).tolist()

    rows = sc.parallelize(blocks, max(len(blocks), 1)).flatMap(emit)
    return spark.createDataFrame(rows, "token string, vector array<float>")
