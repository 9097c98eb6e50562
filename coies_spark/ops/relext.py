"""Relation-extraction bootstrap: close the KG-construction loop by
training a relation DETECTOR on the engine's own distant-supervision
labels and proposing NEW triples from unlabeled co-mention pairs —
the Mintz-et-al. (ACL 2009) recipe end-to-end, composed entirely
from operators the engine already ships:

* :func:`coies_spark.ops.kg.distant_supervision` /
  :func:`~coies_spark.ops.kg.distant_negatives` supply the labeled
  evidence pairs (one gazetteer mention pass, two label faces);
* :mod:`coies_spark.ops.classify`'s hashed-feature logistic trainer
  supplies the bit-exact distributed GD loop (256 md5 buckets,
  decimal-summed gradients, 9dp-pinned weights);
* the propose face aggregates per-evidence probabilities into
  per-pair scores (multi-instance mean) and emits the candidate
  (subj, obj) edges the seed KG does not yet assert — the review
  queue a human or a downstream confidence model consumes.

This is the standard industrial KG-completion flow (NELL, Knowledge
Vault): seed facts → distant labels → cheap learned detector →
proposed facts, all without manual annotation.  The reference repo
(/root/reference) has no learned relation model — its extraction is
context-similarity only (model_testing/oneshot_test.py); this layer
is the natural next stage its pipeline feeds.

Scale shape: one mention-spotting pass over the corpus (the
gazetteer join plan, zero-shuffle span generation), one bounded
per-turn pair self-join, then the classifier's 2-shuffles-per-round
GD on (pair, bucket) counts — nothing quadratic in corpus size, and
the per-pair evidence text rides the SAME (conv_id, turn_idx) keys
as every other transcript stage.  Proposal aggregation groups on
(subj, obj): hot entity pairs are exactly the head-heavy keys the
decimal-sum mean is order-immune to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .classify import _scores, hashed_counts, train_text_classifier
from .kg import distant_negatives, distant_supervision, gazetteer_mentions

_DEC = "decimal(28,12)"
_SEP = "\x1f"


def _pair_id() -> F.Column:
    """The positional-evidence key: every column that makes one
    evidence row unique, chr(31)-joined — the classifier's doc_id."""
    return F.concat_ws(
        _SEP,
        "conv_id",
        F.col("turn_idx").cast("string"),
        "subj",
        F.col("subj_pos").cast("string"),
        "obj",
        F.col("obj_pos").cast("string"),
    )


def _with_text(pairs: DataFrame, transcripts: DataFrame) -> DataFrame:
    """(pair_id, subj, obj[, y], text): evidence pairs joined back to
    their turn's text — the per-turn text equality invariant means
    the text IS the evidence context, unchanged from ingest."""
    turns = transcripts.select(
        "conv_id", F.col("turn_idx").cast("long").alias("turn_idx"), "text"
    )
    keep = [c for c in ("y",) if c in pairs.columns]
    return pairs.join(turns, ["conv_id", "turn_idx"]).select(
        _pair_id().alias("pair_id"), "subj", "obj", *keep, "text"
    )


def relation_training_table(
    transcripts: DataFrame,
    dictionary: DataFrame,
    seed: DataFrame,
    rate: float = 0.25,
    max_len: int = 3,
    broadcast: bool = True,
    mentions: DataFrame | None = None,
) -> DataFrame:
    """(pair_id, subj, obj, y, text): the detector's training table —
    distant-supervision positives (y=1.0; a pair the seed KG relates
    under ANY predicate counts once per positional evidence, however
    many predicates it holds) unioned with the hash-Bernoulli NA
    sample at ``rate`` (y=0.0), each row carrying its evidence turn's
    text verbatim.  ONE mention pass builds both faces — the
    corpus-scale gazetteer scan runs once and is lineage-cut with a
    lazy localCheckpoint (pass ``mentions`` to share it even wider,
    as :func:`relation_proposals` does) — so the classes cannot
    drift; the class ratio is set at emission, before any shuffle.
    """
    if mentions is None:
        mentions = gazetteer_mentions(
            transcripts, dictionary, max_len, broadcast
        ).localCheckpoint(eager=False)
    pos = (
        distant_supervision(
            transcripts, dictionary, seed, max_len, broadcast, mentions
        )
        .drop("pred")
        .distinct()
        .withColumn("y", F.lit(1.0))
    )
    neg = (
        distant_negatives(
            transcripts, dictionary, seed, rate, max_len, broadcast,
            mentions,
        )
        .drop("pred")
        .withColumn("y", F.lit(0.0))
    )
    return _with_text(pos.unionByName(neg), transcripts)


def relation_detector_train(
    transcripts: DataFrame,
    dictionary: DataFrame,
    seed: DataFrame,
    iters: int = 3,
    lr: float = 1.0,
    rate: float = 0.25,
    max_len: int = 3,
    broadcast: bool = True,
    mentions: DataFrame | None = None,
) -> DataFrame:
    """(b, w): hashed-bucket logistic weights of the related-vs-NA
    relation detector after ``iters`` unrolled full-batch GD rounds
    over :func:`relation_training_table` — trainable operator #7,
    and the first one whose TRAINING SET is itself the output of
    another engine operator (the KG bootstrapping its own model).
    Determinism, scale shape, and the bit-exact DuckDB twin are the
    :mod:`~coies_spark.ops.classify` contract verbatim: the evidence
    turn's tokens hash into 256 md5 buckets + bias, gradients sum in
    exact decimal, weights pin at 9dp per round.
    """
    tbl = relation_training_table(
        transcripts, dictionary, seed, rate, max_len, broadcast, mentions
    )
    docs = tbl.select(F.col("pair_id").alias("doc_id"), "text")
    labels = tbl.select(F.col("pair_id").alias("doc_id"), "y")
    return train_text_classifier(docs, labels, iters=iters, lr=lr)


def relation_proposals(
    transcripts: DataFrame,
    dictionary: DataFrame,
    seed: DataFrame,
    threshold: float = 0.5,
    iters: int = 3,
    lr: float = 1.0,
    rate: float = 0.25,
    max_len: int = 3,
    broadcast: bool = True,
) -> DataFrame:
    """(subj, obj, n_evidence, score, proposed): KG completion — every
    co-mentioned entity pair the seed KG does NOT relate, scored by
    the trained detector as the MEAN of its per-evidence
    probabilities (multi-instance aggregation: each co-mention is one
    vote), ``proposed`` when score ≥ ``threshold``.  The proposal set
    is the review queue that grows the KG: accepted rows re-enter as
    seed facts and the loop re-runs (NELL's coupled bootstrap).

    Exactness: per-evidence p is the classifier's 9dp-pinned sigmoid;
    the mean sums those in exact decimal and divides by the exact
    evidence count in doubles — engine-identical, so the DuckDB twin
    (which replays training AND scoring) hash-matches.  Candidates
    are the FULL complement set (``distant_negatives`` at rate 1.0),
    independent of the training-time NA sample.

    Scale: the corpus-scale gazetteer mention scan runs ONCE — one
    lazily-checkpointed table feeds the positive labels, the training
    NA sample, and the scoring candidates (three faces, one scan);
    scoring is then one broadcast weight join + one (pair, bucket)
    aggregate over the complement pairs — per-turn-bounded fan-out,
    no new quadratic structure; the final groupBy keys on (subj, obj)
    where the decimal sum makes hot pairs order-immune.
    """
    m = gazetteer_mentions(
        transcripts, dictionary, max_len, broadcast
    ).localCheckpoint(eager=False)
    w = relation_detector_train(
        transcripts, dictionary, seed, iters, lr, rate, max_len,
        broadcast, mentions=m,
    )
    return score_proposals(
        transcripts, dictionary, seed, w, threshold, max_len,
        broadcast, mentions=m,
    )


def score_proposals(
    transcripts: DataFrame,
    dictionary: DataFrame,
    seed: DataFrame,
    weights: DataFrame,
    threshold: float = 0.5,
    max_len: int = 3,
    broadcast: bool = True,
    mentions: DataFrame | None = None,
) -> DataFrame:
    """The scoring half of :func:`relation_proposals`, callable with
    PREBUILT detector weights (and optionally a prebuilt mention
    table) — the face a checkpointed pipeline consumes, so the
    one-shot query and the resumable run share one code path.  Same
    output contract as :func:`relation_proposals`."""
    cand = _with_text(
        distant_negatives(
            transcripts, dictionary, seed, 1.0, max_len, broadcast,
            mentions=mentions,
        ).drop("pred"),
        transcripts,
    )
    feats = hashed_counts(
        cand.select(F.col("pair_id").alias("doc_id"), "text")
    )
    p = _scores(feats, weights)
    ev = cand.select(
        F.col("pair_id").alias("doc_id"), "subj", "obj"
    ).join(p, "doc_id")
    agg = ev.groupBy("subj", "obj").agg(
        F.count(F.lit(1)).cast("long").alias("n_evidence"),
        (
            F.sum(F.col("p").cast(_DEC)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("score"),
    )
    return agg.select(
        "subj",
        "obj",
        "n_evidence",
        "score",
        (F.col("score") >= F.lit(float(threshold))).alias("proposed"),
    )
