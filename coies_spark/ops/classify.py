"""Trainable text classifier: hashed-feature logistic regression by
unrolled batch gradient descent — the learned quality/domain filter
every production curation stack distills its heuristic gates into
(CCNet trains a fastText classifier against a target corpus; LLaMA's
pipeline keeps a learned "is this reference-like?" filter).  A linear
model over hashed bag-of-words is the fastText-without-embeddings
core of that recipe, and it is expressible as pure declarative Spark:
each GD step is one small join + two aggregates, so the TRAINING LOOP
itself ships as a Catalyst plan — no MLlib, no driver-side math, no
collect.

Determinism story (why a distributed trainer can have a bit-exact
DuckDB oracle):

* the feature bucket IS the first two hex chars of ``md5(token)`` —
  a string group key both engines compute byte-identically (the DSIR
  trick, :mod:`coies_spark.ops.dsir`), so the feature space is fixed
  at 256 buckets + ``__bias__`` with no hex→int conversion;
* feature values are integer token counts — exact;
* every float-valued intermediate is pinned at a reassociation-proof
  boundary: weights are ROUNDED 9dp doubles; the margin
  ``Σ_b cnt_b·w_b`` and the gradient ``Σ_d cnt_{d,b}·(p_d − y_d)``
  form each term as a double product (IEEE-deterministic on identical
  inputs), cast it to ``decimal(28,12)``, and SUM in decimal — exact
  and order-independent, immune to distributed-sum reassociation (the
  DSIR accumulation trick); only the sigmoid and the scalar step
  ``w − lr·g/N`` run in doubles, with identical operation order in
  both engines, then round 9dp again;
* labels ride in as a column, so any seed rule works (the shipped
  query distills the heuristic quality gate — the standard bootstrap
  where the cheap learned model replaces the expensive rule cascade
  at inference time).

Scale shape: the hashed-count frame is built ONCE (one explode + one
map-side-combinable groupBy; ≤257 rows per doc survive the combine)
and lineage-cut with a lazy ``localCheckpoint`` so the unrolled
iterations reuse it instead of re-scanning the corpus.  Per GD round:
the ≤257-row weight table broadcast-joins onto the counts (no
shuffle), one groupBy doc_id (the margin), one groupBy bucket (the
gradient) — 2 shuffles/round, both map-side combinable, the same
bound as a distributed PageRank round.  Scoring is one broadcast join
+ one aggregate.  Nothing anywhere depends on partition count or task
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.tokenize import tokens_col
from .dsir import N_BUCKETS, md5_bucket  # noqa: F401 (shared trick)

_DEC = "decimal(28,12)"
_BIAS = "__bias__"


def hashed_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, b, cnt): integer token counts per hashed bucket, plus
    one ``__bias__`` row per document (so empty documents still carry
    the intercept and receive a score)."""
    tok = docs.select(
        "doc_id", F.explode(tokens_col("text")).alias("tok")
    )
    counts = (
        tok.select("doc_id", md5_bucket("tok").alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    bias = docs.select(
        "doc_id", F.lit(_BIAS).alias("b"), F.lit(1).cast("long").alias("cnt")
    )
    return counts.unionByName(bias)


def _scores(feats: DataFrame, weights: DataFrame) -> DataFrame:
    """(doc_id, p): sigmoid of the exact decimal margin under the
    (broadcast) weight table, rounded 9dp."""
    # per-term product in double (IEEE-deterministic on identical
    # inputs), cast THEN summed in decimal — exact, order-independent
    # (the DSIR accumulation trick; a decimal×decimal product would
    # overflow precision 38 and truncate engine-differently)
    m = (
        feats.join(F.broadcast(weights), "b")
        .groupBy("doc_id")
        .agg(
            F.sum(
                (F.col("cnt") * F.col("w")).cast(_DEC)
            ).alias("m")
        )
    )
    return m.select(
        "doc_id",
        F.round(
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-F.col("m").cast("double"))),
            9,
        ).alias("p"),
    )


def train_text_classifier(
    docs: DataFrame,
    labels: DataFrame,
    iters: int = 3,
    lr: float = 1.0,
    init: DataFrame | None = None,
) -> DataFrame:
    """(b, w): hashed-bucket logistic-regression weights after
    ``iters`` unrolled full-batch GD rounds from w=0 (or from
    ``init``), learning rate ``lr``.  ``labels`` is (doc_id, y) with
    y ∈ {0.0, 1.0}; docs without a label row drop out of training
    (inner join) but can still be scored.

    Full-batch GD (not SGD) is the deliberate choice: its gradient is
    a pure aggregation, so the training loop is deterministic on any
    partitioning — the property that makes the DuckDB oracle and
    cross-run reproducibility possible.  ``iters`` rounds of
    full-batch GD on a convex loss is also the textbook distributed
    recipe (each round = one pass, like distributed L-BFGS's inner
    loop).

    ``init`` warm-starts from a previously trained (b, w) table —
    the daily-refresh path: because every round is deterministic,
    ``train(iters=k, init=train(iters=j))`` on the same corpus IS
    ``train(iters=j+k)`` exactly (pinned by test), so incremental
    refreshes never drift from the full retrain.  The weight universe
    is the UNION of the corpus's buckets and ``init``'s: new-token
    buckets start at 0, and an init bucket whose tokens are absent
    from this batch keeps its learned weight (no gradient reaches it)
    instead of being silently deleted from future margins.
    """
    feats = hashed_counts(docs).localCheckpoint(eager=False)
    return _train_on(feats, labels, iters=iters, lr=lr, init=init)


def _train_on(
    feats: DataFrame,
    labels: DataFrame,
    iters: int,
    lr: float,
    init: DataFrame | None,
) -> DataFrame:
    """GD core over a prebuilt hashed-counts frame (so callers that
    also score — :func:`classify_docs` — reuse ONE corpus scan)."""
    y = labels.select("doc_id", F.col("y").cast("double").alias("y"))
    # N = the training set (labeled docs): the gradient sums over
    # label-joined rows, so dividing by the corpus size would shrink
    # the effective step by the labeled fraction
    n = y.agg(F.count(F.lit(1)).alias("__n"))
    univ = feats.select("b").distinct()
    if init is None:
        w = univ.select("b", F.lit(0.0).alias("w"))
    else:
        univ = univ.unionByName(init.select("b")).distinct()
        w = univ.join(
            F.broadcast(init.select("b", "w")), "b", "left"
        ).select("b", F.coalesce("w", F.lit(0.0)).alias("w"))
    for _ in range(iters):
        p = _scores(feats, w)
        g = (
            feats.join(p, "doc_id")
            .join(y, "doc_id")
            .groupBy("b")
            .agg(
                F.sum(
                    (F.col("cnt") * (F.col("p") - F.col("y"))).cast(
                        _DEC
                    )
                ).alias("g")
            )
        )
        # w − lr·g/N in doubles with fixed operation order (lr*g then
        # /N), rounded 9dp — identical expression in the oracle.
        # LEFT join: a bucket seen only in unlabeled docs (or only in
        # init) has no gradient row; its weight must stay, not vanish
        # — dropping it would silently delete those tokens from every
        # future margin.
        w = (
            w.join(g, "b", "left")
            .crossJoin(F.broadcast(n))
            .select(
                "b",
                F.round(
                    F.col("w")
                    - F.lit(lr)
                    * F.coalesce(
                        F.col("g").cast("double"), F.lit(0.0)
                    )
                    / F.col("__n"),
                    9,
                ).alias("w"),
            )
        )
    return w


def classify_docs(
    docs: DataFrame,
    labels: DataFrame,
    iters: int = 3,
    lr: float = 1.0,
    threshold: float = 0.5,
) -> DataFrame:
    """(doc_id, p, predicted, y): train on ``labels`` (see
    :func:`train_text_classifier`), then score EVERY document —
    probability, thresholded verdict, and the seed label (NULL where
    unlabeled) so train-set agreement is read straight off the output.

    The shipped query distills the heuristic quality gate into the
    linear model; at 100 TB the trained ≤257-row weight table is the
    artifact — score new corpus partitions with one broadcast join
    instead of re-running the rule cascade.
    """
    feats = hashed_counts(docs).localCheckpoint(eager=False)
    w = _train_on(feats, labels, iters=iters, lr=lr, init=None)
    p = _scores(feats, w)
    return (
        p.join(
            labels.select(
                "doc_id", F.col("y").cast("double").alias("y")
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            "p",
            (F.col("p") >= threshold).alias("predicted"),
            "y",
        )
    )


def calibration_bins(
    scored: DataFrame,
    bins: int = 10,
    p_col: str = "p",
    label_col: str = "y",
) -> DataFrame:
    """(bin, n, n_pos, mean_p, pos_rate): the classifier reliability
    diagram as a table — labeled rows bucketed by predicted
    probability, with the observed positive rate per bucket.  The
    deployment gauge for :func:`classify_docs`: a well-calibrated
    quality filter has pos_rate ≈ mean_p per bin, and drift between
    them (as the corpus mixture shifts) is the retraining trigger —
    THE standard production-ML health check (reliability diagrams,
    DeGroot & Fienberg 1983).

    * bin = ``least(floor(p·bins), bins-1)`` — the p = 1.0 edge case
      folds into the top bin instead of creating a phantom one;
    * unlabeled rows (NULL label) are excluded — calibration is only
      measurable against known outcomes;
    * exactness: n / n_pos are integer aggregates; mean_p sums the
      already-9dp-rounded probabilities in ``decimal(28,12)``
      (order-independent), then divides and rounds 6; pos_rate is a
      single integer division rounded 6.

    One map-side-combinable groupBy on ≤ ``bins`` keys — nothing at
    any scale."""
    if bins < 2:
        raise ValueError("calibration_bins: bins must be >= 2")
    labeled = scored.where(F.col(label_col).isNotNull())
    b = F.least(
        F.floor(F.col(p_col) * bins), F.lit(bins - 1)
    ).cast("long")
    return (
        labeled.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                (F.col(label_col) > 0.5).cast("long")
            ).cast("long").alias("n_pos"),
            F.round(
                F.sum(F.col(p_col).cast(_DEC)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_p"),
            F.round(
                F.sum((F.col(label_col) > 0.5).cast("long"))
                / F.count(F.lit(1)),
                6,
            ).alias("pos_rate"),
        )
    )


def pr_curve(
    scored: DataFrame,
    p_col: str = "p",
    label_col: str = "y",
    grid_dp: int = 3,
) -> DataFrame:
    """(threshold, tp, fp, precision, recall): the full
    precision/recall trade-off of a scorer against known labels —
    one row per score level, reading "if you gate at ≥ threshold,
    you keep tp true / fp false positives".  The threshold-picking
    face of the classifier family: :func:`calibration_bins` says
    whether probabilities are honest, this says where to cut them
    (and it applies unchanged to ANY ranked decision — dedup
    verify scores, linkage weights, ANN sims).

    ``grid_dp`` quantizes scores to that many decimals BEFORE the
    sweep (default 3 → ≤ 1001 threshold rows).  This is the scale
    cap: the cumulative pass runs a GLOBAL ordered window, which is
    exact and single-task-safe only because the threshold grid is
    bounded — raw 9dp scores at web scale would put 10⁹ distinct
    levels on one task (the embedding_norm_stats honesty rule;
    raise grid_dp only with that trade understood).

    Unlabeled rows are excluded (the calibration_bins convention);
    ties at a threshold move together, which is the correct PR
    semantics for a deterministic gate.  precision/recall are
    single integer divisions rounded 6; an all-negative input has
    recall NULL (0/0 try_divide), not an error.
    """
    if grid_dp < 1 or grid_dp > 6:
        raise ValueError("pr_curve: grid_dp must be in [1, 6]")
    labeled = scored.where(F.col(label_col).isNotNull())
    per = labeled.groupBy(
        F.round(F.col(p_col), grid_dp).alias("threshold")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum((F.col(label_col) > 0.5).cast("long"))
        .cast("long")
        .alias("__np"),
    )
    w = Window.orderBy(F.desc("threshold")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.orderBy(F.desc("threshold")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.select(
        "threshold",
        F.sum("__np").over(w).cast("long").alias("tp"),
        (F.sum("__n").over(w) - F.sum("__np").over(w))
        .cast("long")
        .alias("fp"),
        F.round(
            F.sum("__np").over(w) / F.sum("__n").over(w), 6
        ).alias("precision"),
        F.round(
            F.try_divide(
                F.sum("__np").over(w), F.sum("__np").over(wall)
            ),
            6,
        ).alias("recall"),
    )


def roc_auc(
    scored: DataFrame,
    p_col: str = "p",
    label_col: str = "y",
    grid_dp: int = 3,
) -> DataFrame:
    """1 row (n_pos, n_neg, auc): exact trapezoidal ROC-AUC over the
    same bounded threshold grid as :func:`pr_curve` — the single
    number the PR table refuses to be.  Grid quantization makes ties
    move together (standard mid-rank/trapezoid semantics), so the
    value equals the Mann-Whitney U statistic computed on the
    quantized scores.

    Geometry: thresholds descend from (fpr, tpr) = (0, 0) to (1, 1);
    each level contributes (fpr − fpr_prev)·(tpr + tpr_prev)/2.
    Terms are rounded 9dp and summed in decimal(28,12) — order-exact
    — then the total rounds to 6.  Degenerate inputs (no positives
    or no negatives) report NULL auc rather than an 0/0 error.

    Same scale shape as pr_curve: one map-side-combinable groupBy to
    ≤ 10^grid_dp+1 rows, then window algebra on that bounded table.
    """
    if grid_dp < 1 or grid_dp > 6:
        raise ValueError("roc_auc: grid_dp must be in [1, 6]")
    labeled = scored.where(F.col(label_col).isNotNull())
    per = labeled.groupBy(
        F.round(F.col(p_col), grid_dp).alias("threshold")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum((F.col(label_col) > 0.5).cast("long"))
        .cast("long")
        .alias("__np"),
    )
    w = Window.orderBy(F.desc("threshold")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.orderBy(F.desc("threshold")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    lagw = Window.orderBy(F.desc("threshold"))
    pts = per.select(
        F.col("threshold"),
        F.sum("__np").over(wall).cast("long").alias("P"),
        (F.sum("__n").over(wall) - F.sum("__np").over(wall))
        .cast("long")
        .alias("N"),
        F.try_divide(F.sum("__np").over(w), F.sum("__np").over(wall))
        .alias("tpr"),
        F.try_divide(
            F.sum("__n").over(w) - F.sum("__np").over(w),
            F.sum("__n").over(wall) - F.sum("__np").over(wall),
        ).alias("fpr"),
    )
    terms = pts.select(
        "P",
        "N",
        F.round(
            (F.col("fpr") - F.lag("fpr", 1, 0.0).over(lagw))
            * (F.col("tpr") + F.lag("tpr", 1, 0.0).over(lagw))
            / 2.0,
            9,
        ).alias("t"),
    )
    return terms.groupBy("P", "N").agg(
        F.round(
            F.sum(F.col("t").cast(_DEC)).cast("double"), 6
        ).alias("auc")
    ).select(
        F.col("P").alias("n_pos"), F.col("N").alias("n_neg"), "auc"
    )
