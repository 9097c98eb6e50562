"""Knowledge-graph embeddings: a TransE trainer (Bordes et al.,
NeurIPS 2013, "Translating Embeddings for Modeling Multi-relational
Data") as trainable operator #4, next to BPE induction, the logistic
quality classifier, and EM record linkage — and like them, with a
bit-exact cross-engine training loop.

TransE models a true triple (h, r, t) as a translation h + r ≈ t in
embedding space; training minimizes the margin ranking loss
max(0, γ + d(h+r, t) - d(h+r, t')) against corrupted triples t'.
The lite trainer here makes every choice the deterministic one:

* **full-batch subgradient descent** (the :mod:`classify` recipe):
  each epoch's gradient is one aggregation over all triples, so the
  loop is reproducible on any partitioning and expressible as an
  unrolled DuckDB CTE chain;
* **long-format state** (id, i, x) instead of array columns: the
  per-dimension join/aggregate program is REGULAR relational algebra
  — identical on Spark and DuckDB with no per-dimension SQL
  generation, and the shuffle keys ((subj, pred, obj) and (id, i))
  stay well-spread at any scale;
* **hash-everything determinism**: initial components are
  md5-derived uniforms in [-0.5, 0.5) (the `deterministic_sample`
  hex trick, numeric form), and each triple's corrupted tail is the
  entity at index md5(h⎵r⎵t) mod (N−1) of the sorted entity list
  with the TRUE tail excluded (sample-excluding-one shift) — no RNG
  state anywhere;
* **squared L2 energy** d = Σ(h_i + r_i - t_i)², whose subgradient
  is linear — per-triple gradient components round to 9dp and sum in
  decimal(28,12) per (id, i) (exact under any visit order), updates
  re-round to 9dp before the next epoch (the classifier GD
  accumulation trick).

Scale shapes (10⁹-entity KG): the per-epoch core join fans each
triple into ``dim`` rows — that is TransE's intrinsic cost — and
every join/aggregate keys on (entity, i) or the triple key, so hot
entities spread across dimensions and triples.  The one structure
that is NOT shuffle-spread is the corruption index (row_number over
the sorted entity list): vocabulary-sized by construction here, and
at web scale the two-phase range-bucketed rank
(``ops.maintenance.exclusive_prefix_sum``) replaces it — the same
swap the walk ops made in round 5.

No file in ``/root/reference`` contains embedding-based KG scoring;
this implements the public TransE recipe for the alias/link layers
(``kg.alias_candidates``, ``operators.graph.link_prediction_mrr``)
to consume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(28,12)"
_SEP = "\x1f"


def _md5_long(col: Column) -> Column:
    """First 32 bits of md5 as a non-negative BIGINT — the engine-
    portable hash (DuckDB: CAST('0x'||substr(md5(x),1,8) AS BIGINT))."""
    return F.conv(
        F.substring(F.md5(F.encode(col, "utf-8")), 1, 8), 16, 10
    ).cast("long")


def _init_state(ids: DataFrame, kind: str, dim: int) -> DataFrame:
    """(id, i, x): md5-uniform init in [-0.5, 0.5), round 9 — the
    ``kind`` salt keeps an entity and a relation with the same name
    on independent vectors."""
    dims = ids.select(
        "id", F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("i")
    )
    u = _md5_long(
        F.concat_ws(_SEP, F.lit(kind), F.col("id"), F.col("i").cast("string"))
    ) / F.lit(4294967296.0)
    return dims.select("id", "i", F.round(u - F.lit(0.5), 9).alias("x"))


def _negatives(t: DataFrame, ents: DataFrame) -> DataFrame:
    """Append the deterministic corrupted tail: the entity at index
    md5(triple) mod (N−1) of the sorted entity list WITH THE TRUE
    TAIL EXCLUDED (the sample-excluding-one shift: indexes at or
    past the tail's own rank move up by one).  Excluding the tail
    matters: a corruption equal to the positive gives d_pos == d_neg
    forever — the triple counts as violated at every epoch with
    gradients that cancel exactly, polluting the violated-count
    health gauge for ~|T|/N triples.  The rank window is
    vocabulary-sized (see module docstring for the web-scale swap);
    a single-entity KG degenerates to the tail itself (no other
    entity exists)."""
    n = ents.count()
    eidx = ents.select(
        "id",
        (F.row_number().over(Window.orderBy(F.col("id").asc())) - 1).alias(
            "idx"
        ),
    )
    key = _md5_long(F.concat_ws(_SEP, "subj", "pred", "obj"))
    if n < 2:
        return (
            t.withColumn("idx", key % F.lit(n))
            .join(eidx, "idx")
            .select(
                "subj", "pred", "obj", F.col("id").alias("neg_obj")
            )
        )
    oidx = eidx.select(
        F.col("id").alias("obj"), F.col("idx").alias("__oi")
    )
    idx0 = key % F.lit(n - 1)
    return (
        t.join(oidx, "obj")
        .withColumn(
            "idx", idx0 + (idx0 >= F.col("__oi")).cast("long")
        )
        .join(eidx, "idx")
        .select(
            "subj", "pred", "obj", F.col("id").alias("neg_obj")
        )
    )


def _epoch_core(
    tneg: DataFrame, e_state: DataFrame, r_state: DataFrame
) -> DataFrame:
    """Per-(triple, dimension) translation residuals under the current
    state: dp_i = (h_i + r_i) - t_i, dn_i against the corrupted tail."""
    return (
        tneg.join(
            e_state.select(
                F.col("id").alias("subj"), "i", F.col("x").alias("h")
            ),
            "subj",
        )
        .join(
            r_state.select(
                F.col("id").alias("pred"), "i", F.col("x").alias("r")
            ),
            ["pred", "i"],
        )
        .join(
            e_state.select(
                F.col("id").alias("obj"), "i", F.col("x").alias("t")
            ),
            ["obj", "i"],
        )
        .join(
            e_state.select(
                F.col("id").alias("neg_obj"), "i", F.col("x").alias("tn")
            ),
            ["neg_obj", "i"],
        )
        .select(
            "subj",
            "pred",
            "obj",
            "neg_obj",
            "i",
            ((F.col("h") + F.col("r")) - F.col("t")).alias("dp"),
            ((F.col("h") + F.col("r")) - F.col("tn")).alias("dn"),
        )
    )


def _energies(core: DataFrame, margin: float) -> DataFrame:
    """Per-triple squared-L2 energies and the margin-violation flag;
    per-component squares round 9dp, the cross-dimension sum is exact
    decimal — identical in both engines."""
    return core.groupBy("subj", "pred", "obj", "neg_obj").agg(
        F.sum(F.round(F.col("dp") * F.col("dp"), 9).cast(_DEC))
        .cast("double")
        .alias("d_pos"),
        F.sum(F.round(F.col("dn") * F.col("dn"), 9).cast(_DEC))
        .cast("double")
        .alias("d_neg"),
    ).withColumn(
        "violated",
        (F.lit(float(margin)) + F.col("d_pos") - F.col("d_neg")) > 0,
    )


def _l2_normalize(state: DataFrame) -> DataFrame:
    """Project every entity vector onto the unit L2 ball at epoch
    start (the TransE Algorithm-1 normalization step): ‖x‖² sums
    round-9 squares in decimal (exact), the norm and division are
    IEEE doubles identical on both engines, and the result re-rounds
    to 9dp.  Besides algorithm fidelity, this BOUNDS every entity
    component at 1, so round(x, 9) can never outrun double precision
    however adversarial the input KG (unsatisfiable cycles diverge
    without it)."""
    nrm = state.groupBy("id").agg(
        F.sqrt(
            F.sum(
                F.round(F.col("x") * F.col("x"), 9).cast(_DEC)
            ).cast("double")
        ).alias("nrm")
    )
    return state.join(nrm, "id").select(
        "id",
        "i",
        F.when(
            F.col("nrm") > 0, F.round(F.col("x") / F.col("nrm"), 9)
        )
        .otherwise(F.col("x"))
        .alias("x"),
    )


def _apply_grads(
    state: DataFrame, grads: DataFrame, lr: float, n_triples: int
) -> DataFrame:
    """x ← round(x - lr·(Σg)/T, 9); rows with no gradient keep their
    weight (LEFT join — the classifier's no-silent-delete rule).
    Dividing by the TRIPLE COUNT makes this full-batch MEAN descent
    (the :mod:`classify` g/N rule): per-epoch movement stays O(lr)
    however many triples vote, so components stay unit-scale — which
    is also what keeps round(x, 9) EXACT (past |x|·10⁹ ≈ 2⁵³ the
    9dp grid outruns double precision and engines disagree by 1 ulp;
    sum-gradient TransE diverges into exactly that regime)."""
    gsum = grads.groupBy("id", "i").agg(
        (
            F.sum(F.col("g").cast(_DEC)).cast("double")
            / F.lit(float(n_triples))
        ).alias("g")
    )
    return state.join(gsum, ["id", "i"], "left").select(
        "id",
        "i",
        F.round(
            F.col("x") - F.lit(float(lr)) * F.coalesce("g", F.lit(0.0)), 9
        ).alias("x"),
    )


def _train_states(
    triples: DataFrame, dim: int, iters: int, lr: float, margin: float
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared training core of :func:`transe_train` /
    :func:`transe_energies` (one builder, both faces): returns
    (tneg, e_state, r_state) after ``iters`` epochs."""
    if dim < 1 or iters < 1:
        raise ValueError("transe_train: dim and iters must be >= 1")
    t = (
        triples.select("subj", "pred", "obj")
        .distinct()
        .localCheckpoint(eager=False)
    )
    ents = (
        t.select(F.col("subj").alias("id"))
        .unionByName(t.select(F.col("obj").alias("id")))
        .distinct()
    )
    rels = t.select(F.col("pred").alias("id")).distinct()
    n_triples = t.count()
    tneg = _negatives(t, ents).localCheckpoint(eager=False)
    e_state = _init_state(ents, "entity", dim)
    r_state = _init_state(rels, "relation", dim)
    for _ in range(iters):
        e_state = _l2_normalize(e_state)
        core = _epoch_core(tneg, e_state, r_state)
        viol = (
            _energies(core, margin)
            .where("violated")
            .select("subj", "pred", "obj", "neg_obj")
        )
        vc = core.join(viol, ["subj", "pred", "obj", "neg_obj"])
        g_hr = F.round(2.0 * (F.col("dp") - F.col("dn")), 9)
        grads_e = (
            vc.select(F.col("subj").alias("id"), "i", g_hr.alias("g"))
            .unionByName(
                vc.select(
                    F.col("obj").alias("id"),
                    "i",
                    F.round(-2.0 * F.col("dp"), 9).alias("g"),
                )
            )
            .unionByName(
                vc.select(
                    F.col("neg_obj").alias("id"),
                    "i",
                    F.round(2.0 * F.col("dn"), 9).alias("g"),
                )
            )
        )
        grads_r = vc.select(F.col("pred").alias("id"), "i", g_hr.alias("g"))
        e_state = _apply_grads(
            e_state, grads_e, lr, n_triples
        ).localCheckpoint(eager=False)
        r_state = _apply_grads(
            r_state, grads_r, lr, n_triples
        ).localCheckpoint(eager=False)
    return tneg, e_state, r_state


def transe_train(
    triples: DataFrame,
    dim: int = 4,
    iters: int = 2,
    lr: float = 5.0,
    margin: float = 1.0,
) -> DataFrame:
    """(id, kind, i, x): entity and relation embeddings after
    ``iters`` unrolled full-batch TransE epochs — long format, kind ∈
    {'entity', 'relation'}, i the dimension index, x the round-9
    component.  See the module docstring for the determinism and
    scale contract; the DuckDB oracle twin replays the identical
    relational program, so the trained weights are bit-identical
    across engines (the BPE/classifier/EM-linkage guarantee, now for
    a representation-learning op).
    """
    _, e_state, r_state = _train_states(triples, dim, iters, lr, margin)
    return e_state.select(
        "id", F.lit("entity").alias("kind"), "i", "x"
    ).unionByName(
        r_state.select("id", F.lit("relation").alias("kind"), "i", "x")
    )


def transe_energies(
    triples: DataFrame,
    dim: int = 4,
    iters: int = 2,
    lr: float = 5.0,
    margin: float = 1.0,
) -> DataFrame:
    """(subj, pred, obj, d_pos, d_neg, violated): per-triple energies
    under the TRAINED embeddings — d_pos the squared-L2 translation
    residual of the true triple, d_neg of its deterministic
    corruption, ``violated`` whether the margin still separates them
    (the residual-loss face; Σ violated is the training-health gauge
    and SHOULD fall as iters grows — pinned by test).  d_pos / d_neg
    publish UNROUNDED: the decimal sums are exact at ≤ 9dp, so the
    cast double is engine-identical, while a 6dp re-round would hit
    genuine decimal ties the two engines break differently.  Shares
    every stage with :func:`transe_train`, so the faces cannot drift.
    """
    tneg, e_state, r_state = _train_states(triples, dim, iters, lr, margin)
    core = _epoch_core(tneg, e_state, r_state)
    # NO final rounding: the decimal sums are exact at <= 9dp, so the
    # cast double is already the identical value on every engine —
    # re-rounding to 6dp would CREATE cross-engine ties (an exact
    # x.xxxxxx5 decimal rounds differently through BigDecimal HALF_UP
    # vs double multiply-round; observed once per ~1e3 rows)
    return _energies(core, margin).select(
        "subj", "pred", "obj", "d_pos", "d_neg", "violated"
    )


def transe_rank_eval(
    triples: DataFrame,
    dim: int = 4,
    iters: int = 2,
    lr: float = 5.0,
    margin: float = 1.0,
    n_candidates: int = 20,
    side: str = "tail",
) -> DataFrame:
    """(subj, pred, obj, n_cands, rank, rr, hit1, hit3, hit10): the
    standard KGE link-prediction evaluation (Bordes et al. 2013,
    "filtered" protocol) under sampled candidates — for each trained
    triple, rank the TRUE tail against ``n_candidates`` deterministic
    candidate entities by squared-L2 translation energy d(h+r, e),
    having FILTERED candidates that are themselves known-true tails
    for (subj, pred) (scoring a real fact as a "negative" would
    punish the model for being right — the filtered-setting rule).
    MRR is avg(rr), Hits@k is avg(hit{k}), both one trivial
    aggregation away; the per-triple table is published because it is
    the joinable face (per-relation breakdowns, worst-ranked audit).

    Determinism: candidate c of a triple is the entity at index
    md5(subj⎵pred⎵obj⎵c) mod N of the sorted entity list (the
    :func:`_negatives` recipe, salted by the candidate ordinal); md5
    collisions dedupe, so ``n_cands`` ≤ ``n_candidates`` varies per
    triple and is published.  Ties on energy break by candidate id
    (ascending) against the true tail — total order, engine-exact
    because energies are round-9 decimal sums cast to double (the
    :func:`transe_energies` guarantee).

    Scale: scoring is |test|·K·``dim`` rows through the same
    (entity, i)-keyed equi-join program as training — no all-pairs
    structure anywhere.  Ranking against ALL entities (the original
    protocol) is |test|·|E| and deliberately not the default; at
    10⁹ entities the published path is candidate sampling (this), or
    ANN over the entity table (``ops.similarity``) when exact
    full-ranking is required.  The sorted-entity index window is
    vocabulary-sized (module docstring caveat).
    """
    if n_candidates < 1:
        raise ValueError("transe_rank_eval: n_candidates must be >= 1")
    if side not in ("tail", "head"):
        raise ValueError("transe_rank_eval: side must be tail|head")
    tneg, e_state, r_state = _train_states(triples, dim, iters, lr, margin)
    t3 = tneg.select("subj", "pred", "obj")
    if side == "head":
        t3 = _flip(t3)
    probe = _rank_probe(t3, n_candidates)
    res = (
        probe.join(
            e_state.select(
                F.col("id").alias("subj"), "i", F.col("x").alias("h")
            ),
            "subj",
        )
        .join(
            r_state.select(
                F.col("id").alias("pred"), "i", F.col("x").alias("r")
            ),
            ["pred", "i"],
        )
        .join(
            e_state.select(
                F.col("id").alias("cand"), "i", F.col("x").alias("e")
            ),
            ["cand", "i"],
        )
        .select(
            "subj", "pred", "obj", "cand", "is_true",
            # tail side: d(h + r, cand); head side (flipped probe):
            # d(cand + r, t) — the candidate occupies the HEAD slot
            (
                (F.col("h") + F.col("r") - F.col("e"))
                if side == "tail"
                else (F.col("e") + F.col("r") - F.col("h"))
            ).alias("dp"),
        )
    )
    scored = res.groupBy("subj", "pred", "obj", "cand", "is_true").agg(
        F.sum(F.round(F.col("dp") * F.col("dp"), 9).cast(_DEC))
        .cast("double")
        .alias("score")
    )
    # translation ENERGY: lower is better
    out = _rank_output(scored, higher_is_better=False)
    return out if side == "tail" else _unflip_output(out)


def _flip(t3: DataFrame) -> DataFrame:
    """Head-side evaluation by ORIENTATION FLIP: feeding (obj, pred,
    subj) through the tail machinery makes the candidate slot the
    HEAD and the filtered-protocol anti-join remove known-true heads
    for (pred, obj) — the head-replacement rule, with zero new
    protocol code.  Callers re-flip the output keys to the original
    orientation."""
    return t3.select(
        F.col("obj").alias("subj"), "pred", F.col("subj").alias("obj")
    )


def _unflip_output(out: DataFrame) -> DataFrame:
    """Re-orient a flipped eval's keys back to the original triple."""
    return out.select(
        F.col("obj").alias("subj"),
        "pred",
        F.col("subj").alias("obj"),
        "n_cands", "rank", "rr", "hit1", "hit3", "hit10",
    )


def _rank_probe(t3: DataFrame, n_candidates: int) -> DataFrame:
    """(subj, pred, obj, cand, is_true): the filtered-protocol probe
    table shared by every KGE eval face — ``n_candidates``
    deterministic md5-indexed candidate entities per triple, with
    known-true tails for (subj, pred) FILTERED out, plus the true
    tail flagged ``is_true``.  See :func:`transe_rank_eval` for the
    protocol contract."""
    ents = (
        t3.select(F.col("subj").alias("id"))
        .unionByName(t3.select(F.col("obj").alias("id")))
        .distinct()
    )
    n = ents.count()
    eidx = ents.select(
        "id",
        (F.row_number().over(Window.orderBy(F.col("id").asc())) - 1).alias(
            "idx"
        ),
    )
    cand = (
        t3.select(
            "*",
            F.explode(
                F.sequence(F.lit(0), F.lit(n_candidates - 1))
            ).alias("c"),
        )
        .withColumn(
            "idx",
            _md5_long(
                F.concat_ws(
                    _SEP, "subj", "pred", "obj", F.col("c").cast("string")
                )
            )
            % F.lit(n),
        )
        .join(eidx, "idx")
        .select("subj", "pred", "obj", F.col("id").alias("cand"))
        .distinct()
        .where(F.col("cand") != F.col("obj"))
        # filtered protocol: a candidate that is a known-true tail
        # for (subj, pred) is removed, not counted as a negative
        .join(
            t3.select("subj", "pred", F.col("obj").alias("cand")),
            ["subj", "pred", "cand"],
            "left_anti",
        )
    )
    return cand.select(
        "subj", "pred", "obj", "cand", F.lit(False).alias("is_true")
    ).unionByName(
        t3.select(
            "subj", "pred", "obj",
            F.col("obj").alias("cand"),
            F.lit(True).alias("is_true"),
        )
    )


def _rank_output(scored: DataFrame, higher_is_better: bool) -> DataFrame:
    """(subj, pred, obj, n_cands, rank, rr, hit1, hit3, hit10) from a
    scored probe table (subj, pred, obj, cand, is_true, score): the
    true tail's rank among its candidates, ties broken by candidate
    id ascending against the true tail — total order, engine-exact
    because scores are decimal sums cast to double.  ``higher_is_
    better`` selects the model's score direction (translation energy:
    lower; bilinear score: higher)."""
    true_d = scored.where("is_true").select(
        "subj", "pred", "obj", F.col("score").alias("s_true")
    )
    better = (
        (F.col("score") > F.col("s_true"))
        if higher_is_better
        else (F.col("score") < F.col("s_true"))
    )
    beat = (
        scored.where(~F.col("is_true"))
        .join(true_d, ["subj", "pred", "obj"])
        .groupBy("subj", "pred", "obj")
        .agg(
            F.count(F.lit(1)).alias("n_cands"),
            F.sum(
                F.when(
                    better
                    | (
                        (F.col("score") == F.col("s_true"))
                        & (F.col("cand") < F.col("obj"))
                    ),
                    1,
                ).otherwise(0)
            ).alias("n_better"),
        )
    )
    # a triple whose every candidate was filtered still ranks (first
    # among one) — LEFT join from the true-tail side keeps its row
    rank = F.lit(1) + F.coalesce("n_better", F.lit(0))
    return (
        true_d.join(beat, ["subj", "pred", "obj"], "left")
        .select(
            "subj",
            "pred",
            "obj",
            F.coalesce("n_cands", F.lit(0)).cast("long").alias("n_cands"),
            rank.cast("long").alias("rank"),
            (F.lit(1.0) / rank.cast("double")).alias("rr"),
            (rank <= 1).alias("hit1"),
            (rank <= 3).alias("hit3"),
            (rank <= 10).alias("hit10"),
        )
    )


def _q9(c: Column) -> Column:
    """floor(x·10⁹ + 0.5)/10⁹ — the ENGINE-IDENTICAL 9dp quantizer.
    Every operation (multiply, add, floor, divide) is a single IEEE
    double op that any engine executes bit-identically, so two
    engines evaluating the same expression tree agree ALWAYS — by
    construction, not by measure.  ``round(double, 9)`` does not have
    that property: the JVM rounds HALF_UP on the double's shortest
    decimal repr while DuckDB rounds through binary multiply, and the
    two tie-break a value sitting at a 9dp midpoint differently
    (observed ~1/10⁴ weights in DistMult training; TransE predates
    the quantizer and stays on ``round`` only because its committed
    weights are tie-free at every tested scale).  Inputs are
    unit-scale (|x|·10⁹ ≪ 2⁵³), so the float grid never outruns the
    decimal grid."""
    return F.floor(c * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)


def _dm_init_state(ids: DataFrame, kind: str, dim: int) -> DataFrame:
    """:func:`_init_state` on the :func:`_q9` grid (see there)."""
    dims = ids.select(
        "id", F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("i")
    )
    u = _md5_long(
        F.concat_ws(_SEP, F.lit(kind), F.col("id"), F.col("i").cast("string"))
    ) / F.lit(4294967296.0)
    return dims.select("id", "i", _q9(u - F.lit(0.5)).alias("x"))


def _dm_l2_normalize(state: DataFrame) -> DataFrame:
    """:func:`_l2_normalize` on the :func:`_q9` grid."""
    nrm = state.groupBy("id").agg(
        F.sqrt(
            F.sum(_q9(F.col("x") * F.col("x")).cast(_DEC)).cast("double")
        ).alias("nrm")
    )
    return state.join(nrm, "id").select(
        "id",
        "i",
        F.when(F.col("nrm") > 0, _q9(F.col("x") / F.col("nrm")))
        .otherwise(F.col("x"))
        .alias("x"),
    )


def _dm_apply_grads(
    state: DataFrame, grads: DataFrame, lr: float, n_triples: int
) -> DataFrame:
    """:func:`_apply_grads` on the :func:`_q9` grid."""
    gsum = grads.groupBy("id", "i").agg(
        (
            F.sum(F.col("g").cast(_DEC)).cast("double")
            / F.lit(float(n_triples))
        ).alias("g")
    )
    return state.join(gsum, ["id", "i"], "left").select(
        "id",
        "i",
        _q9(
            F.col("x") - F.lit(float(lr)) * F.coalesce("g", F.lit(0.0))
        ).alias("x"),
    )


def _dm_core(
    tneg: DataFrame, e_state: DataFrame, r_state: DataFrame
) -> DataFrame:
    """Per-(triple, dimension) raw components under the current state
    — DistMult needs the factors themselves (its gradients are
    products of the OTHER two factors), so this publishes (h, r, t,
    tn) per dimension rather than residuals."""
    return (
        tneg.join(
            e_state.select(
                F.col("id").alias("subj"), "i", F.col("x").alias("h")
            ),
            "subj",
        )
        .join(
            r_state.select(
                F.col("id").alias("pred"), "i", F.col("x").alias("r")
            ),
            ["pred", "i"],
        )
        .join(
            e_state.select(
                F.col("id").alias("obj"), "i", F.col("x").alias("t")
            ),
            ["obj", "i"],
        )
        .join(
            e_state.select(
                F.col("id").alias("neg_obj"), "i", F.col("x").alias("tn")
            ),
            ["neg_obj", "i"],
        )
        .select("subj", "pred", "obj", "neg_obj", "i", "h", "r", "t", "tn")
    )


def _dm_scores(core: DataFrame, margin: float) -> DataFrame:
    """Per-triple bilinear scores s = Σᵢ hᵢrᵢtᵢ (true and corrupted
    tail) and the margin-violation flag max(0, γ - s_pos + s_neg);
    per-dimension triple products round 9dp, the cross-dimension sum
    is exact decimal — the :func:`_energies` engine-parity recipe."""
    return core.groupBy("subj", "pred", "obj", "neg_obj").agg(
        F.sum(
            _q9(F.col("h") * F.col("r") * F.col("t")).cast(_DEC)
        )
        .cast("double")
        .alias("s_pos"),
        F.sum(
            _q9(F.col("h") * F.col("r") * F.col("tn")).cast(_DEC)
        )
        .cast("double")
        .alias("s_neg"),
    ).withColumn(
        "violated",
        (F.lit(float(margin)) - F.col("s_pos") + F.col("s_neg")) > 0,
    )


def _dm_train_states(
    triples: DataFrame, dim: int, iters: int, lr: float, margin: float
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared training core of :func:`distmult_train` /
    :func:`distmult_scores`: the :func:`_train_states` loop with the
    bilinear score s = Σᵢ hᵢrᵢtᵢ in place of translation energy.
    Everything else — md5 init/corruption, epoch-start entity
    normalization, round-9 decimal mean-gradient accumulation — is
    byte-identical scaffolding, which is the point: one deterministic
    trainer recipe, many model families."""
    if dim < 1 or iters < 1:
        raise ValueError("distmult_train: dim and iters must be >= 1")
    t = (
        triples.select("subj", "pred", "obj")
        .distinct()
        .localCheckpoint(eager=False)
    )
    ents = (
        t.select(F.col("subj").alias("id"))
        .unionByName(t.select(F.col("obj").alias("id")))
        .distinct()
    )
    rels = t.select(F.col("pred").alias("id")).distinct()
    n_triples = t.count()
    tneg = _negatives(t, ents).localCheckpoint(eager=False)
    e_state = _dm_init_state(ents, "entity", dim)
    r_state = _dm_init_state(rels, "relation", dim)
    for _ in range(iters):
        e_state = _dm_l2_normalize(e_state)
        core = _dm_core(tneg, e_state, r_state)
        viol = (
            _dm_scores(core, margin)
            .where("violated")
            .select("subj", "pred", "obj", "neg_obj")
        )
        vc = core.join(viol, ["subj", "pred", "obj", "neg_obj"])
        # margin loss γ - s_pos + s_neg: each weight's subgradient is
        # the product of the OTHER factors, negative via s_pos and
        # positive via s_neg
        grads_e = (
            vc.select(
                F.col("subj").alias("id"),
                "i",
                _q9(F.col("r") * (F.col("tn") - F.col("t"))).alias("g"),
            )
            .unionByName(
                vc.select(
                    F.col("obj").alias("id"),
                    "i",
                    _q9(-F.col("h") * F.col("r")).alias("g"),
                )
            )
            .unionByName(
                vc.select(
                    F.col("neg_obj").alias("id"),
                    "i",
                    _q9(F.col("h") * F.col("r")).alias("g"),
                )
            )
        )
        grads_r = vc.select(
            F.col("pred").alias("id"),
            "i",
            _q9(F.col("h") * (F.col("tn") - F.col("t"))).alias("g"),
        )
        e_state = _dm_apply_grads(
            e_state, grads_e, lr, n_triples
        ).localCheckpoint(eager=False)
        r_state = _dm_apply_grads(
            r_state, grads_r, lr, n_triples
        ).localCheckpoint(eager=False)
    return tneg, e_state, r_state


def distmult_train(
    triples: DataFrame,
    dim: int = 4,
    iters: int = 2,
    lr: float = 5.0,
    margin: float = 1.0,
) -> DataFrame:
    """(id, kind, i, x): entity and relation embeddings after
    ``iters`` unrolled full-batch DistMult epochs (Yang et al., ICLR
    2015, "Embedding Entities and Relations for Learning and
    Inference in Knowledge Bases") — the bilinear-diagonal
    counterpart of :func:`transe_train` (trainable operator #5).
    DistMult scores a triple s(h, r, t) = Σᵢ hᵢrᵢtᵢ — multiplicative
    interactions capture SYMMETRIC relations TransE's translations
    cannot (s(h,r,t) = s(t,r,h) by construction), at the cost of
    anti-symmetric ones; the two models are complements, which is why
    both faces ship.

    Same determinism, scale shape, and cross-engine bit-exactness
    contract as TransE (module docstring): the DuckDB oracle twin
    replays the identical relational program; per-epoch cost is the
    same 4-equi-join fan-out to ``dim`` rows per triple.
    """
    _, e_state, r_state = _dm_train_states(triples, dim, iters, lr, margin)
    return e_state.select(
        "id", F.lit("entity").alias("kind"), "i", "x"
    ).unionByName(
        r_state.select("id", F.lit("relation").alias("kind"), "i", "x")
    )


def distmult_scores(
    triples: DataFrame,
    dim: int = 4,
    iters: int = 2,
    lr: float = 5.0,
    margin: float = 1.0,
) -> DataFrame:
    """(subj, pred, obj, s_pos, s_neg, violated): per-triple bilinear
    scores under the TRAINED DistMult embeddings — s_pos the true
    triple's Σᵢhᵢrᵢtᵢ, s_neg its deterministic tail corruption's,
    ``violated`` whether the margin still fails to separate them
    (falls as iters grows — pinned by test).  Publishes unrounded
    doubles from exact decimal sums (the :func:`transe_energies`
    tie-avoidance rule).  Shares every stage with
    :func:`distmult_train`, so the faces cannot drift.
    """
    tneg, e_state, r_state = _dm_train_states(
        triples, dim, iters, lr, margin
    )
    core = _dm_core(tneg, e_state, r_state)
    return _dm_scores(core, margin).select(
        "subj", "pred", "obj", "s_pos", "s_neg", "violated"
    )


def distmult_rank_eval(
    triples: DataFrame,
    dim: int = 4,
    iters: int = 2,
    lr: float = 5.0,
    margin: float = 1.0,
    n_candidates: int = 20,
    side: str = "tail",
) -> DataFrame:
    """(subj, pred, obj, n_cands, rank, rr, hit1, hit3, hit10):
    filtered-protocol link-prediction evaluation of the trained
    DistMult model — :func:`transe_rank_eval`'s contract verbatim
    (same md5 candidate sampling, same known-true-tail filtering,
    same tie rule) with the bilinear score s = Σᵢ hᵢrᵢeᵢ ranking
    candidates HIGHEST-first instead of lowest translation energy.
    Per-dimension products quantize on the :func:`_q9` grid and sum
    in exact decimal, so ranks are engine-exact.

    Scale: identical shape to the TransE eval — |test|·K·``dim``
    rows through (entity, i)-keyed equi-joins, no all-pairs
    structure; see :func:`transe_rank_eval` for the full-ranking
    alternative at 10⁹ entities.
    """
    if n_candidates < 1:
        raise ValueError("distmult_rank_eval: n_candidates must be >= 1")
    if side not in ("tail", "head"):
        raise ValueError("distmult_rank_eval: side must be tail|head")
    tneg, e_state, r_state = _dm_train_states(
        triples, dim, iters, lr, margin
    )
    t3 = tneg.select("subj", "pred", "obj")
    if side == "head":
        # the per-dimension product h*r*t is symmetric in (h, t), so
        # the head face needs ONLY the probe flip — the score
        # expression is role-blind
        t3 = _flip(t3)
    probe = _rank_probe(t3, n_candidates)
    res = (
        probe.join(
            e_state.select(
                F.col("id").alias("subj"), "i", F.col("x").alias("h")
            ),
            "subj",
        )
        .join(
            r_state.select(
                F.col("id").alias("pred"), "i", F.col("x").alias("r")
            ),
            ["pred", "i"],
        )
        .join(
            e_state.select(
                F.col("id").alias("cand"), "i", F.col("x").alias("e")
            ),
            ["cand", "i"],
        )
        .select(
            "subj", "pred", "obj", "cand", "is_true",
            _q9(F.col("h") * F.col("r") * F.col("e")).alias("p"),
        )
    )
    scored = res.groupBy("subj", "pred", "obj", "cand", "is_true").agg(
        F.sum(F.col("p").cast(_DEC)).cast("double").alias("score")
    )
    # bilinear SCORE: higher is better
    out = _rank_output(scored, higher_is_better=True)
    return out if side == "tail" else _unflip_output(out)


def _cx_init_state(ids: DataFrame, kind: str, dim: int) -> DataFrame:
    """(id, i, xr, xi): two-channel md5-uniform init on the
    :func:`_q9` grid — the ``:re`` / ``:im`` salt suffixes keep the
    channels on independent hash streams (and distinct from the
    real-valued models' vectors for the same names)."""
    dims = ids.select(
        "id", F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("i")
    )

    def _u(ch: str) -> Column:
        u = _md5_long(
            F.concat_ws(
                _SEP,
                F.lit(kind + ":" + ch),
                F.col("id"),
                F.col("i").cast("string"),
            )
        ) / F.lit(4294967296.0)
        return _q9(u - F.lit(0.5))

    return dims.select("id", "i", _u("re").alias("xr"), _u("im").alias("xi"))


def _cx_l2_normalize(state: DataFrame) -> DataFrame:
    """Unit-ball projection of the COMPLEX entity vectors: ‖x‖² sums
    both channels' round-9 squares in exact decimal (the
    :func:`_l2_normalize` recipe, two channels per dimension)."""
    nrm = state.groupBy("id").agg(
        F.sqrt(
            F.sum(
                _q9(F.col("xr") * F.col("xr")).cast(_DEC)
                + _q9(F.col("xi") * F.col("xi")).cast(_DEC)
            ).cast("double")
        ).alias("nrm")
    )
    ok = F.col("nrm") > 0
    return state.join(nrm, "id").select(
        "id",
        "i",
        F.when(ok, _q9(F.col("xr") / F.col("nrm")))
        .otherwise(F.col("xr"))
        .alias("xr"),
        F.when(ok, _q9(F.col("xi") / F.col("nrm")))
        .otherwise(F.col("xi"))
        .alias("xi"),
    )


def _cx_apply_grads(
    state: DataFrame, grads: DataFrame, lr: float, n_triples: int
) -> DataFrame:
    """:func:`_apply_grads` per channel: (id, i, gr, gi) votes sum in
    exact decimal, mean by the triple count, q9 update; rows with no
    gradient keep their weight."""
    gsum = grads.groupBy("id", "i").agg(
        (
            F.sum(F.col("gr").cast(_DEC)).cast("double")
            / F.lit(float(n_triples))
        ).alias("gr"),
        (
            F.sum(F.col("gi").cast(_DEC)).cast("double")
            / F.lit(float(n_triples))
        ).alias("gi"),
    )
    return state.join(gsum, ["id", "i"], "left").select(
        "id",
        "i",
        _q9(
            F.col("xr") - F.lit(float(lr)) * F.coalesce("gr", F.lit(0.0))
        ).alias("xr"),
        _q9(
            F.col("xi") - F.lit(float(lr)) * F.coalesce("gi", F.lit(0.0))
        ).alias("xi"),
    )


def _cx_core(
    tneg: DataFrame, e_state: DataFrame, r_state: DataFrame
) -> DataFrame:
    """Per-(triple, dimension) complex components under the current
    state: (ar, ai) the head, (br, bi) the relation, (cr, ci) the
    true tail, (dr, di) the corrupted tail — the neutral letter names
    keep the 8-factor algebra readable and collision-free in both
    engines."""

    def _sel(key: str, a: str, b: str) -> DataFrame:
        return e_state.select(
            F.col("id").alias(key),
            "i",
            F.col("xr").alias(a),
            F.col("xi").alias(b),
        )

    return (
        tneg.join(_sel("subj", "ar", "ai"), "subj")
        .join(
            r_state.select(
                F.col("id").alias("pred"),
                "i",
                F.col("xr").alias("br"),
                F.col("xi").alias("bi"),
            ),
            ["pred", "i"],
        )
        .join(_sel("obj", "cr", "ci"), ["obj", "i"])
        .join(_sel("neg_obj", "dr", "di"), ["neg_obj", "i"])
        .select(
            "subj", "pred", "obj", "neg_obj", "i",
            "ar", "ai", "br", "bi", "cr", "ci", "dr", "di",
        )
    )


def _cx_dim_score(tr: Column, ti: Column) -> Column:
    """Per-dimension Re(h·r·conj(t)) against a tail (tr, ti) — ONE
    fixed expression tree of IEEE double ops, written identically in
    the DuckDB twin so the q9 quantization is engine-exact."""
    return _q9(
        F.col("ar") * F.col("br") * tr
        + F.col("ai") * F.col("br") * ti
        + F.col("ar") * F.col("bi") * ti
        - F.col("ai") * F.col("bi") * tr
    )


def _cx_scores(core: DataFrame, margin: float) -> DataFrame:
    """Per-triple ComplEx scores s = Σᵢ Re(hᵢrᵢ·conj(tᵢ)) (true and
    corrupted tail) and the margin-violation flag — the
    :func:`_dm_scores` recipe with the 4-product real part as the
    per-dimension term."""
    return core.groupBy("subj", "pred", "obj", "neg_obj").agg(
        F.sum(_cx_dim_score(F.col("cr"), F.col("ci")).cast(_DEC))
        .cast("double")
        .alias("s_pos"),
        F.sum(_cx_dim_score(F.col("dr"), F.col("di")).cast(_DEC))
        .cast("double")
        .alias("s_neg"),
    ).withColumn(
        "violated",
        (F.lit(float(margin)) - F.col("s_pos") + F.col("s_neg")) > 0,
    )


def _cx_train_states(
    triples: DataFrame, dim: int, iters: int, lr: float, margin: float
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared training core of the ComplEx faces: the
    :func:`_dm_train_states` loop with the complex bilinear score
    Re(Σᵢ hᵢrᵢ·conj(tᵢ)) — the real part of a Hermitian product, so
    one relation can be symmetric (imaginary part 0) AND another
    anti-symmetric (real part 0), which neither TransE nor DistMult
    can express simultaneously.  State is two-channel long format
    (id, i, xr, xi); everything else — md5 init/corruption,
    epoch-start entity normalization, q9 decimal mean-gradient
    accumulation — is the shared deterministic-trainer scaffolding.
    """
    if dim < 1 or iters < 1:
        raise ValueError("complex_train: dim and iters must be >= 1")
    t = (
        triples.select("subj", "pred", "obj")
        .distinct()
        .localCheckpoint(eager=False)
    )
    ents = (
        t.select(F.col("subj").alias("id"))
        .unionByName(t.select(F.col("obj").alias("id")))
        .distinct()
    )
    rels = t.select(F.col("pred").alias("id")).distinct()
    n_triples = t.count()
    tneg = _negatives(t, ents).localCheckpoint(eager=False)
    e_state = _cx_init_state(ents, "entity", dim)
    r_state = _cx_init_state(rels, "relation", dim)
    # margin-loss subgradients: d(s)/d(factor) is the Wirtinger-style
    # product of the OTHER factors; the loss γ - s_pos + s_neg gives
    # each entity the (neg - pos) difference, the true tail -pos
    # only, the corrupted tail +neg only
    ddr = F.col("dr") - F.col("cr")
    ddi = F.col("di") - F.col("ci")
    for _ in range(iters):
        e_state = _cx_l2_normalize(e_state)
        core = _cx_core(tneg, e_state, r_state)
        viol = (
            _cx_scores(core, margin)
            .where("violated")
            .select("subj", "pred", "obj", "neg_obj")
        )
        vc = core.join(viol, ["subj", "pred", "obj", "neg_obj"])
        grads_e = (
            vc.select(
                F.col("subj").alias("id"),
                "i",
                _q9(F.col("br") * ddr + F.col("bi") * ddi).alias("gr"),
                _q9(F.col("br") * ddi - F.col("bi") * ddr).alias("gi"),
            )
            .unionByName(
                vc.select(
                    F.col("obj").alias("id"),
                    "i",
                    _q9(
                        F.col("ai") * F.col("bi")
                        - F.col("ar") * F.col("br")
                    ).alias("gr"),
                    _q9(
                        -(
                            F.col("ai") * F.col("br")
                            + F.col("ar") * F.col("bi")
                        )
                    ).alias("gi"),
                )
            )
            .unionByName(
                vc.select(
                    F.col("neg_obj").alias("id"),
                    "i",
                    _q9(
                        F.col("ar") * F.col("br")
                        - F.col("ai") * F.col("bi")
                    ).alias("gr"),
                    _q9(
                        F.col("ai") * F.col("br")
                        + F.col("ar") * F.col("bi")
                    ).alias("gi"),
                )
            )
        )
        grads_r = vc.select(
            F.col("pred").alias("id"),
            "i",
            _q9(F.col("ar") * ddr + F.col("ai") * ddi).alias("gr"),
            _q9(F.col("ar") * ddi - F.col("ai") * ddr).alias("gi"),
        )
        e_state = _cx_apply_grads(
            e_state, grads_e, lr, n_triples
        ).localCheckpoint(eager=False)
        r_state = _cx_apply_grads(
            r_state, grads_r, lr, n_triples
        ).localCheckpoint(eager=False)
    return tneg, e_state, r_state


def complex_train(
    triples: DataFrame,
    dim: int = 4,
    iters: int = 2,
    lr: float = 5.0,
    margin: float = 1.0,
) -> DataFrame:
    """(id, kind, i, xr, xi): complex entity and relation embeddings
    after ``iters`` unrolled full-batch ComplEx epochs (Trouillon et
    al., ICML 2016, "Complex Embeddings for Simple Link Prediction")
    — trainable operator #6, completing the KGE family: TransE's
    translations model anti-symmetric relations, DistMult's diagonal
    bilinear form only symmetric ones; ComplEx's Hermitian product
    Re(Σᵢ hᵢrᵢ·conj(tᵢ)) expresses both (and relation inverses via
    conjugation).  Same determinism, scale shape (4 equi-joins
    fanning to dim rows per triple — two channels ride the SAME rows,
    so shuffle volume is 2× DistMult's bytes at identical row count
    and stage count), and cross-engine bit-exactness contract as the
    other trainers: the DuckDB twin replays the identical relational
    program on the q9 grid.
    """
    _, e_state, r_state = _cx_train_states(triples, dim, iters, lr, margin)
    return e_state.select(
        "id", F.lit("entity").alias("kind"), "i", "xr", "xi"
    ).unionByName(
        r_state.select(
            "id", F.lit("relation").alias("kind"), "i", "xr", "xi"
        )
    )


def complex_scores(
    triples: DataFrame,
    dim: int = 4,
    iters: int = 2,
    lr: float = 5.0,
    margin: float = 1.0,
) -> DataFrame:
    """(subj, pred, obj, s_pos, s_neg, violated): per-triple ComplEx
    scores under the TRAINED embeddings — the :func:`distmult_scores`
    face for the complex model (unrounded doubles from exact decimal
    sums; Σ violated falls as iters grows, pinned by test).  Shares
    every stage with :func:`complex_train`, so the faces cannot
    drift."""
    tneg, e_state, r_state = _cx_train_states(
        triples, dim, iters, lr, margin
    )
    core = _cx_core(tneg, e_state, r_state)
    return _cx_scores(core, margin).select(
        "subj", "pred", "obj", "s_pos", "s_neg", "violated"
    )


def complex_rank_eval(
    triples: DataFrame,
    dim: int = 4,
    iters: int = 2,
    lr: float = 5.0,
    margin: float = 1.0,
    n_candidates: int = 20,
    side: str = "tail",
) -> DataFrame:
    """(subj, pred, obj, n_cands, rank, rr, hit1, hit3, hit10):
    filtered-protocol link-prediction evaluation of the trained
    ComplEx model — :func:`transe_rank_eval`'s contract verbatim via
    the shared :func:`_rank_probe` / :func:`_rank_output`
    scaffolding, candidates ranked by Re(h·r·conj(e)) HIGHEST-first.
    Same |test|·K·``dim``-row scale shape as the other evals."""
    if n_candidates < 1:
        raise ValueError("complex_rank_eval: n_candidates must be >= 1")
    if side not in ("tail", "head"):
        raise ValueError("complex_rank_eval: side must be tail|head")
    tneg, e_state, r_state = _cx_train_states(
        triples, dim, iters, lr, margin
    )
    t3 = tneg.select("subj", "pred", "obj")
    if side == "head":
        t3 = _flip(t3)
    probe = _rank_probe(t3, n_candidates)
    res = (
        probe.join(
            e_state.select(
                F.col("id").alias("subj"),
                "i",
                F.col("xr").alias("ar"),
                F.col("xi").alias("ai"),
            ),
            "subj",
        )
        .join(
            r_state.select(
                F.col("id").alias("pred"),
                "i",
                F.col("xr").alias("br"),
                F.col("xi").alias("bi"),
            ),
            ["pred", "i"],
        )
        .join(
            e_state.select(
                F.col("id").alias("cand"),
                "i",
                F.col("xr").alias("cr"),
                F.col("xi").alias("ci"),
            ),
            ["cand", "i"],
        )
        .select(
            "subj", "pred", "obj", "cand", "is_true",
            # tail side: Re((a)·r·conj(cand)); head side (flipped
            # probe): Re(cand·r·conj(a)) — conjugation makes the
            # Hermitian product role-SENSITIVE, unlike DistMult's
            (
                _cx_dim_score(F.col("cr"), F.col("ci"))
                if side == "tail"
                else _q9(
                    F.col("cr") * F.col("br") * F.col("ar")
                    + F.col("ci") * F.col("br") * F.col("ai")
                    + F.col("cr") * F.col("bi") * F.col("ai")
                    - F.col("ci") * F.col("bi") * F.col("ar")
                )
            ).alias("p"),
        )
    )
    scored = res.groupBy("subj", "pred", "obj", "cand", "is_true").agg(
        F.sum(F.col("p").cast(_DEC)).cast("double").alias("score")
    )
    # Hermitian-product SCORE: higher is better
    out = _rank_output(scored, higher_is_better=True)
    return out if side == "tail" else _unflip_output(out)


def _rt_rel_normalize(state: DataFrame) -> DataFrame:
    """Project every relation onto unit modulus PER DIMENSION — the
    RotatE constraint |r_i| = 1 that makes each relation coordinate a
    pure rotation in its complex plane.  Unlike the entity unit-BALL
    projection (one norm per vector, a groupBy), this is a pure
    per-row projection: m = sqrt(q9(xr²) + q9(xi²)) is a fixed IEEE
    tree (multiply → q9 → add → sqrt, each op correctly rounded), so
    the DuckDB twin writing the identical expression agrees bitwise
    — no decimal accumulation needed for a two-term sum."""
    m = F.sqrt(
        _q9(F.col("xr") * F.col("xr")) + _q9(F.col("xi") * F.col("xi"))
    )
    return state.select(
        "id",
        "i",
        F.when(m > 0, _q9(F.col("xr") / m)).otherwise(F.col("xr")).alias(
            "xr"
        ),
        F.when(m > 0, _q9(F.col("xi") / m)).otherwise(F.col("xi")).alias(
            "xi"
        ),
    )


def _rt_dim_energy(tr: Column, ti: Column) -> Column:
    """Per-dimension squared modulus |h_i·r_i − t_i|² against a tail
    (tr, ti): the rotated head (ar·br − ai·bi, ar·bi + ai·br) minus
    the tail, squared and summed across channels — ONE fixed IEEE
    expression tree, written character-identically in the DuckDB twin
    so the q9 quantization is engine-exact."""
    pr = F.col("ar") * F.col("br") - F.col("ai") * F.col("bi") - tr
    pi = F.col("ar") * F.col("bi") + F.col("ai") * F.col("br") - ti
    return _q9(pr * pr + pi * pi)


def _rt_energies(core: DataFrame, margin: float) -> DataFrame:
    """Per-triple RotatE energies d = Σᵢ |hᵢrᵢ − tᵢ|² (true and
    corrupted tail) and the margin-violation flag — the
    :func:`_energies` recipe (energy: LOWER is better) over the
    two-channel core."""
    return core.groupBy("subj", "pred", "obj", "neg_obj").agg(
        F.sum(_rt_dim_energy(F.col("cr"), F.col("ci")).cast(_DEC))
        .cast("double")
        .alias("d_pos"),
        F.sum(_rt_dim_energy(F.col("dr"), F.col("di")).cast(_DEC))
        .cast("double")
        .alias("d_neg"),
    ).withColumn(
        "violated",
        (F.lit(float(margin)) + F.col("d_pos") - F.col("d_neg")) > 0,
    )


def _rt_train_states(
    triples: DataFrame, dim: int, iters: int, lr: float, margin: float
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared training core of the RotatE faces: the
    :func:`_cx_train_states` loop with the rotation energy
    d = Σᵢ |hᵢ∘rᵢ − tᵢ|² (element-wise complex multiply, squared-L2
    margin loss like TransE) and the per-dimension unit-modulus
    relation projection at epoch start (next to the entity unit-ball
    projection).  Because a unit-modulus multiply is an isometry,
    RotatE models COMPOSITION (r₃ = r₁∘r₂), anti-symmetry, and
    inversion (conjugate rotation) — the expressiveness argument of
    Sun et al., ICLR 2019.  All gradients are polynomial in the
    components (the residual algebra below), so the q9 bit-exact
    cross-engine contract holds with no transcendental anywhere:
    the rotation is PARAMETRIZED by its cartesian components under
    projection, not by a phase angle, precisely so that no cos/sin
    (whose rounding differs across engines) ever enters the loop."""
    if dim < 1 or iters < 1:
        raise ValueError("rotate_train: dim and iters must be >= 1")
    t = (
        triples.select("subj", "pred", "obj")
        .distinct()
        .localCheckpoint(eager=False)
    )
    ents = (
        t.select(F.col("subj").alias("id"))
        .unionByName(t.select(F.col("obj").alias("id")))
        .distinct()
    )
    rels = t.select(F.col("pred").alias("id")).distinct()
    n_triples = t.count()
    tneg = _negatives(t, ents).localCheckpoint(eager=False)
    e_state = _cx_init_state(ents, "entity", dim)
    r_state = _cx_init_state(rels, "relation", dim)
    # margin-energy subgradients: with p = h∘r − t (true tail) and
    # q = h∘r − t' (corrupted), ∂d/∂h and ∂d/∂r go through the
    # rotation product, and p − q = t' − t (the rotated head cancels)
    # — so head/relation gradients need only the tail difference,
    # the ComplEx ddr/ddi trick for the distance model
    ddr = F.col("dr") - F.col("cr")
    ddi = F.col("di") - F.col("ci")
    pr = F.col("ar") * F.col("br") - F.col("ai") * F.col("bi")
    pi = F.col("ar") * F.col("bi") + F.col("ai") * F.col("br")
    for _ in range(iters):
        e_state = _cx_l2_normalize(e_state)
        r_state = _rt_rel_normalize(r_state)
        core = _cx_core(tneg, e_state, r_state)
        viol = (
            _rt_energies(core, margin)
            .where("violated")
            .select("subj", "pred", "obj", "neg_obj")
        )
        vc = core.join(viol, ["subj", "pred", "obj", "neg_obj"])
        grads_e = (
            vc.select(
                F.col("subj").alias("id"),
                "i",
                # ∂(d_pos − d_neg)/∂a = 2·conj(r)·(p − q) = 2·conj(r)
                # ·(t' − t), expanded to cartesian components
                _q9(
                    F.lit(2.0)
                    * (F.col("br") * ddr + F.col("bi") * ddi)
                ).alias("gr"),
                _q9(
                    F.lit(2.0)
                    * (F.col("br") * ddi - F.col("bi") * ddr)
                ).alias("gi"),
            )
            .unionByName(
                vc.select(
                    F.col("obj").alias("id"),
                    "i",
                    _q9(F.lit(-2.0) * (pr - F.col("cr"))).alias("gr"),
                    _q9(F.lit(-2.0) * (pi - F.col("ci"))).alias("gi"),
                )
            )
            .unionByName(
                vc.select(
                    F.col("neg_obj").alias("id"),
                    "i",
                    _q9(F.lit(2.0) * (pr - F.col("dr"))).alias("gr"),
                    _q9(F.lit(2.0) * (pi - F.col("di"))).alias("gi"),
                )
            )
        )
        grads_r = vc.select(
            F.col("pred").alias("id"),
            "i",
            # ∂/∂r = 2·conj(h)·(t' − t)
            _q9(
                F.lit(2.0) * (F.col("ar") * ddr + F.col("ai") * ddi)
            ).alias("gr"),
            _q9(
                F.lit(2.0) * (F.col("ar") * ddi - F.col("ai") * ddr)
            ).alias("gi"),
        )
        e_state = _cx_apply_grads(
            e_state, grads_e, lr, n_triples
        ).localCheckpoint(eager=False)
        r_state = _cx_apply_grads(
            r_state, grads_r, lr, n_triples
        ).localCheckpoint(eager=False)
    return tneg, e_state, r_state


def rotate_train(
    triples: DataFrame,
    dim: int = 4,
    iters: int = 2,
    lr: float = 5.0,
    margin: float = 1.0,
) -> DataFrame:
    """(id, kind, i, xr, xi): complex entity and per-dimension-
    rotation relation embeddings after ``iters`` unrolled full-batch
    RotatE epochs (Sun et al., ICLR 2019, "RotatE: Knowledge Graph
    Embedding by Relational Rotation in Complex Space") — trainable
    operator #8, the fourth KGE model: TransE translates, DistMult
    scales symmetrically, ComplEx scores a Hermitian product, RotatE
    ROTATES — the one family member that models relation COMPOSITION
    exactly (rotations compose by complex multiply).  Same
    determinism, long-format two-channel state, and cross-engine
    bit-exactness contract as the other trainers; the rotation is
    cartesian-parametrized under unit-modulus projection so no
    transcendental (cos/sin) ever enters the loop (see
    :func:`_rt_train_states`).
    """
    _, e_state, r_state = _rt_train_states(triples, dim, iters, lr, margin)
    return e_state.select(
        "id", F.lit("entity").alias("kind"), "i", "xr", "xi"
    ).unionByName(
        r_state.select(
            "id", F.lit("relation").alias("kind"), "i", "xr", "xi"
        )
    )


def rotate_energies(
    triples: DataFrame,
    dim: int = 4,
    iters: int = 2,
    lr: float = 5.0,
    margin: float = 1.0,
) -> DataFrame:
    """(subj, pred, obj, d_pos, d_neg, violated): per-triple RotatE
    rotation energies under the TRAINED embeddings — the
    :func:`transe_energies` face for the rotation model (unrounded
    doubles from exact decimal sums; Σ violated falls as iters grows,
    pinned by test).  Shares every stage with :func:`rotate_train`,
    so the faces cannot drift."""
    tneg, e_state, r_state = _rt_train_states(
        triples, dim, iters, lr, margin
    )
    core = _cx_core(tneg, e_state, r_state)
    return _rt_energies(core, margin).select(
        "subj", "pred", "obj", "d_pos", "d_neg", "violated"
    )


def rotate_rank_eval(
    triples: DataFrame,
    dim: int = 4,
    iters: int = 2,
    lr: float = 5.0,
    margin: float = 1.0,
    n_candidates: int = 20,
    side: str = "tail",
) -> DataFrame:
    """(subj, pred, obj, n_cands, rank, rr, hit1, hit3, hit10):
    filtered-protocol link-prediction evaluation of the trained
    RotatE model — :func:`transe_rank_eval`'s contract verbatim via
    the shared :func:`_rank_probe` / :func:`_rank_output`
    scaffolding, candidates ranked by rotation energy LOWEST-first.
    Head side scores |cand∘r − t|² (the candidate occupies the head
    slot of the rotation).  Same |test|·K·``dim``-row scale shape as
    the other evals."""
    if n_candidates < 1:
        raise ValueError("rotate_rank_eval: n_candidates must be >= 1")
    if side not in ("tail", "head"):
        raise ValueError("rotate_rank_eval: side must be tail|head")
    tneg, e_state, r_state = _rt_train_states(
        triples, dim, iters, lr, margin
    )
    t3 = tneg.select("subj", "pred", "obj")
    if side == "head":
        t3 = _flip(t3)
    probe = _rank_probe(t3, n_candidates)
    res = (
        probe.join(
            e_state.select(
                F.col("id").alias("subj"),
                "i",
                F.col("xr").alias("ar"),
                F.col("xi").alias("ai"),
            ),
            "subj",
        )
        .join(
            r_state.select(
                F.col("id").alias("pred"),
                "i",
                F.col("xr").alias("br"),
                F.col("xi").alias("bi"),
            ),
            ["pred", "i"],
        )
        .join(
            e_state.select(
                F.col("id").alias("cand"),
                "i",
                F.col("xr").alias("cr"),
                F.col("xi").alias("ci"),
            ),
            ["cand", "i"],
        )
        .select(
            "subj", "pred", "obj", "cand", "is_true",
            # tail side: |a∘r − cand|²; head side (flipped probe):
            # |cand∘r − a|² — the candidate occupies the head slot
            (
                _rt_dim_energy(F.col("cr"), F.col("ci"))
                if side == "tail"
                else _q9(
                    (
                        F.col("cr") * F.col("br")
                        - F.col("ci") * F.col("bi")
                        - F.col("ar")
                    )
                    * (
                        F.col("cr") * F.col("br")
                        - F.col("ci") * F.col("bi")
                        - F.col("ar")
                    )
                    + (
                        F.col("cr") * F.col("bi")
                        + F.col("ci") * F.col("br")
                        - F.col("ai")
                    )
                    * (
                        F.col("cr") * F.col("bi")
                        + F.col("ci") * F.col("br")
                        - F.col("ai")
                    )
                )
            ).alias("p"),
        )
    )
    scored = res.groupBy("subj", "pred", "obj", "cand", "is_true").agg(
        F.sum(F.col("p").cast(_DEC)).cast("double").alias("score")
    )
    # rotation ENERGY: lower is better
    out = _rank_output(scored, higher_is_better=False)
    return out if side == "tail" else _unflip_output(out)


def kge_entity_neighbors(
    triples: DataFrame,
    dim: int = 4,
    iters: int = 2,
    lr: float = 5.0,
    margin: float = 1.0,
    k: int = 5,
    model: str = "transe",
) -> DataFrame:
    """(id, neighbor, sim, rank): exact cosine top-k neighbours of
    every entity in TRAINED embedding space — the alias/canonicalize
    face of the KGE family (the route the module docstring promises
    ``kg.alias_candidates`` consumers): two entities the KG treats
    alike land close in embedding space even when their SURFACES
    share nothing, so these pairs complement the edit-distance and
    attribute-Jaccard alias routes as canonicalization candidate
    edges.  ``model`` picks the trainer (transe | distmult | complex
    | rotate); two-channel models embed as the 2·dim-real vector
    (standard complex-to-real flattening, cosine-preserving for the
    Hermitian inner product's real part).

    Determinism: per-term products quantize to the q9 grid and sum
    in exact decimal (order-free), norms/division are fixed IEEE
    trees, the published sim is floor-quantized at 1e-6, ties break
    by neighbor id — the family's cross-engine bit-exact contract.

    Scale: this is the EXACT face — the pairwise dot table is
    |E|²·dim rows through a dimension-keyed join, deliberately scoped
    to vocabulary-sized entity sets (the ``embedding_norm_stats``
    scoping rule).  At 10⁹ entities, pivot the long state to arrays
    and route through ``ops.similarity`` (IVF / LSH-bucketed ANN)
    instead; this face is the recall-1.0 oracle those paths are
    measured against.
    """
    if k < 1:
        raise ValueError("kge_entity_neighbors: k must be >= 1")
    if model in ("transe", "distmult"):
        trainer = _train_states if model == "transe" else _dm_train_states
        _, e_state, _ = trainer(triples, dim, iters, lr, margin)
        rows = e_state.select("id", "i", "x")
    elif model in ("complex", "rotate"):
        trainer = (
            _cx_train_states if model == "complex" else _rt_train_states
        )
        _, e_state, _ = trainer(triples, dim, iters, lr, margin)
        rows = e_state.select(
            "id", "i", F.col("xr").alias("x")
        ).unionByName(
            e_state.select(
                "id",
                (F.col("i") + F.lit(dim)).alias("i"),
                F.col("xi").alias("x"),
            )
        )
    else:
        raise ValueError(
            "kge_entity_neighbors: model must be "
            "transe|distmult|complex|rotate"
        )
    rows = rows.localCheckpoint(eager=False)
    nrm = rows.groupBy("id").agg(
        F.sqrt(
            F.sum(_q9(F.col("x") * F.col("x")).cast(_DEC)).cast("double")
        ).alias("nrm")
    )
    a = rows.select("id", "i", F.col("x").alias("xa"))
    b = rows.select(
        F.col("id").alias("neighbor"), "i", F.col("x").alias("xb")
    )
    dots = (
        a.join(b, "i")
        .where(F.col("id") != F.col("neighbor"))
        .groupBy("id", "neighbor")
        .agg(
            F.sum(_q9(F.col("xa") * F.col("xb")).cast(_DEC))
            .cast("double")
            .alias("dot")
        )
    )
    sim = (
        F.floor(
            F.try_divide(
                F.col("dot"), F.col("nrm") * F.col("nrm_b")
            )
            * F.lit(1e6)
            + F.lit(0.5)
        )
        / F.lit(1e6)
    )
    scored = (
        dots.join(nrm, "id")
        .join(
            nrm.select(
                F.col("id").alias("neighbor"),
                F.col("nrm").alias("nrm_b"),
            ),
            "neighbor",
        )
        .select("id", "neighbor", sim.alias("sim"))
        .where(F.col("sim").isNotNull())
    )
    w = Window.partitionBy("id").orderBy(
        F.desc("sim"), F.asc("neighbor")
    )
    return (
        scored.withColumn(
            "rank", F.row_number().over(w).cast("long")
        )
        .where(F.col("rank") <= k)
        .select("id", "neighbor", "sim", "rank")
    )


def kge_model_compare(
    triples: DataFrame,
    dim: int = 4,
    iters: int = 2,
    lr: float = 5.0,
    margin: float = 1.0,
    n_candidates: int = 20,
) -> DataFrame:
    """(model, n_test, mrr, hits1, hits3, hits10): the model-selection
    face of the KGE family — train all four models (TransE, DistMult,
    ComplEx, RotatE) on the same triples under the same
    hyper-parameters and aggregate their filtered link-prediction
    evals into one table.  The evals share :func:`_rank_probe`
    (identical candidate sets), so differences are MODEL differences,
    not sampling noise.

    Cross-engine exactness: Hits@k are integer sums over exact ranks;
    MRR sums reciprocal ranks on the engine-identical 1e-12 floor
    grid in exact decimal before the final double division, so the
    averages hash-match however partitions reduce.

    Scale: 4× one training run (each |T|·dim rows/epoch through
    (entity, i)-keyed equi-joins); the evals add |test|·K·dim rows
    each.  The four models are independent jobs — on a cluster they
    can run concurrently from the same cached triple table.
    """
    evals = [
        ("transe", transe_rank_eval),
        ("distmult", distmult_rank_eval),
        ("complex", complex_rank_eval),
        ("rotate", rotate_rank_eval),
    ]
    out = None
    for name, fn in evals:
        e = fn(
            triples,
            dim=dim,
            iters=iters,
            lr=lr,
            margin=margin,
            n_candidates=n_candidates,
        ).select(F.lit(name).alias("model"), "rank", "hit1", "hit3", "hit10")
        out = e if out is None else out.unionByName(e)
    # rr on the 1e-12 floor grid (engine-exact), decimal sum (order-
    # independent), final division in double
    rr12 = F.floor(
        (F.lit(1.0) / F.col("rank").cast("double")) * F.lit(1e12)
        + F.lit(0.5)
    ) / F.lit(1e12)
    n = F.count(F.lit(1))
    return out.groupBy("model").agg(
        n.cast("long").alias("n_test"),
        (
            F.sum(rr12.cast(_DEC)).cast("double") / n.cast("double")
        ).alias("mrr"),
        (
            F.sum(F.col("hit1").cast("long")).cast("double")
            / n.cast("double")
        ).alias("hits1"),
        (
            F.sum(F.col("hit3").cast("long")).cast("double")
            / n.cast("double")
        ).alias("hits3"),
        (
            F.sum(F.col("hit10").cast("long")).cast("double")
            / n.cast("double")
        ).alias("hits10"),
    )
