"""Hashed-feature logistic regression (ops.classify): replica parity,
learning sanity, and the unlabeled-bucket preservation rule."""

import hashlib
import math
import random

from coies_spark.core.textproc import tokenize
from coies_spark.ops import classify


def _replica(doc_texts, labels, iters=3, lr=1.0):
    """Pure-Python twin: same md5-hex buckets, same rounding pins,
    and the engine's exact accumulation — each term is a double
    product whose 12dp decimal ("%.12f", the cast-to-decimal(28,12)
    of a double) is summed exactly, so the replica can never land on
    the other side of a 9dp rounding boundary than the engine."""
    from decimal import ROUND_HALF_UP, Decimal

    def r9(x):
        # Spark's round(x, 9) = BigDecimal.valueOf(x) (shortest repr,
        # = Python repr) setScale(9, HALF_UP); Python's round() is
        # half-EVEN and diverges on exact .5 ties at the 9th digit
        return float(
            Decimal(repr(x)).quantize(
                Decimal("1e-9"), rounding=ROUND_HALF_UP
            )
        )

    feats = {}
    for d, text in doc_texts.items():
        c = {}
        for t in tokenize(text.lower()):
            b = hashlib.md5(t.encode()).hexdigest()[:2]
            c[b] = c.get(b, 0) + 1
        c["__bias__"] = 1
        feats[d] = c
    n = len(labels)  # N = the training set, not the corpus
    buckets = sorted({b for c in feats.values() for b in c})
    w = {b: 0.0 for b in buckets}

    def scores(weights):
        out = {}
        for d, c in feats.items():
            m = sum(
                (Decimal("%.12f" % (cnt * weights[b]))
                 for b, cnt in sorted(c.items())),
                Decimal(0),
            )
            out[d] = r9(1.0 / (1.0 + math.exp(-float(m))))
        return out

    for _ in range(iters):
        p = scores(w)
        g = {b: Decimal(0) for b in buckets}
        for d, c in sorted(feats.items()):
            if d not in labels:
                continue
            diff = p[d] - labels[d]
            for b, cnt in c.items():
                g[b] += Decimal("%.12f" % (cnt * diff))
        w = {b: r9(w[b] - lr * float(g[b]) / n) for b in buckets}
    return w, scores(w)


def _frames(spark, doc_texts, labels):
    docs = spark.createDataFrame(
        [(d, t) for d, t in sorted(doc_texts.items())],
        "doc_id bigint, text string",
    )
    y = spark.createDataFrame(
        [(d, v) for d, v in sorted(labels.items())],
        "doc_id bigint, y double",
    )
    return docs, y


class TestClassifier:
    def test_separable_corpus_learns_the_split(self, spark):
        pos = ["excellent brilliant superb work indeed"] * 3
        neg = ["terrible awful dreadful junk spam"] * 3
        doc_texts = {i: t for i, t in enumerate(pos + neg)}
        labels = {i: (1.0 if i < 3 else 0.0) for i in doc_texts}
        docs, y = _frames(spark, doc_texts, labels)
        out = {r.doc_id: r for r in
               classify.classify_docs(docs, y, iters=5).collect()}
        assert len(out) == 6
        for i in doc_texts:
            assert out[i].predicted == (i < 3), (i, out[i].p)
            assert out[i].y == labels[i]

    def test_randomized_python_parity(self, spark):
        rng = random.Random(20260818)
        vocab = [f"w{j}" for j in range(30)]
        doc_texts = {
            i: " ".join(rng.choice(vocab)
                        for _ in range(rng.randrange(3, 15)))
            for i in range(25)
        }
        labels = {i: float(rng.randrange(2)) for i in range(25)
                  if i % 5 != 0}  # every 5th doc unlabeled
        docs, y = _frames(spark, doc_texts, labels)
        w_want, p_want = _replica(doc_texts, labels, iters=3)
        w_got = {r.b: r.w for r in classify.train_text_classifier(
            docs, y, iters=3).collect()}
        assert w_got == w_want
        got = {r.doc_id: (r.p, r.y) for r in
               classify.classify_docs(docs, y, iters=3).collect()}
        # unlabeled docs are scored too, with NULL seed label
        assert got == {d: (p_want[d], labels.get(d))
                       for d in doc_texts}

    def test_unlabeled_only_bucket_keeps_zero_weight(self, spark):
        # 'zzqy' appears ONLY in the unlabeled doc: its bucket must
        # survive training at weight 0, and the doc must be scored
        doc_texts = {0: "alpha beta", 1: "alpha gamma", 2: "zzqy"}
        labels = {0: 1.0, 1: 0.0}
        docs, y = _frames(spark, doc_texts, labels)
        w = {r.b: r.w for r in classify.train_text_classifier(
            docs, y, iters=2).collect()}
        zb = hashlib.md5(b"zzqy").hexdigest()[:2]
        assert w[zb] == 0.0
        out = {r.doc_id: r.p for r in
               classify.classify_docs(docs, y, iters=2).collect()}
        assert set(out) == {0, 1, 2}

    def test_warm_start_equals_full_retrain(self, spark):
        # determinism makes the refresh exact: 2 rounds then 1 more
        # from those weights == 3 rounds from zero, bit for bit
        rng = random.Random(7)
        doc_texts = {i: " ".join(f"w{rng.randrange(20)}"
                                 for _ in range(8)) for i in range(15)}
        labels = {i: float(i % 2) for i in range(15)}
        docs, y = _frames(spark, doc_texts, labels)
        w2 = classify.train_text_classifier(docs, y, iters=2)
        warm = {r.b: r.w for r in classify.train_text_classifier(
            docs, y, iters=1, init=w2).collect()}
        cold = {r.b: r.w for r in classify.train_text_classifier(
            docs, y, iters=3).collect()}
        assert warm == cold

    def test_warm_start_keeps_buckets_absent_from_new_batch(self, spark):
        # a learned bucket whose tokens don't appear in the refresh
        # batch must keep its weight, not vanish from the table
        docs1, y1 = _frames(spark, {0: "alpha beta", 1: "gamma"},
                            {0: 1.0, 1: 0.0})
        w1 = classify.train_text_classifier(docs1, y1, iters=2)
        ab = hashlib.md5(b"alpha").hexdigest()[:2]
        w1_ab = {r.b: r.w for r in w1.collect()}[ab]
        assert w1_ab != 0.0
        docs2, y2 = _frames(spark, {5: "delta epsilon"}, {5: 1.0})
        w2 = {r.b: r.w for r in classify.train_text_classifier(
            docs2, y2, iters=1, init=w1).collect()}
        assert w2[ab] == w1_ab  # untouched, not deleted

    def test_empty_doc_gets_bias_score(self, spark):
        doc_texts = {0: "good stuff here", 1: ""}
        labels = {0: 1.0, 1: 0.0}
        docs, y = _frames(spark, doc_texts, labels)
        out = {r.doc_id: r.p for r in
               classify.classify_docs(docs, y, iters=2).collect()}
        assert 1 in out  # empty doc scored via the bias feature
