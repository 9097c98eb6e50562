"""Twenty-second batch: T5-style block-aligned span corruption
(ops.lm)."""

import pytest

from coies_spark.ops.lm import span_corruption

pytestmark = pytest.mark.spark


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestSpanCorruption:
    def test_full_rate_structure(self, spark):
        t = _docs(spark, [(1, "a b c d e f g h i j k l")])
        r = span_corruption(t, block=4, span=2, rate=1.0).collect()[0]
        assert r.n_tokens == 12 and r.n_corrupted == 3
        assert r.input == (
            "<extra_id_0> c d <extra_id_1> g h <extra_id_2> k l"
        )
        assert r.target == (
            "<extra_id_0> a b <extra_id_1> e f <extra_id_2> i j"
        )

    def test_zero_rate_is_identity(self, spark):
        t = _docs(spark, [(1, "a b c d e")])
        r = span_corruption(t, block=4, span=2, rate=0.0).collect()[0]
        assert r.n_corrupted == 0
        assert r.input == "a b c d e"
        assert r.target == ""

    def test_sentinel_agreement(self, spark):
        # every sentinel appearing in input appears in target, with
        # the cut span recoverable by splicing target into input
        t = _docs(spark, [(7, " ".join(f"t{i}" for i in range(40)))])
        r = span_corruption(t, block=5, span=2, rate=0.5).collect()[0]
        import re
        in_ids = re.findall(r"<extra_id_(\d+)>", r.input)
        tg_ids = re.findall(r"<extra_id_(\d+)>", r.target)
        assert in_ids == tg_ids
        assert len(in_ids) == r.n_corrupted
        # splice: replacing each sentinel in input by its target span
        # reconstructs the original token stream
        spans = re.split(r"<extra_id_\d+> ?", r.target)[1:]
        rebuilt = r.input
        for sid, sp in zip(in_ids, spans):
            rebuilt = rebuilt.replace(
                f"<extra_id_{sid}>", sp.strip(), 1
            )
        assert rebuilt.split() == [f"t{i}" for i in range(40)]

    def test_short_tail_block(self, spark):
        # 5 tokens, block 4: tail block holds 1 token < span — the
        # whole tail is cut, kept side empty
        t = _docs(spark, [(1, "a b c d e")])
        r = span_corruption(t, block=4, span=2, rate=1.0).collect()[0]
        assert r.input == "<extra_id_0> c d <extra_id_1>"
        assert r.target == "<extra_id_0> a b <extra_id_1> e"

    def test_empty_doc(self, spark):
        r = span_corruption(
            _docs(spark, [(1, "")]), rate=1.0
        ).collect()[0]
        assert (r.n_tokens, r.n_corrupted, r.input, r.target) == (
            0, 0, "", "",
        )

    def test_determinism_across_runs(self, spark):
        t = _docs(spark, [(i, "w " * 30) for i in range(20)])
        a = {r.doc_id: r.input for r in span_corruption(t).collect()}
        b = {
            r.doc_id: r.input
            for r in span_corruption(t.repartition(7)).collect()
        }
        assert a == b

    def test_param_validation(self, spark):
        t = _docs(spark, [(1, "a b")])
        with pytest.raises(ValueError):
            span_corruption(t, block=2, span=3)
        with pytest.raises(ValueError):
            span_corruption(t, rate=1.5)
