"""Twenty-fourth batch: fill-in-the-middle transformation (ops.lm)."""

import pytest

from coies_spark.ops.lm import fim_split

pytestmark = pytest.mark.spark


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestFimSplit:
    def test_reconstruction(self, spark):
        words = [f"w{i}" for i in range(30)]
        t = _docs(spark, [(i, " ".join(words)) for i in range(10)])
        for r in fim_split(t).collect():
            assert r.n_tokens == 30
            if r.mode == "psm":
                pre, rest = r.output.removeprefix("<PRE> ").split(
                    " <SUF> ", 1
                )
                suf, mid = rest.split(" <MID> ", 1)
            else:
                suf, rest = r.output.removeprefix("<SUF> ").split(
                    " <PRE> ", 1
                )
                pre, mid = rest.split(" <MID> ", 1)
            rebuilt = (pre + " " + mid + " " + suf).split()
            assert rebuilt == words
            assert len(pre.split()) == r.n_prefix
            assert len(mid.split()) == r.n_middle

    def test_cut_counts_consistent(self, spark):
        t = _docs(spark, [(i, "a b c d e f g h") for i in range(50)])
        for r in fim_split(t).collect():
            assert 0 <= r.n_prefix <= r.n_prefix + r.n_middle <= 8

    def test_modes_both_occur(self, spark):
        t = _docs(spark, [(i, "x y z") for i in range(60)])
        modes = {r.mode for r in fim_split(t).collect()}
        assert modes == {"psm", "spm"}
        only_psm = {r.mode for r in fim_split(t, spm_rate=0.0).collect()}
        assert only_psm == {"psm"}
        only_spm = {r.mode for r in fim_split(t, spm_rate=1.0).collect()}
        assert only_spm == {"spm"}

    def test_deterministic_across_partitioning(self, spark):
        t = _docs(spark, [(i, "a b c d e") for i in range(40)])
        a = {r.doc_id: r.output for r in fim_split(t).collect()}
        b = {
            r.doc_id: r.output
            for r in fim_split(t.repartition(9)).collect()
        }
        assert a == b

    def test_empty_doc(self, spark):
        r = fim_split(_docs(spark, [(1, "")])).collect()[0]
        assert (r.n_tokens, r.n_prefix, r.n_middle) == (0, 0, 0)
        assert r.output in (
            "<PRE>  <SUF>  <MID> ", "<SUF>  <PRE>  <MID> ",
        )

    def test_rate_validation(self, spark):
        with pytest.raises(ValueError):
            fim_split(_docs(spark, [(1, "a")]), spm_rate=-0.1)
