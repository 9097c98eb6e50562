"""Twenty-eighth batch: packing-manifest materialization (ops.lm)
plus plan-shape pins for the batch-20..27 operators."""

import pytest
from pyspark.sql import functions as F

from coies_spark.ops.kg import mine_path_rules, path_query
from coies_spark.ops.lm import materialize_rows, pack_documents
from coies_spark.ops.transcripts import preference_pairs

pytestmark = pytest.mark.spark


def plan_of(df, mode: str = "simple") -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            mode
        )
    )


class TestMaterializeRows:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )

    def test_rows_reconstruct_the_stream(self, spark):
        texts = [
            " ".join(f"d{i}w{j}" for j in range(n))
            for i, n in enumerate([5, 9, 3, 12])
        ]
        docs = self._docs(spark, texts)
        mf = pack_documents(docs, row_tokens=8, n_buckets=3)
        rows = sorted(
            materialize_rows(docs, mf).collect(),
            key=lambda r: r.row_id,
        )
        stream = " ".join(r.text for r in rows).split()
        want = " ".join(texts).split()
        assert stream == want
        # all but the last row exactly full
        for r in rows[:-1]:
            assert r.n_tokens == 8
            assert len(r.text.split()) == 8

    def test_n_docs_counts_segments(self, spark):
        docs = self._docs(spark, ["a b c", "d e f"])
        mf = pack_documents(docs, row_tokens=4, n_buckets=2)
        rows = {r.row_id: r for r in materialize_rows(docs, mf).collect()}
        assert rows[0].n_docs == 2  # doc0 + first token of doc1
        assert rows[0].text == "a b c d"
        assert rows[1].text == "e f"

    def test_subset_of_rows_materializes(self, spark):
        docs = self._docs(spark, ["a b c d e f g h", "i j"])
        mf = pack_documents(docs, row_tokens=4, n_buckets=2)
        one = materialize_rows(docs, mf.where(F.col("row_id") == 1))
        got = one.collect()
        assert len(got) == 1 and got[0].text == "e f g h"


class TestPlanShapes:
    def test_path_query_prunes_predicate_partitions(self, spark, tmp_path):
        t = spark.createDataFrame(
            [("a", "p", "b"), ("b", "q", "c"), ("x", "r", "y")],
            "subj string, pred string, obj string",
        )
        out = str(tmp_path / "triples")
        t.write.partitionBy("pred").parquet(out)
        stored = spark.read.parquet(out)
        p = plan_of(path_query(stored, ("p", "q")), "formatted")
        assert "PartitionFilters" in p
        pfs = [l for l in p.splitlines() if "PartitionFilters" in l]
        assert any("pred" in l for l in pfs)

    def test_mine_path_rules_no_cartesian(self, spark):
        t = spark.createDataFrame(
            [("a", "p", "m"), ("m", "q", "z"), ("a", "r", "z")],
            "subj string, pred string, obj string",
        )
        assert "CartesianProduct" not in plan_of(mine_path_rules(t))

    def test_preference_pairs_no_window(self, spark):
        ex = spark.createDataFrame(
            [("p", "a", 0.1), ("p", "b", 0.9)],
            "prompt string, response string, score double",
        )
        p = plan_of(preference_pairs(ex))
        assert "Window" not in p
