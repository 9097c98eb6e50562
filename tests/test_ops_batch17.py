"""Seventeenth batch: N-Triples parsing (the RDF ingest face) with a
serialize->parse round trip against the pipeline serializer, plus
plan-shape pins for the batch-14..16 operators."""

import pytest
from pyspark.sql import functions as F

from coies_spark.ops.kg import inherit_types, parse_ntriples, subclass_closure
from coies_spark.ops.similarity import rerank_topk, sq8_topk
from coies_spark.ops.textstats import script_profile
from coies_spark.pipeline.triples import to_ntriples

pytestmark = pytest.mark.spark


def plan_of(df, mode: str = "simple") -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            mode
        )
    )


class TestParseNtriples:
    def test_roundtrip_on_escape_stress_rows(self, spark):
        rows = [
            ("plain", "p", "simple text"),
            ('q"uote', "p", 'say "hi"'),
            ("back\\slash", "p", "a\\b"),
            ("ctl", "p", "l1\nl2\r\tend"),
            # the classic trap: escaped backslash followed by n must
            # NOT collapse into a newline on the way back
            ("trap", "p", "not\\nnewline"),
            ("angle", "p", "a <b> c"),
        ]
        t = spark.createDataFrame(rows, "subj string, pred string, obj string")
        back = parse_ntriples(to_ntriples(t).select("line"))
        got = {r.obj for r in back.collect()}
        assert got == {o for _, _, o in rows}
        assert back.count() == len(rows)
        # all objects are plain literals; all subjects come back IRIs
        assert all(r.obj_kind == "literal" for r in back.collect())
        assert all(r.obj_qualifier is None for r in back.collect())
        assert all(
            r.subj.startswith("http://example.org/kg/id/")
            for r in back.collect()
        )

    def test_malformed_lines_dropped(self, spark):
        lines = spark.createDataFrame(
            [
                ('<urn:a> <urn:p> "ok" .',),
                ("garbage",),
                ('<urn:a> <urn:p> missing_quotes .',),
                ('<urn:a> <urn:p> "unterminated .',),
                ("",),
            ],
            "line string",
        )
        out = parse_ntriples(lines).collect()
        assert len(out) == 1
        assert (out[0].subj, out[0].pred, out[0].obj) == (
            "urn:a", "urn:p", "ok",
        )

    def test_iri_objects(self, spark):
        lines = spark.createDataFrame(
            [('<urn:a> <urn:p> <urn:b> .',)], "line string"
        )
        row = parse_ntriples(lines).collect()[0]
        assert row.obj == "urn:b"
        assert row.obj_kind == "iri"
        assert row.obj_qualifier is None

    def test_real_dump_forms(self, spark):
        lines = spark.createDataFrame(
            [
                ('<urn:a> <urn:p> "hello"@en .',),
                ('<urn:a> <urn:p> "1"^^<http://www.w3.org/2001/'
                 'XMLSchema#integer> .',),
                ('_:b0 <urn:p> <urn:b> .',),
                ('<urn:a> <urn:p> _:b1 .',),
                ('<urn:a>\t<urn:p>\t"tabbed"  .',),
            ],
            "line string",
        )
        out = parse_ntriples(lines).collect()
        assert len(out) == 5
        by_obj = {r.obj: r for r in out}
        assert by_obj["hello"].obj_kind == "literal"
        assert by_obj["hello"].obj_qualifier == "en"
        assert by_obj["1"].obj_qualifier.endswith("#integer")
        assert by_obj["urn:b"].subj == "_:b0"
        assert by_obj["_:b1"].obj_kind == "blank"
        assert by_obj["tabbed"].obj_qualifier is None

    def test_uchar_escapes_decode(self, spark):
        lines = spark.createDataFrame(
            [
                # BMP \uXXXX (+ lowercase hex), astral \UXXXXXXXX
                # (surrogate pair), BMP-range \U, and a LITERAL
                # backslash-u (serialized \\u0041) that must NOT
                # decode
                ('<urn:a> <urn:p> "A\\u00e9B" .',),
                ('<urn:b> <urn:p> "x\\U0001F600y" .',),
                ('<urn:c> <urn:p> "\\U00000041" .',),
                ('<urn:d> <urn:p> "\\\\u0041" .',),
                ('<urn:e> <urn:p> "\\u0041\\u0042 twice" .',),
            ],
            "line string",
        )
        by_subj = {
            r.subj: r.obj for r in parse_ntriples(lines).collect()
        }
        assert by_subj["urn:a"] == "AéB"
        assert by_subj["urn:b"] == "x\U0001F600y"
        assert by_subj["urn:c"] == "A"
        assert by_subj["urn:d"] == "\\u0041"
        assert by_subj["urn:e"] == "AB twice"

    def test_malformed_uchar_stays_verbatim(self, spark):
        lines = spark.createDataFrame(
            [('<urn:a> <urn:p> "bad \\uZZZZ here" .',)],
            "line string",
        )
        rows = parse_ntriples(lines).collect()
        assert rows[0].obj == "bad \\uZZZZ here"

    def test_blank_object_tight_dot(self, spark):
        # legal per the grammar: no whitespace between a blank-node
        # object and the terminating dot (labels never end in '.')
        lines = spark.createDataFrame(
            [
                ("<urn:a> <urn:p> _:b0.",),
                ("<urn:a> <urn:q> _:l.a.b.el.",),
                ("<urn:a> <urn:r> <urn:o>.",),
                ('<urn:a> <urn:s> "lit".',),
            ],
            "line string",
        )
        rows = {r.pred: r for r in parse_ntriples(lines).collect()}
        assert rows["urn:p"].obj == "_:b0"
        assert rows["urn:p"].obj_kind == "blank"
        assert rows["urn:q"].obj == "_:l.a.b.el"
        assert rows["urn:r"].obj == "urn:o"
        assert rows["urn:s"].obj == "lit"


class TestPlanShapes:
    def test_inherit_types_closure_is_broadcast(self, spark):
        closure = subclass_closure(
            spark.createDataFrame(
                [("a", "b"), ("b", "c")], "sub string, sup string"
            ),
            max_depth=2,
        )
        types = spark.createDataFrame(
            [("e1", "a")], "entity string, cls string"
        )
        p = plan_of(inherit_types(types, closure))
        assert "BroadcastHashJoin" in p or "BroadcastNestedLoop" in p

    def test_rerank_no_cartesian(self, spark):
        emb = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(10)],
            "vec_id long, embedding array<double>",
        )
        p = plan_of(rerank_topk(emb, sq8_topk(emb, k=5), k=3))
        assert "CartesianProduct" not in p

    def test_script_profile_no_exchange(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        p = plan_of(script_profile(docs))
        assert "Exchange" not in p
        # column pruning: only doc_id + text reach the scan
        pf = plan_of(script_profile(docs), "formatted")
        read = [l for l in pf.splitlines() if "ReadSchema" in l][0]
        assert "text" in read and "lang" not in read
