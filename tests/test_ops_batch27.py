"""Twenty-seventh batch: GPT-style document packing manifest
(ops.lm.pack_documents over the shared two-phase prefix sum)."""

import pytest
from pyspark.sql import functions as F

from coies_spark.ops.lm import pack_documents

pytestmark = pytest.mark.spark


def _docs(spark, sizes):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)],
        "doc_id long, n_tok long",
    )


def _pack(spark, sizes, row_tokens, n_buckets=4):
    return pack_documents(
        _docs(spark, sizes),
        row_tokens=row_tokens,
        n_tokens_col="n_tok",
        n_buckets=n_buckets,
    ).collect()


class TestPackDocuments:
    def test_split_across_rows(self, spark):
        # 10 + 10 + 10 into 16-token rows: doc1 splits at offset 6
        segs = sorted(
            _pack(spark, [10, 10, 10], 16),
            key=lambda r: (r.row_id, r.offset_in_row),
        )
        tup = [
            (r.doc_id, r.row_id, r.offset_in_row, r.offset_in_doc,
             r.seg_tokens)
            for r in segs
        ]
        assert tup == [
            (0, 0, 0, 0, 10),
            (1, 0, 10, 0, 6),
            (1, 1, 0, 6, 4),
            (2, 1, 4, 0, 10),
        ]

    def test_rows_tile_exactly(self, spark):
        import random
        sizes = [7, 31, 2, 64, 5, 19, 40, 3, 3, 90]
        segs = _pack(spark, sizes, 32)
        # every row except the last is exactly full
        by_row = {}
        for r in segs:
            by_row.setdefault(r.row_id, []).append(r)
        total = sum(sizes)
        last = max(by_row)
        for row_id, rs in by_row.items():
            filled = sum(r.seg_tokens for r in rs)
            # offsets tile the row contiguously from 0
            spans = sorted((r.offset_in_row, r.seg_tokens) for r in rs)
            pos = 0
            for off, ln in spans:
                assert off == pos
                pos += ln
            if row_id != last:
                assert filled == 32
        assert sum(r.seg_tokens for r in segs) == total

    def test_segments_tile_each_document(self, spark):
        sizes = [100, 7, 55]
        segs = _pack(spark, sizes, 16)
        for d, n in enumerate(sizes):
            mine = sorted(
                ((r.offset_in_doc, r.seg_tokens)
                 for r in segs if r.doc_id == d)
            )
            pos = 0
            for off, ln in mine:
                assert off == pos
                pos += ln
            assert pos == n

    def test_zero_token_docs_emit_nothing(self, spark):
        segs = _pack(spark, [5, 0, 5], 8)
        assert {r.doc_id for r in segs} == {0, 2}

    def test_giant_doc_spans_many_rows(self, spark):
        segs = _pack(spark, [100], 8)
        assert len(segs) == 13  # ceil(100/8)
        assert sum(r.seg_tokens for r in segs) == 100

    def test_rejects_bad_row_tokens(self, spark):
        with pytest.raises(ValueError):
            _pack(spark, [5], 0)
