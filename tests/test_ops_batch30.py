"""Thirtieth batch: the shard WRITER — write_shards executes a
shard_plan into partitionBy(shard_id) parquet plus a per-shard
manifest (rows, bytes, digest), with idempotent dynamic-partition
re-runs, subset resume, and a manifest-vs-files byte-accounting
audit (verify_shards).  Completes curate → pack → shard end-to-end."""

import os

import pytest
from pyspark.sql import functions as F

from coies_spark.ops.maintenance import (
    shard_plan,
    verify_shards,
    write_shards,
)

pytestmark = pytest.mark.spark


def _docs(spark, n=40):
    return spark.createDataFrame(
        [(i, 10 + (i * 7) % 23, f"doc body {i}") for i in range(n)],
        "doc_id long, n_chars long, text string",
    )


def _data_files(path):
    out = {}
    for root, _, files in os.walk(f"{path}/data"):
        for fn in files:
            if fn.endswith(".parquet"):
                full = os.path.join(root, fn)
                out[full] = os.path.getmtime(full)
    return out


class TestWriteShards:
    def test_write_matches_plan_and_verifies(self, spark, tmp_path):
        docs = _docs(spark)
        path = str(tmp_path / "shards")
        manifest = write_shards(
            spark, docs, path, target_bytes=100
        ).collect()
        plan = shard_plan(docs, target_bytes=100).collect()
        want_rows, want_bytes = {}, {}
        for r in plan:
            want_rows[r.shard_id] = want_rows.get(r.shard_id, 0) + 1
            want_bytes[r.shard_id] = (
                want_bytes.get(r.shard_id, 0) + r.bytes
            )
        got_rows = {r.shard_id: r.n_rows for r in manifest}
        got_bytes = {r.shard_id: r.bytes for r in manifest}
        assert got_rows == want_rows
        assert got_bytes == want_bytes
        # total byte accounting: nothing dropped, nothing duplicated
        assert sum(got_bytes.values()) == sum(
            r.n_chars for r in docs.collect()
        )
        audit = verify_shards(spark, path).collect()
        assert audit and all(r.ok for r in audit)
        # data files carry every original column
        data = spark.read.parquet(f"{path}/data")
        assert {"doc_id", "n_chars", "text", "shard_id"} <= set(
            data.columns
        )
        assert data.count() == docs.count()

    def test_rerun_is_idempotent(self, spark, tmp_path):
        docs = _docs(spark)
        path = str(tmp_path / "shards")
        m1 = {
            (r.shard_id, r.n_rows, r.bytes, r.digest_sum)
            for r in write_shards(
                spark, docs, path, target_bytes=100
            ).collect()
        }
        d1 = {
            (r.shard_id, r.doc_id)
            for r in spark.read.parquet(f"{path}/data").collect()
        }
        m2 = {
            (r.shard_id, r.n_rows, r.bytes, r.digest_sum)
            for r in write_shards(
                spark, docs, path, target_bytes=100
            ).collect()
        }
        d2 = {
            (r.shard_id, r.doc_id)
            for r in spark.read.parquet(f"{path}/data").collect()
        }
        assert m1 == m2
        assert d1 == d2
        assert all(
            r.ok for r in verify_shards(spark, path).collect()
        )

    def test_resume_subset_leaves_other_shards_untouched(
        self, spark, tmp_path
    ):
        docs = _docs(spark)
        path = str(tmp_path / "shards")
        write_shards(spark, docs, path, target_bytes=100)
        before = _data_files(path)
        shard1_files = {
            p for p in before if "shard_id=1" in p
        }
        assert shard1_files
        # resume: rewrite ONLY shard 1
        write_shards(
            spark, docs, path, target_bytes=100, shard_ids=[1]
        )
        after = _data_files(path)
        # every non-shard-1 file survives byte-untouched (same path,
        # same mtime); shard 1's files were replaced
        for p, mt in before.items():
            if p not in shard1_files:
                assert after.get(p) == mt, p
        assert not (shard1_files & set(after))
        assert all(
            r.ok for r in verify_shards(spark, path).collect()
        )

    def test_tamper_is_detected(self, spark, tmp_path):
        docs = _docs(spark)
        path = str(tmp_path / "shards")
        write_shards(spark, docs, path, target_bytes=100)
        # corrupt one shard: drop a data file
        victim = sorted(
            p for p in _data_files(path) if "shard_id=0" in p
        )[0]
        os.remove(victim)
        audit = {
            r.shard_id: r.ok
            for r in verify_shards(spark, path).collect()
        }
        assert audit[0] is False
        assert all(ok for s, ok in audit.items() if s != 0)

    def test_content_digest_cols(self, spark, tmp_path):
        # digesting the text column catches content swaps that keep
        # row counts and sizes intact
        docs = _docs(spark)
        path = str(tmp_path / "shards")
        write_shards(
            spark,
            docs,
            path,
            target_bytes=100,
            digest_cols=["doc_id", "text"],
        )
        ok1 = verify_shards(
            spark, path, digest_cols=["doc_id", "text"]
        ).collect()
        assert all(r.ok for r in ok1)
        # a verifier using DIFFERENT digest columns must disagree
        bad = verify_shards(
            spark, path, digest_cols=["doc_id", "n_chars"]
        ).collect()
        assert not all(r.ok for r in bad)

    def test_empty_shard_ids_rejected(self, spark, tmp_path):
        with pytest.raises(ValueError):
            write_shards(
                spark,
                _docs(spark),
                str(tmp_path / "s"),
                target_bytes=100,
                shard_ids=[],
            )

    def test_shrinking_rerun_leaves_no_stale_shards(
        self, spark, tmp_path
    ):
        # a re-run with a DIFFERENT plan (larger target -> fewer
        # shards) must replace the dataset: no stale shard partitions
        # on disk, no stale rows in the manifest, no document present
        # twice
        docs = _docs(spark)
        path = str(tmp_path / "shrink")
        many = write_shards(spark, docs, path, target_bytes=60)
        assert many.count() > 3
        few = write_shards(spark, docs, path, target_bytes=10_000)
        assert few.count() == 1
        # manifest holds ONLY the new plan's shards
        assert spark.read.parquet(f"{path}/manifest").select(
            "shard_id"
        ).distinct().count() == 1
        # data dir holds only the new shard partitions, each doc once
        data = spark.read.parquet(f"{path}/data")
        assert data.select("shard_id").distinct().count() == 1
        assert data.count() == docs.count()
        assert data.select("doc_id").distinct().count() == docs.count()
        # and the audit stays green
        bad = verify_shards(spark, path).where("NOT ok").count()
        assert bad == 0
