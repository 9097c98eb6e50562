"""Thirty-first batch: prepare_training_run — the fused
curate → decontaminate → near-dedup → budget-sample → pack → shard
pipeline as StageRunner stages.  The done-criterion test kills the
run mid-way and proves the resumed run produces byte-identical final
shards (same manifest digests, same shard contents) while skipping
every completed stage."""

import pytest
from pyspark.sql import functions as F

from coies_spark.ops.maintenance import verify_shards
from coies_spark.pipeline.training_run import prepare_training_run

pytestmark = pytest.mark.spark

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _bench(spark, path):
    # one benchmark item that IS a corpus document (guaranteed
    # contamination hit) plus one that matches nothing
    doc = (
        spark.read.parquet(DOCS)
        .orderBy(F.length("text").desc())
        .select("text")
        .limit(1)
        .collect()[0]
        .text
    )
    spark.createDataFrame(
        [(900001, doc), (900002, "zz qq xx yy ww vv uu tt ss rr")],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(path)
    return doc


def _shard_state(spark, out):
    manifest = {
        (r.shard_id, r.n_rows, r.bytes, r.digest_sum)
        for r in spark.read.parquet(f"{out}/shard_files/manifest").collect()
    }
    data = {
        (r.shard_id, r.doc_id)
        for r in spark.read.parquet(f"{out}/shard_files/data").collect()
    }
    return manifest, data


class TestPrepareTrainingRun:
    def test_end_to_end_funnel_and_decontamination(
        self, spark, tmp_path
    ):
        bench_path = str(tmp_path / "bench")
        planted = _bench(spark, bench_path)
        out = str(tmp_path / "run")
        manifest, runner = prepare_training_run(
            spark,
            DOCS,
            out,
            budget_tokens=2000,
            row_tokens=64,
            target_shard_bytes=512,
            benchmark_path=bench_path,
        )
        rows = manifest.collect()
        assert rows and all(r.n_rows > 0 for r in rows)
        # funnel: every stage ran, counts are monotone through the
        # filtering stages
        m = {r["stage"]: r for r in runner.metrics().collect()}
        assert set(m) == {
            "curated",
            "decontaminated",
            "deduped",
            "sampled",
            "packed",
            "shards",
        }
        assert (
            m["curated"].rows
            >= m["decontaminated"].rows
            >= m["deduped"].rows
            >= m["sampled"].rows
        )
        assert all(not r.resumed for r in m.values())
        # the planted benchmark document is gone from the output
        kept_ids = {
            r.doc_id
            for r in spark.read.parquet(f"{out}/shard_files/data").collect()
        }
        planted_ids = {
            r.doc_id
            for r in spark.read.parquet(DOCS)
            .where(F.col("text") == planted)
            .collect()
        }
        assert planted_ids and not (planted_ids & kept_ids)
        # the written shards audit clean
        audit = verify_shards(
            spark, f"{out}/shard_files", size_col="n_tokens",
            digest_cols=["doc_id", "text"],
        ).collect()
        assert audit and all(r.ok for r in audit)

    def test_kill_resume_identical_shards(self, spark, tmp_path):
        bench_path = str(tmp_path / "bench")
        _bench(spark, bench_path)
        kwargs = dict(
            budget_tokens=2000,
            row_tokens=64,
            target_shard_bytes=512,
            benchmark_path=bench_path,
        )
        # reference: one uninterrupted run
        ref_out = str(tmp_path / "ref")
        prepare_training_run(spark, DOCS, ref_out, **kwargs)
        ref = _shard_state(spark, ref_out)

        # killed run: crash INSIDE the shards stage (after pack) by
        # making the shards directory write fail once
        out = str(tmp_path / "run")
        import coies_spark.pipeline.training_run as tr

        real_write = tr.write_shards
        calls = {"n": 0}

        def exploding(*a, **k):
            calls["n"] += 1
            raise RuntimeError("simulated mid-run kill")

        tr.write_shards = exploding
        try:
            with pytest.raises(RuntimeError, match="simulated"):
                prepare_training_run(spark, DOCS, out, **kwargs)
        finally:
            tr.write_shards = real_write
        assert calls["n"] == 1

        # resume: completed stages skip, only the shard stage runs
        manifest, runner = prepare_training_run(
            spark, DOCS, out, **kwargs
        )
        m = {r["stage"]: r for r in runner.metrics().collect()}
        for st in ("curated", "decontaminated", "deduped", "sampled",
                   "packed"):
            assert m[st].resumed, st
        assert not m["shards"].resumed
        # identical final shards to the uninterrupted run
        assert _shard_state(spark, out) == ref

        # a third invocation is a pure no-op: every stage skips
        _, runner3 = prepare_training_run(spark, DOCS, out, **kwargs)
        assert all(
            r.resumed for r in runner3.metrics().collect()
        )
        assert _shard_state(spark, out) == ref

    def test_bpe_budget_mode(self, spark, tmp_path):
        from coies_spark.ops.bpe import bpe_merges

        merges = [
            (r.lhs, r.rhs)
            for r in bpe_merges(spark.read.parquet(DOCS), 4)
            .orderBy("rank")
            .collect()
        ]
        out = str(tmp_path / "run_bpe")
        manifest, runner = prepare_training_run(
            spark,
            DOCS,
            out,
            budget_tokens=8000,
            row_tokens=128,
            target_shard_bytes=2048,
            merges=merges,
        )
        assert manifest.count() > 0
        sampled = spark.read.parquet(f"{out}/sampled/data")
        assert "n_bpe_tokens" in sampled.columns
        # budget respected in BPE tokens per stratum
        for r in sampled.collect():
            assert r.cum_before < 8000
        audit = verify_shards(
            spark, f"{out}/shard_files", size_col="n_bpe_tokens",
            digest_cols=["doc_id", "text"],
        ).collect()
        assert audit and all(r.ok for r in audit)
