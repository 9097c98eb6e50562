"""Measurement-only companion to the frozen ``bench.py`` (guide §1).

Provides what the driver harness does not:

* fresh-JVM per-query timing with ``--repeat``/``--warmup`` (same
  builders and sinks as ``bench.py``, copied verbatim — bench.py is
  frozen for measurement and stays untouched);
* ``--noop``: time the computation through the noop sink
  (``df.write.format("noop")``) so column pruning under ``count()``
  cannot hide work (guide §1.4);
* ``--explain DIR``: write ``explain("formatted")`` for each query to
  ``DIR/<query>.txt`` (the plans/r06 artifacts);
* ``--stages``: enable the UI for the run and dump per-stage executor
  run time + shuffle bytes from the REST API — the "where does the
  time go" evidence the optimization log cites.

Never used by the driver; numbers printed here feed
OPTIMIZATION_r06.md only.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_queries(spark, sf_dir: str, need_kg: bool):
    """The bench.py query table, verbatim (DataFrame builders; the
    sink is applied by the caller)."""
    from pyspark.sql import functions as F

    from coies_spark.core.oneshot import build_example_artifacts
    from coies_spark.operators.graph import (
        random_walks as graph_random_walks,
    )
    from coies_spark.data import synth
    from coies_spark.ops import (
        bpe,
        curate,
        dedup,
        kg,
        lm,
        relational,
        similarity,
        sketch,
        textstats,
        transcripts,
        wmd,
    )
    from coies_spark.pipeline.extract import extract_mentions
    from coies_spark.pipeline.triples import conv_triples

    import bench as _bench
    from __spark_entry__ import queries as _entry_queries
    from __spark_entry__ import (
        SMALL_CORPUS_CONFIG,
        _align_kgs,
        _kg_evidence,
        _q_agg_pricing,
        _q_em_linkage,
        _q_embedding_neardup,
        _q_join_revenue,
        _q_kg_ntriples,
        _q_quality_classifier,
        _q_semdedup,
        _q_temporal_triples,
        _transe,
        _truth_claims,
    )

    raw = tagged = artifacts = None
    if need_kg:
        raw, tagged, corpus, _n = _bench.build_transcripts(spark, 2000)
        artifacts = build_example_artifacts(
            corpus.example.tagged_text,
            synth.corpus_sentences(corpus),
            SMALL_CORPUS_CONFIG,
        )
        extract_mentions(raw, artifacts, tagged_transcripts=tagged).count()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(32)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(32)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")

    def synth_t():
        return transcripts.synthesize_transcripts(docs)

    q = {
        "minhash_lsh": lambda: dedup.lsh_candidate_pairs(docs),
        "jaccard_pairs": lambda: dedup.jaccard_pairs(docs),
        "simhash": lambda: dedup.simhash(docs),
        "ann_brute_topk": lambda: similarity.brute_topk(emb),
        "ann_ivf_kmeans": lambda: similarity.ivf_topk_kmeans(emb),
        "ann_ivf_pq": lambda: similarity.ivf_pq_topk(emb, dim=64),
        "embedding_neardup": lambda: _q_embedding_neardup(spark, sf_dir),
        "rouge1_pairs": lambda: relational.rouge1_pairs(docs),
        "rougel_pairs": lambda: relational.rougel_pairs(docs),
        "rwmd_pairs": lambda: wmd.rwmd_pairs(docs),
        "curate_corpus": lambda: curate.curate_corpus(
            docs, min_quality=0.62, fractions={"en": 0.5}
        ),
        "duplicate_spans": lambda: dedup.duplicate_spans(
            docs, span_tokens=20
        ),
        "conversation_stats": lambda: transcripts.conversation_stats(
            synth_t()
        ),
        "agent_loops": lambda: transcripts.agent_loops(
            synth_t(), min_chain=1
        ),
        "pack_turns": lambda: transcripts.pack_turns(synth_t()),
        "winnow_fingerprints": lambda: textstats.winnow_fingerprints(
            docs
        ).agg(F.sum("n_fp"), F.min("fp_min"), F.count("fp_digest")),
        "pattern_triples": lambda: kg.pattern_triples(
            synth_t(),
            [("scans", r"(\w+) scan (\w+)"),
             ("hashes", r"(\w+) hash (\w+)")],
        ),
        "text_tiling": lambda: transcripts.text_tiling(synth_t()).agg(
            F.sum("segment_id"),
            F.sum(F.col("is_boundary").cast("int")),
            F.sum("sim_next"),
        ),
        "textrank_sentences": lambda: textstats.textrank_sentences(
            synth_t()
            .groupBy(F.col("conv_id").alias("doc_id"))
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("turn_idx", "text"))
                        ),
                        lambda x: x["text"],
                    ),
                    ". ",
                ).alias("text")
            )
        ),
        "scrub_boilerplate": lambda: transcripts.scrub_boilerplate_turns(
            synth_t()
        ),
        "semdedup": lambda: _q_semdedup(spark, sf_dir),
        "lm_perplexity": lambda: lm.lm_perplexity(docs),
        "quality_classifier": lambda: _q_quality_classifier(
            spark, sf_dir
        ).agg(F.sum("p"), F.count("predicted")),
        "bpe_train": lambda: bpe.bpe_merges(docs, 8),
        "temporal_triples": lambda: _q_temporal_triples(spark, sf_dir),
        "em_linkage": lambda: _q_em_linkage(spark, sf_dir).agg(
            F.sum("m"), F.sum("u"), F.max("p")
        ),
        "training_pairs": lambda: transcripts.training_pairs(
            synth_t()
        ).agg(
            F.sum("n_context"), F.sum(F.length("prompt")),
            F.sum(F.length("response")),
        ),
        "transcript_integrity": lambda: transcripts.transcript_integrity(
            synth_t()
        ).agg(
            F.sum("n_turns"), F.sum("ts_inversions"),
            F.sum("dup_turn_idx"), F.sum("missing_turn_idx"),
            F.sum("null_text"), F.sum("empty_text"),
        ),
        "random_walks": lambda: graph_random_walks(
            spark.range(50_000)
            .select(
                F.col("id").cast("string").alias("src"),
                ((F.col("id") + 1) % 50_000).cast("string").alias("dst"),
            )
            .union(
                spark.range(50_000).select(
                    F.col("id").cast("string").alias("src"),
                    ((F.col("id") * 7 + 3) % 50_000)
                    .cast("string")
                    .alias("dst"),
                )
            ),
            length=4,
            walks_per_node=2,
        ),
        "materialize_inverses": lambda: kg.materialize_inverses(
            _kg_evidence(spark, sf_dir).select("subj", "pred", "obj"),
            {
                "mentions_op": "op_mentioned_in",
                "mentions_engine": "engine_mentioned_in",
            },
        ).agg(F.sum(F.col("inferred").cast("int")), F.count("subj")),
        "kg_ntriples_roundtrip": lambda: kg.parse_ntriples(
            _q_kg_ntriples(spark, sf_dir).select("line")
        ).agg(
            F.count("subj"),
            F.sum(F.length("obj")),
            F.sum((F.col("obj_kind") == "iri").cast("int")),
        ),
        "truth_discovery": lambda: kg.truth_discovery(
            _truth_claims(spark, sf_dir), iters=4
        ),
        "kg_align": lambda: kg.kg_align(*_align_kgs(spark, sf_dir)),
        "transe_train": lambda: _transe(spark, sf_dir, "train"),
        "transe_rank_eval": lambda: _transe(spark, sf_dir, "rank_eval"),
        "distmult_train": lambda: _transe(spark, sf_dir, "dm_train"),
        "complex_train": lambda: _transe(spark, sf_dir, "cx_train"),
        "rotate_train": lambda: _transe(spark, sf_dir, "rt_train"),
        "distant_supervision": lambda: _entry_queries()[
            "distant_supervision"
        ](spark, sf_dir),
        "relation_proposals": lambda: _entry_queries()[
            "relation_proposals"
        ](spark, sf_dir),
        "hist_quantiles": lambda: sketch.histogram_quantiles(
            sketch.histogram_registers(
                docs, "n_chars", n_bins=64, lo=0.0, hi=640.0
            ),
            [0.25, 0.5, 0.9, 0.99],
        ),
        "agg_pricing": lambda: _q_agg_pricing(spark, sf_dir),
        "join_revenue": lambda: _q_join_revenue(spark, sf_dir),
        "sessionize": lambda: relational.sessionize(events),
    }
    if need_kg:
        q["kg_extract"] = lambda: conv_triples(
            extract_mentions(raw, artifacts, tagged_transcripts=tagged)
        )
    return q


def dump_stages(spark, top: int = 20):
    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:4040/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    print(
        f"{'stage':>6} {'runTime_s':>10} {'cpu_s':>8} {'tasks':>6} "
        f"{'in_MB':>8} {'shRead_MB':>10} {'shWrite_MB':>11}  name"
    )
    for s in stages[:top]:
        print(
            f"{s['stageId']:>6} {s['executorRunTime']/1e3:>10.2f} "
            f"{s.get('executorCpuTime',0)/1e9:>8.2f} {s['numCompleteTasks']:>6} "
            f"{s.get('inputBytes',0)/1e6:>8.1f} "
            f"{s.get('shuffleReadBytes',0)/1e6:>10.1f} "
            f"{s.get('shuffleWriteBytes',0)/1e6:>11.1f}  "
            f"{s['name'].splitlines()[0][:70]}"
        )
    total_rt = sum(s.get("executorRunTime", 0) for s in stages) / 1e3
    print(f"total executorRunTime across {len(stages)} stages: {total_rt:.1f}s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int, default=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--warmup", action="store_true")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain", default=None, metavar="DIR")
    ap.add_argument("--suffix", default="", help="explain file suffix")
    ap.add_argument("--stages", action="store_true")
    args = ap.parse_args()

    from coies_spark.session import get_spark

    extra = {"spark.ui.enabled": "true"} if args.stages else None
    spark = get_spark("coies-bench-extra", cores=args.cores,
                      extra_conf=extra)
    need_kg = "kg_extract" in args.queries
    table = build_queries(spark, args.sf_dir, need_kg)

    for name in args.queries:
        fn = table[name]
        if args.explain:
            df = fn()
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(
                args.explain, f"{name}{args.suffix}.txt"
            )
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}")
            continue

        def sink():
            df = fn()
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
                return -1
            return df.count()

        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if args.warmup:
            sink()
        samples = []
        n = -1
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            n = sink()
            samples.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({
            "query": name, "rows": n, "samples": samples,
            "min": min(samples), "noop": args.noop,
        }))
        spark.sparkContext.setJobDescription(None)

    if args.stages:
        dump_stages(spark)
    spark.stop()


if __name__ == "__main__":
    main()
