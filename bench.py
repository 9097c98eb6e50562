"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headliners cover the engine's load-bearing paths:
* kg_extract        — the flagship one-shot KG extraction over a
                      synthetic transcript corpus (turns/sec is the
                      BASELINE.json throughput metric; corpus size
                      scales with --turns / $SPARK_GRAFT_BENCH_TURNS)
* minhash_lsh       — shingle→minhash→band→bucket-join near-dup
* jaccard_pairs     — inverted-index exact Jaccard verification
* simhash           — per-doc Charikar fingerprints
* ann_brute_topk    — exact cosine top-k over embeddings
* ann_ivf_kmeans    — k-means-trained IVF probe-1 top-k
* ann_ivf_pq        — IVF-PQ: coarse routing + ADC over PQ codes
* rouge1_pairs      — clipped-unigram pair scoring
* rougel_pairs      — bit-vector LCS ROUGE-L pair scoring (Arrow UDF)
* rwmd_pairs        — relaxed word-mover's distance pair scoring
* curate_corpus     — fused quality+repetition+dedup+scrub+sample pass
* duplicate_spans   — ExactSubstr span dedup (shingle count + islands)
* conversation_stats— transcript role/alternation/tool health metrics
* pack_turns        — offset-based sequence packing into ~64-token
                      training chunks (order-deterministic reassembly)
* winnow_fingerprints — MOSS winnowing selection (array-side, 0
                      shuffles)
* scrub_boilerplate — CCNet repeated-line rule on transcript turns
                      (digest dictionary + anti-join scrub)
* semdedup          — SemDeDup semantic dedup (k-means blocks +
                      within-cluster cosine) over the planted corpus
* lm_perplexity     — CCNet-style bigram-LM perplexity filter
* quality_classifier— hashed-feature logistic regression: the
                      declarative GD training loop + corpus scoring
* temporal_triples  — SCD-2 validity intervals over the event stream
* em_linkage        — Fellegi-Sunter EM record linkage (pattern-count
                      sufficient statistics, 4 unrolled in-plan rounds)
* training_pairs    — instruct-pair assembly (one conv_id window pass)
* embedding_neardup — banded-LSH + exact-verify near-dup pairs
* transcript_integrity — ingest contract audit (dup/missing idx,
                      clock inversions, null gauges; one exchange)
* random_walks      — DeepWalk hash-random walks, 100k walkers × 4
                      unrolled two-join steps on a 50k-node graph
* agg_pricing       — Q1-style wide aggregation over lineitem
* join_revenue      — broadcast equi-join + agg
* sessionize        — windowed span assembly over events

Usage: python bench.py [--cores N] [--sf-dir DIR] [--turns N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_transcripts(spark, n_docs: int, replicate: int = 8):
    """Deterministic synthetic transcript corpus sized for the bench;
    replicated in-plan (JVM-side) to reach a meaningful turn count."""
    from pyspark.sql import functions as F

    from coies_spark.data import synth

    corpus = synth.make_corpus(
        n_test=n_docs // 2, n_plain=n_docs // 2, seed=42
    )

    def rep(use_raw: bool):
        df = spark.createDataFrame(
            synth.transcripts_frame(corpus.all_docs, use_raw=use_raw)
        )
        return (
            df.crossJoin(spark.range(replicate).select(F.col("id").alias("r")))
            .withColumn(
                "conv_id",
                F.concat_ws("-", "conv_id", F.col("r").cast("string")),
            )
            .drop("r")
            .repartition(128, "conv_id")
        )

    raw, tagged = rep(True), rep(False)
    n_turns = raw.cache().count()
    tagged.cache().count()
    return raw, tagged, corpus, n_turns


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--cores", type=int,
        default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument(
        "--turns", type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "0")),
        help="approx transcript turns for the kg_extract headliner "
             "(0 → ~350 docs ≈ 4k turns)",
    )
    ap.add_argument("--json-out", default=None)
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query subset (fresh-JVM per-query "
             "baseline pinning runs one query per process)",
    )
    ap.add_argument(
        "--warmup",
        action="store_true",
        help="run each selected query once untimed first — the pin "
             "runs time steady-state execution (scan cache + Python "
             "worker spin-up excluded), matching what an in-JVM "
             "sequence measures for every query after its first",
    )
    args = ap.parse_args()

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
    from coies_spark.session import get_spark

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

    spark = get_spark("coies-bench", cores=args.cores)
    sf_dir = args.sf_dir
    sf = 0.1 if "sf0.1" in sf_dir else (0.01 if "sf0.01" in sf_dir else 0.001)

    only_keep = (
        {q.strip() for q in args.only.split(",") if q.strip()}
        if args.only
        else None
    )
    # the synthetic transcript corpus + extraction warm-up only serve
    # the kg_extract headliner — a fresh-JVM single-query pin run for
    # any other query skips the ~30 s build entirely
    need_kg = only_keep is None or "kg_extract" in only_keep
    n_docs = max(64, args.turns // 96) if args.turns else 2000
    raw = tagged = artifacts = None
    n_turns = 0
    if need_kg:
        raw, tagged, corpus, n_turns = build_transcripts(spark, n_docs)
        artifacts = build_example_artifacts(
            corpus.example.tagged_text,
            synth.corpus_sentences(corpus),
            SMALL_CORPUS_CONFIG,
        )
        # warm-up (python worker spin-up + JIT) outside the timed region
        extract_mentions(
            raw, artifacts, tagged_transcripts=tagged
        ).count()

    # the sf tables are single parquet files → 1-partition scans that
    # would serialize the CPU-bound map side (shingling, hashing) onto
    # one core; spread them like a production multi-file table would be
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        args.cores
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(
        args.cores
    )
    events = spark.read.parquet(f"{sf_dir}/events.parquet")

    def run(df):
        # count() forces full execution without driver-side collect
        return df.count()

    queries = {
        "kg_extract": lambda: run(
            conv_triples(
                extract_mentions(raw, artifacts, tagged_transcripts=tagged)
            )
        ),
        "minhash_lsh": lambda: run(dedup.lsh_candidate_pairs(docs)),
        "jaccard_pairs": lambda: run(dedup.jaccard_pairs(docs)),
        "simhash": lambda: run(dedup.simhash(docs)),
        "ann_brute_topk": lambda: run(similarity.brute_topk(emb)),
        "ann_ivf_kmeans": lambda: run(similarity.ivf_topk_kmeans(emb)),
        "ann_ivf_pq": lambda: run(similarity.ivf_pq_topk(emb, dim=64)),
        # the driver query: raw embeddings + planted near-dup twins, so
        # the measurement exercises the >= 0.9 regime the operator is
        # geared for (the raw table alone is near-orthogonal noise with
        # zero true pairs)
        "embedding_neardup": lambda: run(
            _q_embedding_neardup(spark, sf_dir)
        ),
        "rouge1_pairs": lambda: run(relational.rouge1_pairs(docs)),
        "rougel_pairs": lambda: run(relational.rougel_pairs(docs)),
        "rwmd_pairs": lambda: run(wmd.rwmd_pairs(docs)),
        # the fused curation pipeline (quality + repetition + dedup +
        # scrub + mixture sample in 2 corpus scans)
        "curate_corpus": lambda: run(
            curate.curate_corpus(
                docs, min_quality=0.62, fractions={"en": 0.5}
            )
        ),
        # ExactSubstr span dedup (Lee et al. 2022) at the bench k=20
        "duplicate_spans": lambda: run(
            dedup.duplicate_spans(docs, span_tokens=20)
        ),
        # transcript health pass over the synthesized conv table
        "conversation_stats": lambda: run(
            transcripts.conversation_stats(
                transcripts.synthesize_transcripts(docs)
            )
        ),
        # stuck-agent loop detection (single-exchange window family)
        "agent_loops": lambda: run(
            transcripts.agent_loops(
                transcripts.synthesize_transcripts(docs), min_chain=1
            )
        ),
        # offset-based sequence packing (turns → ~64-token chunks)
        "pack_turns": lambda: run(
            transcripts.pack_turns(
                transcripts.synthesize_transcripts(docs)
            )
        ),
        # MOSS winnowing fingerprints (array-side, zero shuffles).
        # Aggregating sink: winnowing is a pure per-doc projection,
        # and a bare count() would let Catalyst prune every computed
        # column (cardinality is scan metadata) — the agg forces the
        # fold on all of them
        "winnow_fingerprints": lambda: run(
            textstats.winnow_fingerprints(docs).agg(
                F.sum("n_fp"), F.min("fp_min"), F.count("fp_digest")
            )
        ),
        # surface-pattern relation extraction (one scan, zero
        # shuffles — the rule route of the KG build)
        "pattern_triples": lambda: run(
            kg.pattern_triples(
                transcripts.synthesize_transcripts(docs),
                [("scans", r"(\w+) scan (\w+)"),
                 ("hashes", r"(\w+) hash (\w+)")],
            )
        ),
        # TextTiling episode segmentation (single-exchange window
        # chain over conv_id).  Aggregating sink for the same
        # collapse reason as winnow: windows preserve cardinality,
        # so a bare count() would drop the whole chain
        "text_tiling": lambda: run(
            transcripts.text_tiling(
                transcripts.synthesize_transcripts(docs)
            ).agg(
                F.sum("segment_id"),
                F.sum(F.col("is_boundary").cast("int")),
                F.sum("sim_next"),
            )
        ),
        # sentence-level TextRank: per-conversation extractive
        # summaries (turns reassembled with '. ' separators, weighted
        # per-doc PageRank over the sentence-overlap graph, top-2)
        "textrank_sentences": lambda: run(
            textstats.textrank_sentences(
                transcripts.synthesize_transcripts(docs)
                .groupBy(F.col("conv_id").alias("doc_id"))
                .agg(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(
                                    F.struct("turn_idx", "text")
                                )
                            ),
                            lambda x: x["text"],
                        ),
                        ". ",
                    ).alias("text")
                )
            )
        ),
        # boilerplate-turn scrub (CCNet repeated-line rule)
        "scrub_boilerplate": lambda: run(
            transcripts.scrub_boilerplate_turns(
                transcripts.synthesize_transcripts(docs)
            )
        ),
        # SemDeDup over the planted-twin corpus (same input as the
        # embedding_neardup headliner — the >= 0.9 regime exists)
        "semdedup": lambda: run(_q_semdedup(spark, sf_dir)),
        # CCNet-style bigram-LM perplexity filter (train slice counts
        # + token-keyed scoring joins + per-doc aggregation)
        "lm_perplexity": lambda: run(lm.lm_perplexity(docs)),
        # trainable quality filter: 3 full-batch GD rounds + scoring,
        # all one declarative plan (2 map-side-combinable shuffles
        # per round, broadcast weights).  Aggregating sink: scores
        # preserve cardinality
        "quality_classifier": lambda: run(
            _q_quality_classifier(spark, sf_dir).agg(
                F.sum("p"), F.count("predicted")
            )
        ),
        # BPE tokenizer induction: one corpus pass (word-frequency
        # build) + 8 merge rounds on the compact word table
        "bpe_train": lambda: run(bpe.bpe_merges(docs, 8)),
        # SCD-2 validity intervals over the event stream (the KG
        # evidence→belief layer's window-pass workhorse)
        "temporal_triples": lambda: run(_q_temporal_triples(spark, sf_dir)),
        # Fellegi–Sunter EM record linkage: source-blocked pair
        # generation + pattern-count collapse + 4 unrolled EM rounds,
        # all one plan (trainable op #4).  Aggregating sink: 3 rows
        "em_linkage": lambda: run(
            _q_em_linkage(spark, sf_dir).agg(
                F.sum("m"), F.sum("u"), F.max("p")
            )
        ),
        # instruct-pair assembly over the transcript corpus (ONE
        # conv_id exchange; the funnel's terminal operator).
        # Aggregating sink: prompts/responses preserve cardinality
        "training_pairs": lambda: run(
            transcripts.training_pairs(
                transcripts.synthesize_transcripts(docs)
            ).agg(
                F.sum("n_context"), F.sum(F.length("prompt")),
                F.sum(F.length("response")),
            )
        ),
        # transcript ingest contract check (one shared conv_id
        # exchange for the window pass + groupBy).  Aggregating sink:
        # unused gauge columns would otherwise be pruned out of the
        # HashAggregate
        "transcript_integrity": lambda: run(
            transcripts.transcript_integrity(
                transcripts.synthesize_transcripts(docs)
            ).agg(
                F.sum("n_turns"), F.sum("ts_inversions"),
                F.sum("dup_turn_idx"), F.sum("missing_turn_idx"),
                F.sum("null_text"), F.sum("empty_text"),
            )
        ),
        # DeepWalk hash-random walks over a synthesized 50k-node
        # ring+chord graph (100k edges): 100k walkers × 4 unrolled
        # steps, each step two equi-joins — measures the walk
        # machinery at real walker counts (count() cannot prune the
        # joins: step survival depends on them)
        "random_walks": lambda: run(
            graph_random_walks(
                spark.range(50_000)
                .select(
                    F.col("id").cast("string").alias("src"),
                    ((F.col("id") + 1) % 50_000)
                    .cast("string")
                    .alias("dst"),
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
            )
        ),
        # owl:inverseOf materialization over the evidence KG (one
        # projection + one dedup shuffle; the incoming-edge
        # denormalization).  Aggregating sink: provenance column
        "materialize_inverses": lambda: run(
            kg.materialize_inverses(
                _kg_evidence(spark, sf_dir).select(
                    "subj", "pred", "obj"
                ),
                {
                    "mentions_op": "op_mentioned_in",
                    "mentions_engine": "engine_mentioned_in",
                },
            ).agg(F.sum(F.col("inferred").cast("int")), F.count("subj"))
        ),
        # N-Triples serialize -> parse round trip over the evidence
        # KG (the RDF materialize/ingest pair; two pure projections).
        # Aggregating sink: the parse columns preserve cardinality
        "kg_ntriples_roundtrip": lambda: run(
            kg.parse_ntriples(
                _q_kg_ntriples(spark, sf_dir).select("line")
            ).agg(
                F.count("subj"),
                F.sum(F.length("obj")),
                F.sum((F.col("obj_kind") == "iri").cast("int")),
            )
        ),
        # TruthFinder source-reliability resolution: 4 unrolled
        # noisy-OR/trust rounds over the lineitem claims table
        "truth_discovery": lambda: run(
            kg.truth_discovery(_truth_claims(spark, sf_dir), iters=4)
        ),
        # one-to-one KG entity alignment (inverted-index candidates
        # on shared attributes + mutual-nearest windows)
        "kg_align": lambda: run(kg.kg_align(*_align_kgs(spark, sf_dir))),
        # TransE trainer: 2 unrolled full-batch epochs over the
        # part-catalog triples (trainable op #4)
        "transe_train": lambda: run(_transe(spark, sf_dir, "train")),
        # filtered link-prediction eval of the trained model: true
        # tail vs 20 sampled candidates, per-triple rank/RR/Hits@k
        "transe_rank_eval": lambda: run(
            _transe(spark, sf_dir, "rank_eval")
        ),
        # DistMult trainer: 2 unrolled full-batch bilinear epochs on
        # the same triples (trainable op #5 — the symmetric-relation
        # complement of TransE)
        "distmult_train": lambda: run(_transe(spark, sf_dir, "dm_train")),
        # ComplEx trainer: 2 unrolled full-batch Hermitian-product
        # epochs, two-channel state (trainable op #6 — completes the
        # KGE family; 2x DistMult's shuffle bytes at the same stage
        # count and row count)
        "complex_train": lambda: run(_transe(spark, sf_dir, "cx_train")),
        # RotatE trainer: 2 unrolled full-batch rotation epochs,
        # two-channel state + per-dimension unit-modulus relation
        # projection (trainable op #8 — same stage count as ComplEx,
        # the projection adds a per-row map only)
        "rotate_train": lambda: run(_transe(spark, sf_dir, "rt_train")),
        # Mintz distant supervision: gazetteer co-mention pairs
        # labeled by the seed KG (positive face; same fixture as the
        # registry query)
        "distant_supervision": lambda: run(
            _entry_queries()["distant_supervision"](spark, sf_dir)
        ),
        # the full relation-extraction bootstrap: mention pass ->
        # distant labels -> 3 GD rounds -> score the complement ->
        # per-pair proposal queue (trainable op #7 end-to-end)
        "relation_proposals": lambda: run(
            _entry_queries()["relation_proposals"](spark, sf_dir)
        ),
        # mergeable histogram-sketch quantiles over document lengths
        "hist_quantiles": lambda: run(
            sketch.histogram_quantiles(
                sketch.histogram_registers(
                    docs, "n_chars", n_bins=64, lo=0.0, hi=640.0
                ),
                [0.25, 0.5, 0.9, 0.99],
            )
        ),
        "agg_pricing": lambda: run(_q_agg_pricing(spark, sf_dir)),
        "join_revenue": lambda: run(_q_join_revenue(spark, sf_dir)),
        "sessionize": lambda: run(relational.sessionize(events)),
    }

    if only_keep is not None:
        unknown = only_keep - set(queries)
        if unknown:
            raise SystemExit(f"--only: unknown queries {sorted(unknown)}")
        queries = {k: v for k, v in queries.items() if k in only_keep}

    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in queries.items():
        if args.warmup:
            fn()
        t0 = time.perf_counter()
        rows[name] = fn()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    out = {
        "metric": "bench_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cores": args.cores,
        "rows": rows,
        "kg_turns": n_turns,
        "kg_turns_per_sec": (
            round(n_turns / times["kg_extract"], 1)
            if "kg_extract" in times
            else None
        ),
    }
    line = json.dumps(out)
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
