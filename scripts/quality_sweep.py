"""Threshold sweep + baselines over CACHED trained vectors.

Loads a trained-vector npz (produced by quality_run.py --vec-cache),
builds the evaluation frames once, then scores EVERY (context_threshold,
word_threshold) grid point in ONE batched Spark job (the
grid_search_batched shape generalized to a 2-D grid): per-config
detection branches union under a run index, per-doc normalization +
corpus mean aggregate in-plan, one collect for all scores and one for
all mention counts.

Also reports the Perfect / Random / Empty / Human baselines
(oneshot_test.py:267-323) through the same scorer so every sweep comes
with its upper/lower bounds.

Usage: python scripts/quality_sweep.py --vec-cache V.npz
         [--cts 0.9,0.99,0.999] [--wts 0.6,0.8,0.9] [--trigrams]
         [--json-out PATH] [--cores 32]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quality_common import EXAMPLE, REF, eval_stems, gold_rows as _gold_rows, human_gold_rows, read_ref


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vec-cache", required=True)
    ap.add_argument(
        "--gram-cache",
        default=None,
        help="npz of a phrased-corpus model used as the GRAM model "
        "(two-model flagship setting; contexts use --vec-cache)",
    )
    ap.add_argument("--cts", default="0.9,0.95,0.99,0.995,0.999")
    ap.add_argument("--wts", default="0.6,0.8,0.9")
    ap.add_argument(
        "--css",
        default="100",
        help="context_size grid (reference main.py:56-61 sweeps 10..190); "
        "the flagship value is 100",
    )
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--trigrams", action="store_true",
                    help="use the stacked (trigram) phrase table")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import numpy as np

    from pyspark.sql import functions as F

    from coies_spark.core import textproc
    from coies_spark.core.embed import (
        MappedEmbedding,
        PhraseTable,
        StackedPhraseTable,
    )
    from coies_spark.core.oneshot import ExtractionConfig, build_example_artifacts
    from coies_spark.pipeline.evaluate import (
        perfect_mentions,
        random_mentions,
        score_extractions,
    )
    from coies_spark.pipeline.extract import extract_mentions
    from coies_spark.session import get_spark

    t0 = time.time()
    spark = get_spark("quality-sweep", cores=args.cores)

    z = np.load(args.vec_cache, allow_pickle=False)
    vecs, tokens = z["vecs"].astype(np.float32), z["tokens"]
    mapping = {t: vecs[i] for i, t in enumerate(tokens)}
    print(f"loaded {len(mapping)} vectors from {args.vec_cache}")

    corpus_files = sorted(os.listdir(f"{REF}/aaer"))
    sentences = []
    for fn in corpus_files:
        sentences.extend(textproc.sentence_tokens(read_ref(f"{REF}/aaer/{fn}")))
    base_cfg = ExtractionConfig(dim=args.dim)
    if args.trigrams:
        phrases = StackedPhraseTable.train(
            sentences,
            passes=2,
            min_count=base_cfg.phrase_min_count,
            threshold=base_cfg.phrase_threshold,
        )
    else:
        phrases = PhraseTable.train(
            sentences,
            min_count=base_cfg.phrase_min_count,
            threshold=base_cfg.phrase_threshold,
        )
    emb = MappedEmbedding(mapping, args.dim)
    gram_emb = None
    if args.gram_cache:
        gz = np.load(args.gram_cache, allow_pickle=False)
        gvecs, gtoks = gz["vecs"].astype(np.float32), gz["tokens"]
        gram_emb = MappedEmbedding(
            {t: gvecs[i] for i, t in enumerate(gtoks)}, args.dim
        )
        print(f"gram model: {len(gtoks)} vectors from {args.gram_cache}")

    stems = eval_stems()
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    raw_rows, tagged_rows = [], []
    for stem in stems:
        raw_rows.append((stem, 0, "doc", read_ref(f"{REF}/aaer/{stem}.txt"), None, None))
        tagged_rows.append((stem, 0, "doc", read_ref(f"{REF}/test/{stem}.txt"), None, None))
    gold_rows = _gold_rows(stems)
    raw = spark.createDataFrame(raw_rows, schema).repartition(len(stems)).cache()
    tagged = spark.createDataFrame(tagged_rows, schema).cache()
    gold = spark.createDataFrame(
        gold_rows, "conv_id string, pred string, obj string"
    ).cache()
    convs = raw.select("conv_id").distinct().cache()

    cts = [float(x) for x in args.cts.split(",")]
    wts = [float(x) for x in args.wts.split(",")]
    css = [int(x) for x in args.css.split(",")]
    runs, score_frames, mention_frames = [], [], []
    for ct, wt, cs in itertools.product(cts, wts, css):
        cfg = ExtractionConfig(
            dim=args.dim, context_threshold=ct, word_threshold=wt,
            context_size=cs,
        )
        art = build_example_artifacts(
            read_ref(EXAMPLE), [], cfg, phrases=phrases, emb=emb,
            gram_emb=gram_emb,
        )
        mentions = extract_mentions(raw, art, tagged_transcripts=tagged)
        rid = len(runs)
        mention_frames.append(
            mentions.groupBy().count().select(
                F.lit(rid).alias("__run"), F.col("count").alias("n")
            )
        )
        score_frames.append(
            score_extractions(mentions, gold, art, convs).withColumn(
                "__run", F.lit(rid)
            )
        )
        runs.append({"ct": ct, "wt": wt, "cs": cs})

    from functools import reduce

    from pyspark.sql import DataFrame

    union = reduce(DataFrame.unionByName, score_frames)
    per_doc = union.groupBy("__run", "conv_id").agg(
        F.avg("rouge").alias("doc_score")
    )
    got = (
        per_doc.groupBy("__run").agg(F.avg("doc_score").alias("s")).collect()
    )
    for r in got:
        runs[r["__run"]]["score"] = round(float(r["s"]), 4)
    for r in reduce(DataFrame.unionByName, mention_frames).collect():
        runs[r["__run"]]["n_mentions"] = int(r["n"])

    # ---- baselines (one artifacts build at the flagship config) ---------
    art0 = build_example_artifacts(
        read_ref(EXAMPLE), [], base_cfg, phrases=phrases, emb=emb,
        gram_emb=gram_emb,
    )

    def cscore(mentions_df):
        s = score_extractions(mentions_df, gold, art0, convs)
        pd_ = s.groupBy("conv_id").agg(F.avg("rouge").alias("d"))
        return round(float(pd_.agg(F.avg("d")).collect()[0][0]), 4)

    empty = spark.createDataFrame(
        [], "conv_id string, seed string, pred string, obj string"
    )
    baselines = {
        "perfect": cscore(perfect_mentions(gold, art0)),
        "random": cscore(random_mentions(raw, art0)),
        "empty": cscore(empty),
    }
    human_rows = human_gold_rows(stems)
    if human_rows:
        human_gold = spark.createDataFrame(
            human_rows, "conv_id string, pred string, obj string"
        )
        baselines["human"] = cscore(perfect_mentions(human_gold, art0))

    out = {
        "metric": "rouge1_f_corpus_sweep",
        "vec_cache": args.vec_cache,
        "gram_cache": args.gram_cache,
        "trigrams": bool(args.trigrams),
        "grid": runs,
        "baselines": baselines,
        "best": max(runs, key=lambda r: r.get("score", 0.0)),
        "wall_sec": round(time.time() - t0, 1),
    }
    line = json.dumps(out)
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
