"""Scaling evidence for the relation-extraction bootstrap: run
`relation_proposals` (mention scan -> distant labels -> 3 GD rounds ->
score the complement) over a deterministically replicated synthesized
transcript corpus at two parallelism levels and report throughput +
raw scaling efficiency.

Usage: python scripts/relext_scaling.py [--cores-lo 8] [--cores-hi 32]
       [--replicate 4] [--sf-dir /root/testdata/sf0.1]

Each level runs in its OWN Spark session (stop + fresh JVM) so the
core count is honored; a gazetteer-mentions count warms the scan cache
and codegen outside the timed region (the mention scan dominates the
bootstrap's cost, so the warm-up exercises the hot path).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DICT_ROWS = [
    ("table", "obj:table"), ("hash", "obj:hash"),
    ("table hash", "obj:table-hash"),
    ("merge join", "act:merge-join"), ("scan", "act:scan"),
]
SEED_ROWS = [
    ("act:merge-join", "consumes", "obj:hash"),
    ("act:scan", "reads", "obj:table"),
    ("obj:table-hash", "refines", "obj:table"),
    ("act:merge-join", "follows", "act:scan"),
]


def run_level(cores: int, sf_dir: str, replicate: int) -> dict:
    from pyspark.sql import functions as F

    from coies_spark.ops.kg import gazetteer_mentions
    from coies_spark.ops.relext import relation_proposals
    from coies_spark.ops.transcripts import synthesize_transcripts
    from coies_spark.session import get_spark

    spark = get_spark(f"relext-scale-{cores}", cores=cores)
    turns = (
        synthesize_transcripts(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
        )
        .crossJoin(spark.range(replicate).select(F.col("id").alias("r")))
        .withColumn(
            "conv_id",
            F.concat_ws("-", "conv_id", F.col("r").cast("string")),
        )
        .drop("r")
        .repartition(cores * 4)
    )
    n_turns = turns.cache().count()
    d = spark.createDataFrame(DICT_ROWS, ["surface", "entity"])
    s = spark.createDataFrame(SEED_ROWS, ["subj", "pred", "obj"])
    # warm-up: the mention scan (the bootstrap's dominant stage)
    gazetteer_mentions(turns, d, max_len=2).count()
    t0 = time.perf_counter()
    n_props = relation_proposals(
        turns, d, s, rate=0.25, max_len=2
    ).count()
    wall = time.perf_counter() - t0
    turns.unpersist()
    spark.stop()
    return {
        "cores": cores,
        "n_turns": n_turns,
        "n_proposal_pairs": n_props,
        "wall_s": round(wall, 3),
        "turns_per_sec": round(n_turns / wall, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores-lo", type=int, default=8)
    ap.add_argument("--cores-hi", type=int, default=32)
    ap.add_argument("--replicate", type=int, default=4)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    lo = run_level(args.cores_lo, args.sf_dir, args.replicate)
    hi = run_level(args.cores_hi, args.sf_dir, args.replicate)
    ratio = args.cores_hi / args.cores_lo
    eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / ratio
    print(
        json.dumps(
            {
                "metric": "relext_scaling",
                "lo": lo,
                "hi": hi,
                "raw_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
