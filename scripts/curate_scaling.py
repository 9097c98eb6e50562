"""Scaling evidence for the curation pass: run `curate_corpus` over a
deterministically replicated sf0.1 documents table (5k -> 200k docs,
in-plan replication, remapped doc_ids) at two parallelism levels and
report throughput + raw scaling efficiency.

Usage: python scripts/curate_scaling.py [--cores-lo 8] [--cores-hi 32]
       [--replicate 40] [--sf-dir /root/testdata/sf0.1]

Each level runs in its OWN Spark session (stop + fresh JVM) so the
core count is honored; the input is counted once per session outside
the timed region to warm the scan cache comparably.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_level(cores: int, sf_dir: str, replicate: int) -> dict:
    from pyspark.sql import functions as F

    from coies_spark.ops.curate import curate_corpus
    from coies_spark.session import get_spark

    spark = get_spark(f"curate-scale-{cores}", cores=cores)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .crossJoin(spark.range(replicate).select(F.col("id").alias("r")))
        .withColumn("doc_id", F.col("doc_id") * replicate + F.col("r"))
        .drop("r")
        .repartition(cores * 4)
    )
    n_docs = docs.cache().count()
    # warm-up pass (scan + codegen) outside the timed region
    curate_corpus(docs, fractions={"en": 0.5}).count()
    t0 = time.perf_counter()
    n_out = curate_corpus(docs, fractions={"en": 0.5}).count()
    wall = time.perf_counter() - t0
    docs.unpersist()
    spark.stop()
    return {
        "cores": cores,
        "n_docs": n_docs,
        "n_curated": n_out,
        "wall_s": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores-lo", type=int, default=8)
    ap.add_argument("--cores-hi", type=int, default=32)
    ap.add_argument("--replicate", type=int, default=40)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    lo = run_level(args.cores_lo, args.sf_dir, args.replicate)
    hi = run_level(args.cores_hi, args.sf_dir, args.replicate)
    ratio = args.cores_hi / args.cores_lo
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / ratio
    print(
        json.dumps(
            {
                "metric": "curate_scaling",
                "lo": lo,
                "hi": hi,
                "raw_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
