"""Scaling evidence for the KGE family (r5 verdict item #5): run
`transe_train` over a deterministically replicated part-catalog
triple set at several corpus sizes and two parallelism levels, and
report per-epoch cost + raw local[8]→local[32] efficiency.

Usage: python scripts/kge_scaling.py [--cores-lo 8] [--cores-hi 32]
       [--replicates 1,2,4] [--sf-dir /root/testdata/sf0.1]
       [--runs 2]

Each (cores, replicate) level runs in its OWN subprocess (fresh JVM,
`--warmup`-style: one untimed run first), so levels cannot share scan
caches, codegen, or Python worker pools.  Replication multiplies the
triple set by suffixing subject ids (rep 0 keeps the original ids),
so entity count and triple count scale together — the regime the
array-state trainer's broadcast/shuffle branch must straddle.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {here!r})
from pyspark.sql import functions as F
from coies_spark.ops.kge import transe_train
from coies_spark.session import get_spark

cores, rep, sf_dir = {cores}, {rep}, {sf_dir!r}
spark = get_spark(f"kge-scale-{{cores}}-{{rep}}", cores=cores)
part = spark.read.parquet(f"{{sf_dir}}/part.parquet")
base = part.select(
    F.concat(F.lit("part:"), F.col("p_partkey")).alias("subj"),
    F.lit("has_brand").alias("pred"),
    F.col("p_brand").alias("obj"),
).unionByName(
    part.select(
        F.col("p_brand").alias("subj"),
        F.lit("has_type").alias("pred"),
        F.col("p_type").alias("obj"),
    ).distinct()
)
t = base.crossJoin(
    spark.range(rep).select(F.col("id").alias("r"))
).select(
    F.when(F.col("r") == 0, F.col("subj"))
    .otherwise(F.concat("subj", F.lit("#"), F.col("r")))
    .alias("subj"),
    "pred",
    "obj",
)
n = t.count()


def one():
    t0 = time.perf_counter()
    rows = transe_train(t, dim=4, iters=2).count()
    return rows, time.perf_counter() - t0


one()  # warm-up: scan cache, codegen, Python workers
samples = [one() for _ in range({runs})]
print(json.dumps({{
    "cores": cores, "replicate": rep, "n_triples": n,
    "rows": samples[0][0],
    "secs": [round(s[1], 3) for s in samples],
    "min_s": round(min(s[1] for s in samples), 3),
}}))
"""


def run_level(cores: int, rep: int, sf_dir: str, runs: int) -> dict:
    code = _CHILD.format(
        here=HERE, cores=cores, rep=rep, sf_dir=sf_dir, runs=runs
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=HERE,
    )
    if proc.returncode != 0:
        raise SystemExit(
            f"level cores={cores} rep={rep} failed:\n{proc.stderr[-800:]}"
        )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores-lo", type=int, default=8)
    ap.add_argument("--cores-hi", type=int, default=32)
    ap.add_argument("--replicates", default="1,2,4")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    reps = [int(r) for r in args.replicates.split(",")]
    out = []
    for rep in reps:
        lo = run_level(args.cores_lo, rep, args.sf_dir, args.runs)
        hi = run_level(args.cores_hi, rep, args.sf_dir, args.runs)
        eff = (
            (lo["min_s"] / hi["min_s"])
            / (args.cores_hi / args.cores_lo)
        )
        row = {
            "replicate": rep,
            "n_triples": hi["n_triples"],
            f"local[{args.cores_lo}]_s": lo["min_s"],
            f"local[{args.cores_hi}]_s": hi["min_s"],
            "speedup": round(lo["min_s"] / hi["min_s"], 3),
            "raw_efficiency": round(eff, 3),
        }
        out.append(row)
        print(json.dumps(row))
    print(json.dumps({"table": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
