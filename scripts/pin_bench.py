"""Re-pin the bench baselines: fresh-JVM per-query runs, min-of-5,
for the 15 queries shared by every round's bench set — the stable
comparison basis round deltas are judged against (the in-JVM
34-query sequence rides a documented ~1.4x host-noise band; a pinned
min-of-5 with per-query process isolation makes a real regression
visible).

Each sample is `python bench.py --only <q> --warmup` in its OWN
process: fresh JVM, the query runs once untimed (scan cache + Python
worker spin-up — the costs an in-JVM sequence amortizes across
earlier queries), then the timed run.  Writes BENCH_PINNED.json
{query: {min, median, max, samples}}.

Usage: python scripts/pin_bench.py [--runs 5] [--out BENCH_PINNED.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

SHARED_15 = [
    "agg_pricing", "ann_brute_topk", "ann_ivf_kmeans", "ann_ivf_pq",
    "curate_corpus", "embedding_neardup", "jaccard_pairs",
    "join_revenue", "kg_extract", "minhash_lsh", "rouge1_pairs",
    "rougel_pairs", "rwmd_pairs", "sessionize", "simhash",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--out", default="BENCH_PINNED.json")
    ap.add_argument("--queries", default=",".join(SHARED_15))
    args = ap.parse_args()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results: dict[str, dict] = {}
    for q in [s for s in args.queries.split(",") if s]:
        samples: list[float] = []
        for i in range(args.runs):
            with tempfile.NamedTemporaryFile(suffix=".json") as tf:
                proc = subprocess.run(
                    [
                        sys.executable,
                        os.path.join(here, "bench.py"),
                        "--only", q, "--warmup",
                        "--json-out", tf.name,
                    ],
                    cwd=here,
                    capture_output=True,
                    text=True,
                    timeout=900,
                )
                if proc.returncode != 0:
                    print(f"FAIL {q} run {i}: {proc.stderr[-500:]}")
                    return 1
                with open(tf.name) as f:
                    t = json.load(f)["queries"][q]
            samples.append(t)
            print(f"{q} run {i}: {t:.3f}s", flush=True)
        results[q] = {
            "min": min(samples),
            "median": round(statistics.median(samples), 3),
            "max": max(samples),
            "samples": samples,
        }
    with open(os.path.join(here, args.out), "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")
    for q, r in results.items():
        print(f"{q:22s} min={r['min']:8.3f} median={r['median']:8.3f} "
              f"max={r['max']:8.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
