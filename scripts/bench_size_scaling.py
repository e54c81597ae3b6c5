"""Corpus-size linearity: docs/s at FIXED parallelism as the input
grows 4x.  The cluster-size pair (bench_scaling.py) shows the job
divides across cores; this shows per-core work does not grow with
corpus size — together they are the 'would still work at 100 TB'
argument: no stage holds corpus-sized state, no per-task cost creeps
with input (the annotate stage is one narrow mapInPandas; the only
aggregate is 2 rows).

Reuses bench_scaling's materialize/measure (fresh spark-submit per
measurement, warmup run before timing).

Usage: python scripts/bench_size_scaling.py [--docs 400000]
           [--factor 4] [--cpus 32] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import importlib.util

_spec = importlib.util.spec_from_file_location(
    "bench_scaling", REPO / "scripts" / "bench_scaling.py")
_bs = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_bs)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400_000)
    ap.add_argument("--factor", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--corpus-parts", type=int, default=256)
    ap.add_argument("--sizes", default=None,
                    help="comma list of doc counts (overrides "
                         "--docs/--factor); the whole curve is "
                         "measured in one session and written as one "
                         "artifact, e.g. 400000,1600000,6400000")
    args = ap.parse_args()

    sizes = ([int(x) for x in args.sizes.split(",")] if args.sizes
             else [args.docs, args.docs * args.factor])
    med = {}
    for n_docs in sizes:
        corpus = f"/tmp/kg_scaling_corpus_v3_{n_docs}_{args.corpus_parts}"
        print(f"materializing corpus ({n_docs:,} docs) ...", flush=True)
        _bs.materialize_corpus(n_docs, corpus,
                               partitions=args.corpus_parts)
        runs = []
        for r in range(args.repeats):
            res = _bs.measure(args.cpus, corpus)
            runs.append(res)
            print(f"{n_docs:,} docs run {r + 1}/{args.repeats}: "
                  f"{res['docs_per_sec']:.0f} docs/s ({res['sec']:.1f}s)",
                  flush=True)
        med[n_docs] = {
            "docs_per_sec": statistics.median(
                x["docs_per_sec"] for x in runs),
            "sec": statistics.median(x["sec"] for x in runs),
        }

    small, big = sizes[0], sizes[-1]
    lin = med[big]["docs_per_sec"] / med[small]["docs_per_sec"]
    summary = {
        "metric": "corpus_size_linearity",
        "cpus": args.cpus, "sizes": sizes, "repeats": args.repeats,
        "median": med,
        "throughput_ratio_big_over_small": round(lin, 3),
        "ratio_vs_smallest": {
            str(n): round(med[n]["docs_per_sec"]
                          / med[small]["docs_per_sec"], 3)
            for n in sizes},
        "note": "1.0 = perfectly linear in corpus size at fixed cores",
    }
    print(json.dumps(summary))
    Path(REPO / "bench_size_linearity.json").write_text(
        json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
