#!/usr/bin/env python
"""Measure k=31 device sort throughput across working-set sizes on one chip.

Writes docs/profiling_results/v5e-sort-scaling.csv (num_kmers, kmers_per_s),
the data behind docs/resources/sort_scaling.png and the per-shard sweet-spot
sizing rule in docs/development.md. Uses bench.py's chained-sort timing
(scalar-digest completion; see bench.py's module docstring for why).

    python tools/run_scaling_sweep.py [--sizes 20,22,24,26,27] [--k 31]

Each distinct power-of-two size is its own XLA shape bucket: first run per
size pays a remote compile (minutes) unless .jax_cache already holds it.
"""

import argparse
import csv
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="20,22,24,26,27",
                    help="comma-separated log2 working-set sizes in bp")
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chain", type=int, default=3)
    ap.add_argument("--output", default=os.path.join(
        HERE, "..", "docs", "profiling_results", "v5e-sort-scaling.csv"))
    args = ap.parse_args()

    from genome_kmers_tpu.runtime import enable_persistent_compilation_cache

    enable_persistent_compilation_cache(
        os.path.join(os.path.dirname(HERE), ".jax_cache"))

    import bench

    rows = []
    for log2_bp in (int(s) for s in args.sizes.split(",")):
        n_bp = 2 ** log2_bp
        # chains lose their amortization value at big sizes (one sort already
        # dwarfs the 31 ms transfer) and would double compile time
        chain = args.chain if n_bp <= 2**24 else 1
        tput = bench.measure(n_bp, args.k, args.reps, chain)
        n_kmers = n_bp - args.k + 1
        rows.append({"num_kmers": n_kmers, "kmers_per_s": round(tput, 1)})
        print(f"2^{log2_bp} bp: {tput/1e6:.1f} M kmers/s", flush=True)

    with open(args.output, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["num_kmers", "kmers_per_s"])
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
