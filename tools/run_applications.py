#!/usr/bin/env python
"""The reference's two showcased applications (reference docs/examples.rst:
unique k-mers as a function of k; k-mer group-size distribution), runnable at
any scale.

Usage: python tools/run_applications.py [--bp N] [--ks 8,12,16,21,31]
       [--output-base PATH] [--per-k-sort]

Default mode sorts ONCE at max(ks): the sorted order at k_max refines every
shorter-prefix order, so each smaller k needs only a length-filtered stats
pass over the same index (one sort + len(ks) histogram passes instead of
len(ks) sorts — also one XLA compile per shape instead of per k).
``--per-k-sort`` reproduces the reference's one-index-per-k workflow.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bp", type=int, default=4_600_000)
    ap.add_argument("--ks", type=str, default="8,12,16,21,25,31,41,55")
    ap.add_argument("--output-base", type=str, default=None)
    ap.add_argument("--per-k-sort", action="store_true",
                    help="sort a fresh index per k (reference workflow)")
    args = ap.parse_args()
    ks = [int(x) for x in args.ks.split(",")]

    from genome_kmers_tpu import Kmers, SequenceCollection
    from genome_kmers_tpu.ops.filters import LengthFilter
    from genome_kmers_tpu.runtime import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    rng = np.random.default_rng(args.bp)
    seq = "".join(rng.choice(list("ACGT"), size=args.bp))
    sc = SequenceCollection(sequence_list=[("chr1", seq)], strands_to_load="forward")

    rows = []
    if args.per_k_sort:
        for k in ks:
            km = Kmers(sc, min_kmer_len=k, max_kmer_len=k)
            t0 = time.perf_counter()
            km.sort()
            hist, total = km.get_kmer_group_counts(k, max_counts_bin=100)
            dt = time.perf_counter() - t0
            unique = int(hist[1])
            distinct = int(hist.sum())
            rows.append((k, total, distinct, unique, round(unique / total, 6), round(dt, 3)))
            print(
                f"k={k:3d}: total={total} distinct={distinct} unique={unique} "
                f"frac_unique={unique/total:.4f} ({dt:.2f}s)"
            )
    else:
        k_min, k_max = min(ks), max(ks)
        km = Kmers(sc, min_kmer_len=k_min, max_kmer_len=k_max)
        t0 = time.perf_counter()
        km.sort()
        t_sort = time.perf_counter() - t0
        print(f"sorted once at k_max={k_max} ({t_sort:.2f}s)")
        for k in sorted(ks):
            t0 = time.perf_counter()
            # survivors with >= k bases, grouped by k-base identity — equals
            # the per-k index's statistics exactly
            hist, total = km.get_kmer_group_counts(
                k, kmer_filter_func=LengthFilter(k), max_counts_bin=100
            )
            dt = time.perf_counter() - t0
            unique = int(hist[1])
            distinct = int(hist.sum())
            rows.append((k, total, distinct, unique, round(unique / total, 6), round(dt, 3)))
            print(
                f"k={k:3d}: total={total} distinct={distinct} unique={unique} "
                f"frac_unique={unique/total:.4f} ({dt:.2f}s stats)"
            )

    if args.output_base:
        import csv

        with open(f"{args.output_base}-unique_vs_k.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["k", "total_kmers", "distinct", "unique", "frac_unique", "seconds"])
            w.writerows(rows)
        print(f"wrote {args.output_base}-unique_vs_k.csv")


if __name__ == "__main__":
    main()
