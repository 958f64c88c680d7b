#!/usr/bin/env python
"""The reference's two showcased applications (reference docs/examples.rst:
unique k-mers as a function of k; k-mer group-size distribution), runnable at
any scale.

Usage: python tools/run_applications.py [--bp N] [--ks 8,12,16,21,31]
       [--output-base PATH]
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
    args = ap.parse_args()
    ks = [int(x) for x in args.ks.split(",")]

    from genome_kmers_tpu import Kmers, SequenceCollection

    rng = np.random.default_rng(args.bp)
    seq = "".join(rng.choice(list("ACGT"), size=args.bp))
    sc = SequenceCollection(sequence_list=[("chr1", seq)], strands_to_load="forward")

    rows = []
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

    if args.output_base:
        import csv

        with open(f"{args.output_base}-unique_vs_k.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["k", "total_kmers", "distinct", "unique", "frac_unique", "seconds"])
            w.writerows(rows)
        print(f"wrote {args.output_base}-unique_vs_k.csv")


if __name__ == "__main__":
    main()
