#!/usr/bin/env python
"""The reference's two showcased applications (reference docs/examples.rst:
unique k-mers as a function of k; k-mer group-size distribution), runnable at
any scale.

Usage: python tools/run_applications.py [--app unique_vs_k|group_size_dist]
       [--bp N] [--ks 8,12,16,21,31] [--output-base PATH] [--per-k-sort]

unique_vs_k sorts ONCE at max(ks): the sorted order at k_max refines every
shorter-prefix order, so each smaller k needs only a length-filtered stats
pass over the same index (one sort + len(ks) histogram passes instead of
len(ks) sorts — also one XLA compile per shape instead of per k).
``--per-k-sort`` reproduces the reference's one-index-per-k workflow.

group_size_dist plants repeat families in the random background (log-uniform
copy numbers, per-copy point mutations — an Alu-style synthetic) so the
group-size histogram develops the repeat tail the reference's GRCh38 figure
shows; a uniform-random genome's histogram is a delta at size 1.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def make_repeat_genome(bp, families, max_copies, elem_len, mut_rate, seed):
    """Random ACGT background with planted repeat families.

    Family copy numbers are log-uniform in [2, max_copies]; every copy
    carries independent per-base substitutions at ``mut_rate``, so family
    members share long exact windows but are not identical — the shape that
    produces a heavy group-size tail at k=31 like real repeat content.
    """
    rng = np.random.default_rng(seed)
    ranks = rng.integers(0, 4, bp).astype(np.uint8)
    planted = []
    for _ in range(families):
        copies = int(round(2 * (max_copies / 2) ** rng.random()))
        elem = rng.integers(0, 4, elem_len).astype(np.uint8)
        starts = rng.integers(0, bp - elem_len, copies)
        for s in starts:
            copy = elem.copy()
            m = rng.random(elem_len) < mut_rate
            copy[m] = (copy[m] + rng.integers(1, 4, int(m.sum()))) % 4
            ranks[s : s + elem_len] = copy
        planted.append(copies)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = bases[ranks].tobytes().decode("ascii")
    return seq, planted


def run_group_size_dist(args):
    from genome_kmers_tpu import Kmers, SequenceCollection
    from genome_kmers_tpu.runtime import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    k = int(args.ks.split(",")[0])
    seq, planted = make_repeat_genome(
        args.bp, args.repeat_families, args.repeat_copies_max,
        args.repeat_elem_len, args.mutation_rate, seed=args.bp,
    )
    print(
        f"{args.bp} bp, {len(planted)} repeat families "
        f"(copies: min={min(planted)} max={max(planted)}), k={k}"
    )
    sc = SequenceCollection(sequence_list=[("chr1", seq)], strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=k, max_kmer_len=k)
    t0 = time.perf_counter()
    km.sort()
    hist, total = km.get_kmer_group_counts(k, max_counts_bin=args.max_counts_bin)
    dt = time.perf_counter() - t0
    hist = np.asarray(hist)
    sizes = np.flatnonzero(hist)
    print(f"sort+stats {dt:.2f}s; total={total} distinct={hist.sum()} "
          f"unique={hist[1] if len(hist) > 1 else 0} max_group={sizes.max()}")
    rows = [(int(s), int(hist[s])) for s in sizes if s > 0]
    for s, c in rows[:5] + rows[-5:]:
        print(f"  size {s}: {c} groups")
    if args.output_base:
        import csv

        with open(f"{args.output_base}-group_size_dist.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["group_size", "num_groups"])
            w.writerows(rows)
        print(f"wrote {args.output_base}-group_size_dist.csv")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--app", choices=["unique_vs_k", "group_size_dist"],
                    default="unique_vs_k")
    ap.add_argument("--bp", type=int, default=4_600_000)
    ap.add_argument("--ks", type=str, default="8,12,16,21,25,31,41,55")
    ap.add_argument("--output-base", type=str, default=None)
    ap.add_argument("--per-k-sort", action="store_true",
                    help="sort a fresh index per k (reference workflow)")
    ap.add_argument("--repeat-families", type=int, default=40)
    ap.add_argument("--repeat-copies-max", type=int, default=5000)
    ap.add_argument("--repeat-elem-len", type=int, default=300)
    ap.add_argument("--mutation-rate", type=float, default=0.02)
    ap.add_argument("--max-counts-bin", type=int, default=100000)
    args = ap.parse_args()
    if args.app == "group_size_dist":
        run_group_size_dist(args)
        return
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
