#!/usr/bin/env python
"""End-to-end validation at BASELINE.json config scales, through the public
API on real hardware: synthetic genome -> FASTA -> SequenceCollection ->
Kmers -> sort -> group stats -> streaming queries, with timings.

Usage: python tools/run_e2e_validation.py [--scale {ecoli,chr21,custom}]
       [--bp N] [--k K]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from genome_kmers_tpu.runtime import enable_persistent_compilation_cache  # noqa: E402

enable_persistent_compilation_cache()

SCALES = {"ecoli": (4_600_000, 31), "chr21": (46_000_000, 31)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=[*SCALES, "custom"], default="ecoli")
    ap.add_argument("--bp", type=int, default=None)
    ap.add_argument("--k", type=int, default=31)
    args = ap.parse_args()
    if args.scale != "custom":
        n_bp, k = SCALES[args.scale]
    else:
        n_bp, k = args.bp or 10**6, args.k

    from genome_kmers_tpu import Kmers, SequenceCollection

    rng = np.random.default_rng(n_bp)
    seq_arr = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n_bp)
    fasta = tempfile.NamedTemporaryFile(suffix=".fasta", delete=False)
    with open(fasta.name, "wb") as f:
        f.write(b">synthetic\n")
        for i in range(0, n_bp, 1 << 20):
            f.write(bytes(seq_arr[i : i + (1 << 20)]) + b"\n")

    t0 = time.perf_counter()
    sc = SequenceCollection(fasta_file_path=fasta.name)
    t_ingest = time.perf_counter() - t0
    print(f"ingest {n_bp/1e6:.1f}Mbp: {t_ingest:.2f}s ({n_bp/t_ingest/1e6:.0f} Mbp/s)")

    def pipeline():
        km = Kmers(sc, min_kmer_len=k, max_kmer_len=k)
        km.sort()
        hist, total = km.get_kmer_group_counts(k, max_counts_bin=100)
        return km, hist, total

    t0 = time.perf_counter()
    km, hist, total = pipeline()  # cold: includes XLA compiles
    print(f"sort+stats cold (incl. compile): {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    km, hist, total = pipeline()
    t_warm = time.perf_counter() - t0
    print(
        f"sort+stats warm: {t_warm:.2f}s ({len(km)/t_warm/1e6:.1f}M kmers/s end-to-end)"
    )
    print(f"total={total} distinct={int(hist.sum())} unique={int(hist[1])}")

    seq = bytes(seq_arr).decode()
    t0 = time.perf_counter()
    counts = km.count_queries([seq[1000 : 1000 + k], "A" * k])
    print(f"queries: {time.perf_counter()-t0:.2f}s -> {list(map(int, counts))}")
    assert total == n_bp - k + 1
    os.unlink(fasta.name)
    print("E2E OK")


if __name__ == "__main__":
    main()
