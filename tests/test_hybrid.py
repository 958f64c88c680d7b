"""Hybrid sparse-ambiguity sort tests (ops/hybrid.py): clean windows on the
2-bit path + ambiguous windows on the 4-bit path + exact interleave, vs the
pure 4-bit truth and the string oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from genome_kmers_tpu import Kmers, SequenceCollection
from genome_kmers_tpu.ops.hybrid import hybrid_sort_positions
from genome_kmers_tpu.ops.keys import cap_lengths, compute_valid_len
from genome_kmers_tpu.ops.sort import sort_positions
from oracle import expected_kmers


def sparse_n_genome(n, seed, n_runs=3, run_len=5):
    """Random ACGT genome with a few N runs (real-chromosome shape)."""
    rng = np.random.default_rng(seed)
    s = list("".join(rng.choice(list("ACGT"), size=n)))
    for r in range(n_runs):
        start = int(rng.integers(0, n - run_len))
        s[start : start + run_len] = "N" * run_len
    return "".join(s)


def truth_and_hybrid(seq_list, min_k, max_k, uniform=False):
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=min_k, max_kmer_len=max_k)
    dc = sc.device_cache("forward")
    positions = jnp.asarray(km.kmer_sba_start_indices)
    cap = cap_lengths(compute_valid_len(positions, dc.seg_starts, dc.seg_ends), max_k)
    truth = np.asarray(sort_positions(dc.packed, positions, cap, max_k))
    got = np.asarray(
        hybrid_sort_positions(
            dc.packed, dc.packed2_any, positions, dc.seg_starts, dc.seg_ends,
            max_k, dc.next_amb, uniform_cap=uniform,
        )
    )
    return truth, got, km


class TestHybridSort:
    @pytest.mark.parametrize("k", [4, 8, 31, 33, 55])
    def test_matches_4bit_truth(self, k):
        seq_list = [("chr1", sparse_n_genome(600, seed=k))]
        truth, got, _ = truth_and_hybrid(seq_list, min(k, 64), k, uniform=True)
        assert np.array_equal(got, truth), k

    def test_multi_record_short_caps(self):
        # records shorter than k force truncated windows in both streams
        seq_list = [
            ("a", sparse_n_genome(300, 1)),
            ("b", "ACGT"),
            ("c", "ACNTA"),
            ("d", sparse_n_genome(90, 2)),
        ]
        truth, got, _ = truth_and_hybrid(seq_list, 2, 8)
        assert np.array_equal(got, truth)

    def test_n_at_edges(self):
        seq_list = [("chr1", "N" * 4 + sparse_n_genome(200, 5, n_runs=1) + "N" * 4)]
        truth, got, _ = truth_and_hybrid(seq_list, 3, 6)
        assert np.array_equal(got, truth)

    def test_all_ambiguous_falls_back(self):
        seq_list = [("chr1", "N" * 50)]
        truth, got, _ = truth_and_hybrid(seq_list, 2, 4)
        assert np.array_equal(got, truth)

    def test_kmers_sort_n_genome_matches_oracle(self):
        seq_list = [("chr1", sparse_n_genome(400, 9))]
        sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=5, max_kmer_len=5)
        km.sort()
        _, _, sorted_kmers, sorted_indices = expected_kmers(seq_list, 5, 5)
        got = [km.get_kmer_str(i, 5) for i in range(len(km))]
        assert got == sorted_kmers
        assert list(km.kmer_sba_start_indices) == sorted_indices
        # downstream stats on the hybrid-sorted index
        hist, total = km.get_kmer_group_counts(5, max_counts_bin=10)
        assert total == len(km)

    @pytest.mark.parametrize("seed", range(6))
    def test_fuzz_sparse_n(self, seed):
        rng = np.random.default_rng(seed + 100)
        seq_list = [
            ("r%d" % i, sparse_n_genome(int(rng.integers(50, 250)), seed * 10 + i,
                                        n_runs=int(rng.integers(0, 3)), run_len=3))
            for i in range(int(rng.integers(1, 4)))
        ]
        shortest = min(len(s) for _, s in seq_list)
        min_k = int(rng.integers(1, min(shortest, 20) + 1))
        max_k = int(rng.integers(min_k, 64))
        truth, got, _ = truth_and_hybrid(seq_list, min_k, max_k)
        assert np.array_equal(got, truth), (seed, min_k, max_k)
