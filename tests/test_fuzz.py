"""Differential fuzzing: random genomes/parameters through every sort path,
pinned to the pure-Python string oracle and to each other.

One failure here means two independent implementations disagree — the
strongest cheap correctness signal the suite has (the reference has no
analog; its tests are fixed fixtures only)."""

import numpy as np
import pytest

import jax.numpy as jnp

from genome_kmers_tpu import Kmers, SequenceCollection
from genome_kmers_tpu.ops.keys import cap_lengths, compute_valid_len
from genome_kmers_tpu.ops.sort import sort_positions
from genome_kmers_tpu.parallel import make_mesh, sample_sort_positions
from oracle import expected_kmers

ALPHABETS = ["ACGT", "ACGTN", "ACGTRYSWKMBDHVN"]


def random_case(seed):
    rng = np.random.default_rng(seed)
    alphabet = ALPHABETS[seed % len(ALPHABETS)]
    n_records = int(rng.integers(1, 5))
    seq_list = []
    for r in range(n_records):
        n = int(rng.integers(8, 200))
        seq_list.append((f"r{r}", "".join(rng.choice(list(alphabet), size=n))))
    shortest = min(len(s) for _, s in seq_list)
    min_k = int(rng.integers(1, shortest + 1))
    choice = seed % 3
    if choice == 0:
        max_k = None
    elif choice == 1:
        max_k = min_k
    else:
        max_k = int(rng.integers(min_k, max(shortest, min_k) + 1))
    return seq_list, min_k, max_k


@pytest.mark.parametrize("seed", range(24))
def test_engine_matches_oracle(seed):
    seq_list, min_k, max_k = random_case(seed)
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=min_k, max_kmer_len=max_k)
    km.sort()
    _, _, sorted_kmers, sorted_indices = expected_kmers(seq_list, min_k, max_k)
    got = [km.get_kmer_str(i) for i in range(len(km))]
    assert got == sorted_kmers, (seed, min_k, max_k)
    assert list(km.kmer_sba_start_indices) == sorted_indices, (seed, min_k, max_k)
    # count parity at a couple of query lengths
    for L in {1, min_k}:
        assert km.get_kmer_count(L) == len(km)


@pytest.mark.parametrize("seed", range(0, 24, 3))
def test_distributed_matches_single(seed):
    seq_list, min_k, max_k = random_case(seed)
    two_bit = all(set(s) <= set("ACGT") for _, s in seq_list)
    limit = 64 if two_bit else 32
    max_k = min(max_k if max_k is not None else limit, limit)
    min_k = min(min_k, max_k)
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=min_k, max_kmer_len=max_k)
    dc = sc.device_cache("forward")
    positions = jnp.asarray(km.kmer_sba_start_indices)
    cap = cap_lengths(compute_valid_len(positions, dc.seg_starts, dc.seg_ends), max_k)
    truth = np.asarray(
        sort_positions(dc.packed, positions, cap, max_k, packed2=dc.packed2)
    )
    mesh = make_mesh(8)
    got = np.asarray(
        sample_sort_positions(
            dc.packed, positions, dc.seg_starts, dc.seg_ends, max_k, mesh,
            packed2=dc.packed2,
        )
    )
    assert np.array_equal(got, truth), (seed, min_k, max_k)
