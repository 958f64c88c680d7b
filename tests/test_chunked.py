"""Two-level chunked sort parity vs the direct sort."""

import numpy as np
import pytest

import jax.numpy as jnp

from genome_kmers_tpu import Kmers, SequenceCollection
from genome_kmers_tpu.ops.chunked import sort_positions_chunked
from genome_kmers_tpu.ops.keys import cap_lengths, compute_valid_len
from genome_kmers_tpu.ops.sort import sort_positions


def setup(seq_list, min_k, max_k):
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=min_k, max_kmer_len=max_k)
    dc = sc.device_cache("forward")
    pos = jnp.asarray(km.kmer_sba_start_indices)

    def cap_fn(p):
        return cap_lengths(compute_valid_len(p, dc.seg_starts, dc.seg_ends), max_k)

    return dc, pos, cap_fn


def random_seq(n, seed, alphabet="ACGT"):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list(alphabet), size=n))


@pytest.mark.parametrize("n_bp,k,chunk", [(5000, 8, 512), (3000, 31, 700), (2048, 16, 2048)])
def test_matches_direct(n_bp, k, chunk):
    dc, pos, cap_fn = setup([("c", random_seq(n_bp, n_bp))], k, k)
    truth = np.asarray(sort_positions(dc.packed, pos, cap_fn(pos), k, packed2=dc.packed2))
    got = np.asarray(sort_positions_chunked(
        dc.packed, pos, cap_fn, k, packed2=dc.packed2, chunk_rows=chunk))
    assert np.array_equal(got, truth)


def test_degenerate_all_equal():
    dc, pos, cap_fn = setup([("c", "A" * 4000)], 4, 4)
    truth = np.asarray(sort_positions(dc.packed, pos, cap_fn(pos), 4, packed2=dc.packed2))
    got = np.asarray(sort_positions_chunked(
        dc.packed, pos, cap_fn, 4, packed2=dc.packed2, chunk_rows=500))
    assert np.array_equal(got, truth)


def test_iupac_4bit_path():
    dc, pos, cap_fn = setup([("c", random_seq(3000, 9, alphabet="ACGTN"))], 2, 12)
    truth = np.asarray(sort_positions(dc.packed, pos, cap_fn(pos), 12))
    got = np.asarray(sort_positions_chunked(
        dc.packed, pos, cap_fn, 12, chunk_rows=800))
    assert np.array_equal(got, truth)


def test_multi_record_short_caps():
    seq_list = [("r%d" % i, random_seq(60 + i, 100 + i)) for i in range(12)]
    dc, pos, cap_fn = setup(seq_list, 2, 16)
    truth = np.asarray(sort_positions(dc.packed, pos, cap_fn(pos), 16, packed2=dc.packed2))
    got = np.asarray(sort_positions_chunked(
        dc.packed, pos, cap_fn, 16, packed2=dc.packed2, chunk_rows=300))
    assert np.array_equal(got, truth)
