"""Distributed gather-free fresh sort (parallel.sample_sort_positions_dense_ragged).

Pins the mesh dense path to exact parity with the gather-based ragged sample
sort over the canonical start set, with the single-chip engine, and with the
composed Kmers mesh pipeline (dense sort -> on-device stats reuse).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genome_kmers_tpu import Kmers, SequenceCollection
from genome_kmers_tpu.parallel import (
    make_mesh,
    sample_sort_positions_dense_ragged,
    sample_sort_positions_ragged,
)


def random_seq(n, seed, alphabet="ACGT"):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list(alphabet), size=n))


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


@pytest.fixture(scope="module")
def mesh3():
    return make_mesh(3)


def setup(seq_list, min_k, max_k):
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=min_k, max_kmer_len=max_k)
    dc = sc.device_cache("forward")
    positions = jnp.asarray(km.kmer_sba_start_indices)
    return km, dc, positions


def compact(pos, pad):
    pos = np.asarray(pos)
    pad = np.asarray(pad)
    return pos[pad == 0]


def dense_vs_gather(mesh, seq_list, min_k, max_k, two_bit):
    km, dc, positions = setup(seq_list, min_k, max_k)
    packed = dc.packed2 if two_bit else dc.packed
    uniform = min_k == max_k
    d_pos, d_pad, d_lanes = sample_sort_positions_dense_ragged(
        packed, dc.seg_starts, dc.seg_ends, int(positions.shape[0]),
        min_k, max_k, mesh, two_bit=two_bit, uniform_cap=uniform,
        return_lanes=True,
    )
    g_pos, g_pad, g_lanes = sample_sort_positions_ragged(
        None if two_bit else dc.packed, positions, dc.seg_starts, dc.seg_ends,
        max_k, mesh, packed2=dc.packed2 if two_bit else None,
        uniform_cap=uniform, return_lanes=True,
    )
    assert np.array_equal(compact(d_pos, d_pad), compact(g_pos, g_pad))
    # sorted word-lane content at valid rows is layout-independent
    d_keep = np.asarray(d_pad) == 0
    g_keep = np.asarray(g_pad) == 0
    assert len(d_lanes) == len(g_lanes)
    for dl, gl in zip(d_lanes, g_lanes):
        assert np.array_equal(np.asarray(dl)[d_keep], np.asarray(gl)[g_keep])
    # ragged invariant: every shard's valid rows form a prefix
    n_dev = mesh.devices.size
    pad2d = np.asarray(d_pad).reshape(n_dev, -1)
    for row in pad2d:
        nz = np.nonzero(row)[0]
        assert nz.size == 0 or np.array_equal(nz, np.arange(nz[0], row.size))


class TestDenseRaggedParity:
    @pytest.mark.parametrize("n_bp,k", [(200, 8), (503, 31), (777, 16)])
    def test_two_bit_uniform(self, mesh8, n_bp, k):
        # k=16 covers the k % 16 == 0 case where the cap lane is the
        # invalid-row discriminator
        dense_vs_gather(mesh8, [("c1", random_seq(n_bp, n_bp))], k, k, True)

    def test_two_bit_nonuniform_multirecord(self, mesh8):
        seq_list = [
            ("c1", random_seq(150, 41)),
            ("c2", random_seq(97, 42)),
            ("c3", random_seq(211, 43)),
        ]
        dense_vs_gather(mesh8, seq_list, 5, 12, True)

    def test_four_bit_iupac(self, mesh8):
        seq_list = [("c1", random_seq(400, 51, alphabet="ACGTN"))]
        dense_vs_gather(mesh8, seq_list, 9, 9, False)

    def test_four_bit_nonuniform(self, mesh8):
        seq_list = [("c1", random_seq(333, 52, alphabet="ACGTNRY"))]
        dense_vs_gather(mesh8, seq_list, 4, 13, False)

    def test_repetitive_ties(self, mesh8):
        # heavy duplication: position tie-break must match across paths
        dense_vs_gather(mesh8, [("c1", "ACGT" * 120)], 8, 8, True)

    def test_all_same_base(self, mesh8):
        # all-'T' rows are the all-ones-word adversary for invalid folding
        dense_vs_gather(mesh8, [("c1", "T" * 200)], 16, 16, True)
        dense_vs_gather(mesh8, [("c1", "T" * 200)], 15, 15, True)

    def test_uneven_mesh(self, mesh3):
        dense_vs_gather(mesh3, [("c1", random_seq(250, 61))], 11, 11, True)

    def test_tiny_genome(self, mesh8):
        dense_vs_gather(mesh8, [("c1", "ACGTACGTAC")], 3, 4, True)


class TestKmersMeshDense:
    def test_fresh_sort_takes_dense_path(self, mesh8, monkeypatch):
        import genome_kmers_tpu.parallel as par

        def boom(*a, **k):
            raise AssertionError("fresh mesh sort must take the dense path")

        monkeypatch.setattr(par, "sample_sort_positions_ragged", boom)
        seq_list = [("c1", random_seq(500, 71)), ("c2", random_seq(230, 72))]
        sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
        km_mesh = Kmers(sc, min_kmer_len=8, max_kmer_len=8)
        km_mesh.sort(mesh=mesh8)
        assert km_mesh._dist_cache is not None

        km_chip = Kmers(sc, min_kmer_len=8, max_kmer_len=8)
        km_chip.sort()
        assert np.array_equal(
            km_mesh.kmer_sba_start_indices, km_chip.kmer_sba_start_indices
        )

    @pytest.mark.parametrize("min_k,max_k,alpha", [(9, 9, "ACGT"), (4, 11, "ACGTN")])
    def test_stats_compose_after_dense_sort(self, mesh8, min_k, max_k, alpha):
        seq_list = [("c1", random_seq(650, 81, alphabet=alpha))]
        sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
        km_mesh = Kmers(sc, min_kmer_len=min_k, max_kmer_len=max_k)
        km_chip = Kmers(sc, min_kmer_len=min_k, max_kmer_len=max_k)
        km_mesh.sort(mesh=mesh8)
        km_chip.sort()
        k = min_k
        h_m, t_m = km_mesh.get_kmer_group_counts(k, max_counts_bin=30, mesh=mesh8)
        h_c, t_c = km_chip.get_kmer_group_counts(k, max_counts_bin=30)
        assert t_m == t_c and np.array_equal(h_m, h_c)
        assert km_mesh.get_kmer_count(k, mesh=mesh8) == km_chip.get_kmer_count(k)
