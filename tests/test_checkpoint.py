"""Sharded (orbax) checkpoint tests — the TPU-scale persistence path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genome_kmers_tpu import Kmers, SequenceCollection
from genome_kmers_tpu.parallel import make_mesh
from genome_kmers_tpu.parallel.checkpoint import (
    load_kmers_sharded,
    load_sharded_index,
    save_kmers_sharded,
    save_sharded_index,
)

pytest.importorskip("orbax.checkpoint")


def random_seq(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def make_sorted(seq_list, k):
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=k, max_kmer_len=k)
    km.sort()
    return km


def test_raw_round_trip(tmp_path):
    arr = jnp.asarray(np.arange(1000, dtype=np.uint32))
    save_sharded_index(tmp_path / "ck", arr, {"k": 31})
    restored, genome, meta = load_sharded_index(tmp_path / "ck")
    assert genome is None
    assert meta["k"] == 31
    n_real = meta["__n_real__"]
    assert n_real == 1000
    assert np.array_equal(np.asarray(restored)[:n_real], np.asarray(arr))


def test_restore_sharded_onto_mesh(tmp_path):
    mesh = make_mesh(8)
    arr = jnp.asarray(np.arange(1024, dtype=np.uint32))
    save_sharded_index(tmp_path / "ck", arr, {})
    restored, _, meta = load_sharded_index(tmp_path / "ck", mesh=mesh)
    assert np.array_equal(np.asarray(restored)[: meta["__n_real__"]], np.asarray(arr))
    # restored array is sharded over the mesh axis
    shardings = {str(s.device) for s in restored.addressable_shards}
    assert len(shardings) == 8


def test_kmers_round_trip(tmp_path):
    seq_list = [("chr1", random_seq(300, 7)), ("chr2", random_seq(120, 8))]
    km = make_sorted(seq_list, 8)
    save_kmers_sharded(km, tmp_path / "ck", include_genome=True)

    sc2 = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    km2 = Kmers(sc2, min_kmer_len=8, max_kmer_len=8)
    meta = load_kmers_sharded(km2, tmp_path / "ck")
    assert km2._is_sorted
    assert meta["num_kmers"] == len(km)
    assert np.array_equal(km2.kmer_sba_start_indices, km.kmer_sba_start_indices)
    # downstream queries work on the restored index
    assert km2.get_kmer_count(8) == km.get_kmer_count(8)


def test_kmers_restore_onto_mesh(tmp_path):
    mesh = make_mesh(4)
    seq_list = [("chr1", random_seq(500, 9))]
    km = make_sorted(seq_list, 8)
    save_kmers_sharded(km, tmp_path / "ck")
    sc2 = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    km2 = Kmers(sc2, min_kmer_len=8, max_kmer_len=8)
    load_kmers_sharded(km2, tmp_path / "ck", mesh=mesh)
    assert np.array_equal(km2.kmer_sba_start_indices, km.kmer_sba_start_indices)


def test_unsorted_rejected(tmp_path):
    sc = SequenceCollection(sequence_list=[("c", "ACGTACGT")], strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=4, max_kmer_len=4)
    with pytest.raises(ValueError):
        save_kmers_sharded(km, tmp_path / "ck")


def test_param_mismatch_rejected(tmp_path):
    km = make_sorted([("c", random_seq(100, 3))], 8)
    save_kmers_sharded(km, tmp_path / "ck")
    sc2 = SequenceCollection(sequence_list=[("c", random_seq(100, 3))], strands_to_load="forward")
    km2 = Kmers(sc2, min_kmer_len=4, max_kmer_len=4)
    with pytest.raises(ValueError):
        load_kmers_sharded(km2, tmp_path / "ck")
