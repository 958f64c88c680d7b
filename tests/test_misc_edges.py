"""Remaining small edge-path coverage: device-cache strand errors, empty
objects, unsorted bulk arrays."""

import numpy as np
import pytest

from genome_kmers_tpu import Kmers, SequenceCollection


def test_device_cache_strand_errors():
    sc = SequenceCollection(sequence_list=[("c", "ACGT")], strands_to_load="forward")
    dc = sc.device_cache("forward")
    assert dc is sc.device_cache("forward")  # cached
    with pytest.raises(ValueError):
        sc.device_cache("reverse_complement")  # not loaded
    with pytest.raises(ValueError):
        sc.device_cache("bogus")


def test_device_cache_revcomp_strand():
    sc = SequenceCollection(
        sequence_list=[("c", "ACGT")], strands_to_load="reverse_complement"
    )
    dc = sc.device_cache("reverse_complement")
    assert bytearray(np.asarray(dc.sba)).decode() == "ACGT"  # revcomp of ACGT


def test_empty_kmers_len_raises():
    km = Kmers()
    with pytest.raises(TypeError):
        len(km)


def test_unsorted_bulk_arrays_input_order():
    sc = SequenceCollection(sequence_list=[("c", "ATCGAATTAG")], strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=3, max_kmer_len=3)
    nums, pos, gsy, gst = km.get_kmers_arrays(3)
    assert list(nums) == list(range(len(km)))
    assert np.array_equal(pos, km.kmer_sba_start_indices)
    assert (gst == 1).all() and (gsy == 1).all()


def test_len_from_geometry_without_materialization():
    sc = SequenceCollection(sequence_list=[("c", "ATCGAATTAG")], strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=2)
    assert km._pos_host is None and km._pos_dev is None  # lazy
    assert len(km) == 9  # answered from geometry
    assert km._pos_host is None  # still not materialized


def test_callable_filter_slow_path_warns(monkeypatch):
    """An arbitrary-callable filter over a big index warns (host Python walk)
    and points at VectorizedFilter; small indexes stay silent."""
    import warnings

    import genome_kmers_tpu.kmers as kmers_mod

    sc = SequenceCollection(sequence_list=[("c", "ATCGAATTAG")], strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=3, max_kmer_len=3)
    km.sort()

    def keep_all(sba, sba_strand, idx):
        return True

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # a warning would raise
        n_quiet = km.get_kmer_count(3, kmer_filter_func=keep_all)

    monkeypatch.setattr(kmers_mod, "_CALLABLE_WARN_THRESHOLD", 1)
    with pytest.warns(RuntimeWarning, match="VectorizedFilter"):
        n_warn = km.get_kmer_count(3, kmer_filter_func=keep_all)
    assert n_quiet == n_warn == len(km)
