"""Profiling-harness smoke tests (tiny sizes, CPU): drivers return well-formed
DataFrames and honor discard_first_run (reference profiling.py surface)."""

import numpy as np
import pytest

pytest.importorskip("pandas")

from genome_kmers_tpu import profiling


def test_random_seq_seeded():
    a = profiling.get_random_seq(50, seed=1)
    b = profiling.get_random_seq(50, seed=1)
    c = profiling.get_random_seq(50, seed=2)
    assert a == b and a != c
    assert set(a) <= set("ACGT")


def test_random_seq_list_lengths():
    sl = profiling.get_random_seq_list(103, 4, seed=3)
    assert [name for name, _ in sl] == ["chr1", "chr2", "chr3", "chr4"]
    assert sum(len(s) for _, s in sl) == 103


def test_write_seq_list_round_trip(tmp_path):
    sl = [("a", "ACGT"), ("b", "GGCC")]
    p = profiling.write_seq_list_to_file(sl, tmp_path / "x.fasta")
    assert p.read_text() == ">a\nACGT\n>b\nGGCC\n"


def test_profile_seq_list_init():
    df = profiling.profile_seq_list_init([500], ["forward"], num_iterations=2)
    assert list(df["seq_len"]) == [500]
    assert (df["avg_run_time"] > 0).all()


def test_profile_fasta_init():
    df = profiling.profile_fasta_init([400], num_chromosomes=2, num_iterations=1)
    assert len(df) == 1 and df["num_chromosomes"][0] == 2


def test_profile_get_segment_num():
    df = profiling.profile_get_segment_num_from_sba_index(
        1000, [1, 3], num_lookups=10, num_iterations=1
    )
    assert list(df["num_chromosomes"]) == [1, 3]
    assert list(df["strand_to_test"]) == ["forward", "forward"]


def test_profile_get_segment_num_revcomp_strand():
    df = profiling.profile_get_segment_num_from_sba_index(
        500, [2], num_lookups=8, num_iterations=1,
        strand_to_load="reverse_complement",
    )
    assert list(df["strand_to_test"]) == ["reverse_complement"]
    assert (df["avg_run_time"] > 0).all()


class TestGetSbaIndicesToTest:
    def _coll(self, strands="both"):
        sl = profiling.get_random_seq_list(60, 3, seed=5)
        from genome_kmers_tpu import SequenceCollection

        return SequenceCollection(sequence_list=sl, strands_to_load=strands)

    def test_covers_every_chromosome(self):
        sc = self._coll()
        idx = profiling.get_sba_indices_to_test(sc, 10, "forward", shuffle=False)
        assert idx.dtype == np.uint32 and len(idx) == 10
        # first entries are the three segment starts, rest linspace fill
        assert list(idx[:3]) == list(sc._forward_sba_seg_starts)
        assert idx.max() < len(sc.forward_sba)

    def test_revcomp_strand_and_truncation(self):
        sc = self._coll()
        idx = profiling.get_sba_indices_to_test(sc, 2, "reverse_complement", shuffle=False)
        assert list(idx) == list(sc._revcomp_sba_seg_starts[:2])

    def test_shuffle_is_seeded(self):
        sc = self._coll()
        a = profiling.get_sba_indices_to_test(sc, 10, "forward", seed=7)
        b = profiling.get_sba_indices_to_test(sc, 10, "forward", seed=7)
        assert np.array_equal(a, b)

    def test_errors(self):
        sc = self._coll()
        with pytest.raises(ValueError, match="num_lookups"):
            profiling.get_sba_indices_to_test(sc, 0, "forward")
        with pytest.raises(ValueError, match="not recognized"):
            profiling.get_sba_indices_to_test(sc, 5, "bogus")


def test_profile_kmers_sort():
    df = profiling.profile_kmers_sort([300], kmer_lens=[8], num_iterations=1)
    assert df["num_kmers"][0] == 293
    assert (df["kmers_per_s"] > 0).all()


def test_profile_large_sort():
    df = profiling.profile_large_sort([300], kmer_lens=[8, None], num_iterations=1)
    assert df["num_kmers"][0] == 293
    assert df["num_kmers"][1] == 300  # suffix mode: min_kmer_len=1
    assert (df["kmers_per_s"] > 0).all()
