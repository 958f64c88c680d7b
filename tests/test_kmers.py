"""Kmers tests: init, sort, comparison kernels, and string extraction.

Coverage mirrors the reference suite (reference tests/test_kmers.py:119-835):
brute-force string oracles swept over every (seq_list, min_kmer_len,
max_kmer_len) combination, plus comparator-level and error-case tests.
"""

import numpy as np
import pytest

from genome_kmers_tpu import (
    Kmers,
    SequenceCollection,
    compare_sba_kmers_always_less_than,
    compare_sba_kmers_lexicographically,
    get_compare_sba_kmers_func,
)
from oracle import expected_kmers, parameter_combinations

SEQ_LIST_1 = [("chr1", "ATCGAATTAG")]
SEQ_LIST_2 = [("chr1", "ATCGAATTAG"), ("chr2", "GGATCTTGCATT"), ("chr3", "GTGATTGACCCCT")]


def make_kmers(seq_list, min_kmer_len=1, max_kmer_len=None):
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    return Kmers(sc, min_kmer_len=min_kmer_len, max_kmer_len=max_kmer_len)


# --------------------------------------------------------------------------- #
# init
# --------------------------------------------------------------------------- #


class TestInit:
    def test_defaults_single_record(self):
        km = make_kmers(SEQ_LIST_1)
        assert km.min_kmer_len == 1
        assert km.max_kmer_len is None
        assert km.kmer_source_strand == "forward"
        assert km._is_initialized
        assert not km._is_set
        assert not km._is_sorted
        assert np.array_equal(
            km.kmer_sba_start_indices, np.arange(10, dtype=np.uint32)
        )
        assert len(km) == 10

    def test_defaults_multi_record(self):
        km = make_kmers(SEQ_LIST_2)
        exp, _, _, _ = expected_kmers(SEQ_LIST_2, 1, None)
        assert np.array_equal(km.kmer_sba_start_indices, exp)

    @pytest.mark.parametrize(
        "min_kmer_len,max_kmer_len", [(1, None), (2, None), (5, None), (2, 3), (4, 4), (10, None)]
    )
    def test_unsorted_indices_match_oracle(self, min_kmer_len, max_kmer_len):
        for seq_list in (SEQ_LIST_1, SEQ_LIST_2):
            shortest = min(len(s) for _, s in seq_list)
            if min_kmer_len > shortest:
                continue
            km = make_kmers(seq_list, min_kmer_len, max_kmer_len)
            exp, _, _, _ = expected_kmers(seq_list, min_kmer_len, max_kmer_len)
            assert np.array_equal(km.kmer_sba_start_indices, exp)

    def test_min_kmer_len_too_large(self):
        with pytest.raises(ValueError):
            make_kmers(SEQ_LIST_1, min_kmer_len=11)
        # bounded by the SHORTEST record (chr1, len 10)
        with pytest.raises(ValueError):
            make_kmers(SEQ_LIST_2, min_kmer_len=11)

    def test_min_kmer_len_nonpositive(self):
        with pytest.raises(ValueError):
            make_kmers(SEQ_LIST_1, min_kmer_len=0)

    def test_max_lt_min(self):
        with pytest.raises(ValueError):
            make_kmers(SEQ_LIST_1, min_kmer_len=4, max_kmer_len=3)

    def test_max_nonpositive(self):
        with pytest.raises(ValueError):
            make_kmers(SEQ_LIST_1, max_kmer_len=0)

    def test_track_strands_separately_unimplemented(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_1, strands_to_load="forward")
        with pytest.raises(NotImplementedError):
            Kmers(sc, track_strands_separately=True)

    def test_non_forward_source_strand_unimplemented(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_1, strands_to_load="both")
        with pytest.raises(NotImplementedError):
            Kmers(sc, source_strand="both")

    def test_strand_mismatch(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_1, strands_to_load="both")
        with pytest.raises(ValueError):
            Kmers(sc, source_strand="forward")

    def test_double_pass_unimplemented(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_1, strands_to_load="forward")
        with pytest.raises(NotImplementedError):
            Kmers(sc, method="double_pass")

    def test_bad_method(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_1, strands_to_load="forward")
        with pytest.raises(ValueError):
            Kmers(sc, method="triple_pass")


# --------------------------------------------------------------------------- #
# comparison kernels
# --------------------------------------------------------------------------- #


def _sba(s):
    return np.frombuffer(s.encode(), dtype=np.uint8).copy()


class TestKmerComparisons:
    def test_simple_less(self):
        sba = _sba("AC$GT")
        cmp, last = compare_sba_kmers_lexicographically(sba, sba, 0, 3)
        assert cmp == -1 and last == 0

    def test_simple_greater(self):
        sba = _sba("GT$AC")
        cmp, last = compare_sba_kmers_lexicographically(sba, sba, 0, 3)
        assert cmp == 1 and last == 0

    def test_equal_to_separator(self):
        sba = _sba("ACG$ACG")
        cmp, last = compare_sba_kmers_lexicographically(sba, sba, 0, 4)
        assert cmp == 0 and last == 2

    def test_shorter_prefix_is_smaller(self):
        # "G" (hits '$') < "GAATTAG" (reference kmers.py:372-377)
        sba = _sba("G$GAATTAG")
        cmp, last = compare_sba_kmers_lexicographically(sba, sba, 0, 2)
        assert cmp == -1 and last == 0
        cmp, last = compare_sba_kmers_lexicographically(sba, sba, 2, 0)
        assert cmp == 1 and last == 0

    def test_array_end_is_smaller(self):
        sba = _sba("ACGTAC")
        # kmer at 4 = "AC" hits array end; kmer at 0 = "ACGTAC"
        cmp, last = compare_sba_kmers_lexicographically(sba, sba, 4, 0)
        assert cmp == -1 and last == 1

    def test_max_kmer_len_caps_comparison(self):
        sba = _sba("ACGA$ACGT")
        cmp, last = compare_sba_kmers_lexicographically(sba, sba, 0, 5, max_kmer_len=3)
        assert cmp == 0 and last == 2
        cmp, _ = compare_sba_kmers_lexicographically(sba, sba, 0, 5, max_kmer_len=4)
        assert cmp == -1

    def test_no_valid_bases_raises(self):
        sba = _sba("$A")
        with pytest.raises(AssertionError):
            compare_sba_kmers_lexicographically(sba, sba, 0, 0)

    def test_comprehensive_vs_string_compare(self):
        """All pairs x all kmer caps vs Python string comparison (reference
        tests/test_kmers.py:678-755)."""
        for seq_list, min_kmer_len, max_kmer_len in parameter_combinations(
            [SEQ_LIST_1]
        ):
            indices, unsorted, _, _ = expected_kmers(seq_list, min_kmer_len, max_kmer_len)
            sba = _sba("$".join(seq for _, seq in seq_list))
            for a in range(len(indices)):
                for b in range(len(indices)):
                    cmp, _ = compare_sba_kmers_lexicographically(
                        sba, sba, int(indices[a]), int(indices[b]), max_kmer_len=max_kmer_len
                    )
                    ka, kb = unsorted[a], unsorted[b]
                    expected = -1 if ka < kb else (1 if ka > kb else 0)
                    assert cmp == expected, (ka, kb, max_kmer_len)

    def test_always_less_than(self):
        sba = _sba("AAAA")
        cmp, last = compare_sba_kmers_always_less_than(sba, sba, 0, 1)
        assert cmp == -1

    def test_fixed_len_comparator(self):
        sba = _sba("ACGA$ACGT")
        f = get_compare_sba_kmers_func(3)
        cmp, last = f(sba, sba, 0, 5)
        assert cmp == 0 and last == 2

    def test_get_is_less_than_func(self):
        """Comparator closure parity incl. break_ties (reference
        tests/test_kmers.py:821-834)."""
        km = make_kmers(SEQ_LIST_1, 2, None)
        sba_str = "ATCGAATTAG"
        lt = km.get_is_less_than_func(validate_kmers=True, break_ties=False)
        lt_ties = km.get_is_less_than_func(validate_kmers=True, break_ties=True)
        for a in range(9):
            for b in range(9):
                ka, kb = sba_str[a:], sba_str[b:]
                assert lt(a, b) == (ka < kb)
                assert lt_ties(a, b) == (ka < kb or (ka == kb and a < b))

    def test_is_less_than_validates_min_len(self):
        km = make_kmers(SEQ_LIST_1, 3, None)
        lt = km.get_is_less_than_func(validate_kmers=True)
        # index 8 = "AG": only 2 bases < min_kmer_len 3
        with pytest.raises(AssertionError):
            lt(8, 0)


# --------------------------------------------------------------------------- #
# sort
# --------------------------------------------------------------------------- #


class TestSort:
    def test_comprehensive_sorted_strings_match_oracle(self):
        """Flagship parity sweep: sorted k-mer strings equal the Python-sorted
        oracle for every parameter combination (reference
        tests/test_kmers.py:495-501)."""
        for seq_list, min_kmer_len, max_kmer_len in parameter_combinations(
            [SEQ_LIST_1, SEQ_LIST_2]
        ):
            km = make_kmers(seq_list, min_kmer_len, max_kmer_len)
            km.sort()
            assert km._is_sorted
            _, _, sorted_kmers, sorted_indices = expected_kmers(
                seq_list, min_kmer_len, max_kmer_len
            )
            got = [km.get_kmer_str(i) for i in range(len(km))]
            assert got == sorted_kmers, (min_kmer_len, max_kmer_len)
            # stronger than the reference default: stable (position tie-break)
            # index order == oracle's stable sort
            assert list(km.kmer_sba_start_indices) == sorted_indices

    def test_sort_golden_3mers(self):
        """The canonical golden fixture (reference docs/overview.rst:46-74)."""
        km = make_kmers(SEQ_LIST_2, 3, 3)
        km.sort()
        got = [km.get_kmer_str(i, 3) for i in range(len(km))]
        exp = sorted(
            seq[i : i + 3]
            for _, seq in SEQ_LIST_2
            for i in range(len(seq) - 2)
        )
        assert got == exp

    def test_sort_idempotent(self):
        km = make_kmers(SEQ_LIST_2, 3, 3)
        km.sort()
        first = km.kmer_sba_start_indices.copy()
        km.sort()
        assert np.array_equal(km.kmer_sba_start_indices, first)

    def test_sort_single_base_alphabet(self):
        km = make_kmers([("chr1", "AAAAAAAA")], 2, 4)
        km.sort()
        got = [km.get_kmer_str(i) for i in range(len(km))]
        _, _, exp, _ = expected_kmers([("chr1", "AAAAAAAA")], 2, 4)
        assert got == exp

    def test_sort_iupac_bases_ascii_order(self):
        # ambiguous bases sort by ASCII byte value (SURVEY.md gotcha 9)
        seq_list = [("chr1", "ANGTNCARYN")]
        km = make_kmers(seq_list, 2, 2)
        km.sort()
        got = [km.get_kmer_str(i) for i in range(len(km))]
        _, _, exp, _ = expected_kmers(seq_list, 2, 2)
        assert got == exp

    def test_sort_long_kmers_multiround(self):
        """max_kmer_len > 32 exercises the iterative refinement path."""
        rng = np.random.default_rng(42)
        seq = "".join(rng.choice(list("ACGT"), size=200))
        # embed long repeats so ties span the first 32-base window
        seq = seq[:50] + seq[:50] + seq[100:]
        seq_list = [("chr1", seq)]
        km = make_kmers(seq_list, 40, 48)
        km.sort()
        got = [km.get_kmer_str(i) for i in range(len(km))]
        _, _, exp, _ = expected_kmers(seq_list, 40, 48)
        assert got == exp

    def test_sort_unbounded_long_repeats(self):
        """max_kmer_len=None with repeats longer than one 32-base window."""
        base = "ACGTACGTAAACCCGGGTTTACGTACGTACGT"  # 32 bases
        seq = base * 3 + "AAAA"
        seq_list = [("chr1", seq)]
        km = make_kmers(seq_list, 1, None)
        km.sort()
        got = [km.get_kmer_str(i) for i in range(len(km))]
        _, _, exp, _ = expected_kmers(seq_list, 1, None)
        assert got == exp


# --------------------------------------------------------------------------- #
# string extraction
# --------------------------------------------------------------------------- #


class TestGetKmerStr:
    def test_basic(self):
        km = make_kmers(SEQ_LIST_2, 3, 3)
        # unsorted: kmer_num follows input order
        assert km.get_kmer_str(0, 3) == "ATC"
        assert km.get_kmer_str(0) == "ATC"  # capped by max_kmer_len

    def test_len_defaults_to_segment_end_when_uncapped(self):
        km = make_kmers(SEQ_LIST_1, 1, None)
        assert km.get_kmer_str(5) == "ATTAG"

    def test_out_of_bounds(self):
        km = make_kmers(SEQ_LIST_1, 3, 3)
        with pytest.raises(ValueError):
            km.get_kmer_str(-1)
        with pytest.raises(ValueError):
            km.get_kmer_str(len(km))

    def test_kmer_len_out_of_range(self):
        km = make_kmers(SEQ_LIST_1, 3, 4)
        with pytest.raises(ValueError):
            km.get_kmer_str(0, 2)  # < min_kmer_len
        with pytest.raises(ValueError):
            km.get_kmer_str(0, 5)  # > max_kmer_len

    def test_extends_beyond_segment(self):
        km = make_kmers(SEQ_LIST_1, 3, None)
        # kmer at start index 7 has only 3 bases ("TAG")
        with pytest.raises(ValueError):
            km.get_kmer_str(7, 5)

    def test_no_checks_fast_path(self):
        km = make_kmers(SEQ_LIST_1, 3, 3)
        assert km.get_kmer_str_no_checks(0, "+", 3) == "ATC"
        with pytest.raises(NotImplementedError):
            km.get_kmer_str_no_checks(0, "-", 3)
        with pytest.raises(ValueError):
            km.get_kmer_str_no_checks(0, "x", 3)


# --------------------------------------------------------------------------- #
# equality
# --------------------------------------------------------------------------- #


class TestComparison:
    def test_equal(self):
        a = make_kmers(SEQ_LIST_2, 2, 5)
        b = make_kmers(SEQ_LIST_2, 2, 5)
        assert a == b

    def test_sorted_ne_unsorted(self):
        a = make_kmers(SEQ_LIST_2, 2, 5)
        b = make_kmers(SEQ_LIST_2, 2, 5)
        b.sort()
        assert a != b

    def test_sorted_equal(self):
        a = make_kmers(SEQ_LIST_2, 2, 5)
        b = make_kmers(SEQ_LIST_2, 2, 5)
        a.sort()
        b.sort()
        assert a == b

    def test_different_params(self):
        assert make_kmers(SEQ_LIST_2, 2, 5) != make_kmers(SEQ_LIST_2, 2, 6)
        assert make_kmers(SEQ_LIST_2, 2, 5) != make_kmers(SEQ_LIST_2, 3, 5)
        assert make_kmers(SEQ_LIST_2, 2, None) != make_kmers(SEQ_LIST_2, 2, 5)

    def test_different_seq_coll(self):
        assert make_kmers(SEQ_LIST_1) != make_kmers(SEQ_LIST_2)


# --------------------------------------------------------------------------- #
# save / load (reference tests/test_kmers.py:2551-2727)
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("fmt", ["hdf5", "shelve"])
@pytest.mark.parametrize("embed", [True, False])
@pytest.mark.parametrize("seq_list", [SEQ_LIST_1, SEQ_LIST_2])
class TestSaveLoad:
    def test_round_trip(self, tmp_path, fmt, embed, seq_list):
        km = make_kmers(seq_list, 2, 5)
        km.sort()
        path = str(tmp_path / ("km.h5" if fmt == "hdf5" else "km.shelve"))
        km.save(path, include_sequence_collection=embed, format=fmt)
        km2 = Kmers()
        if embed:
            km2.load(path, format=fmt)
        else:
            km2.load(path, seq_coll=km.seq_coll, format=fmt)
        assert km2 == km
        assert km2._is_sorted


def test_save_load_unsorted_round_trip(tmp_path):
    km = make_kmers(SEQ_LIST_2, 1, None)
    path = str(tmp_path / "km.h5")
    km.save(path, include_sequence_collection=True, format="hdf5")
    km2 = Kmers()
    km2.load(path)
    assert km2 == km
    assert km2.max_kmer_len is None
    assert not km2._is_sorted


def test_save_bad_format(tmp_path):
    km = make_kmers(SEQ_LIST_1)
    with pytest.raises(ValueError):
        km.save(str(tmp_path / "x"), format="json")
    with pytest.raises(ValueError):
        km.load(str(tmp_path / "x"), format="json")


def test_loaded_kmers_queries_work(tmp_path):
    """A reloaded Kmers supports the full query surface (reference workflow:
    sort once, save, reload for downstream queries, docs/overview.rst:99-112)."""
    km = make_kmers(SEQ_LIST_2, 3, 3)
    km.sort()
    path = str(tmp_path / "km.h5")
    km.save(path, include_sequence_collection=True)
    km2 = Kmers()
    km2.load(path)
    assert km2.get_kmer_count(3) == km.get_kmer_count(3)
    assert [km2.get_kmer_str(i, 3) for i in range(len(km2))] == [
        km.get_kmer_str(i, 3) for i in range(len(km))
    ]
