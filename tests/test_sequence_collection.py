"""SequenceCollection tests: fixtures and coverage mirror the reference suite
(reference tests/test_sequence_collection.py) — hand-computed SBAs, seg
starts, revcomp strings, record-location tables, error cases, equality, and
save/load round-trips. FASTA fixtures are real temp files rather than mocked
``open`` calls.
"""

import numpy as np
import pytest

from genome_kmers_tpu.sequence_collection import (
    SequenceCollection,
    bisect_right,
    get_forward_seq_idx,
    get_sba_start_end_indices_for_segment,
    get_segment_num_from_sba_index,
    reverse_complement_sba,
)


def to_sba(s: str) -> np.ndarray:
    return np.frombuffer(s.encode(), dtype=np.uint8).copy()


SEQ_LIST_1 = [("chr1", "ATCGAATTAG")]
SEQ_1 = "ATCGAATTAG"
REVCOMP_SEQ_1 = "CTAATTCGAT"

SEQ_LIST_2 = [("chr1", "ATCGAATTAG"), ("chr2", "GGATCTTGCATT"), ("chr3", "GTGATTGACCCCT")]
SEQ_2 = "ATCGAATTAG$GGATCTTGCATT$GTGATTGACCCCT"
REVCOMP_SEQ_2 = "AGGGGTCAATCAC$AATGCAAGATCC$CTAATTCGAT"
FWD_STARTS_2 = np.array([0, 11, 24], dtype=np.uint32)
RC_STARTS_2 = np.array([0, 14, 27], dtype=np.uint32)

FASTA_STR_1 = ">chr1\nATCGAATTAG"
FASTA_STR_2 = ">chr1\nATCGAATTAG\n>chr2\nGGATCTTGCATT\n>chr3\nGTGATTGACCCCT"


def write_fasta(tmp_path, text, name="test.fasta"):
    p = tmp_path / name
    p.write_text(text + "\n")
    return p


# --------------------------------------------------------------------------- #
# init errors
# --------------------------------------------------------------------------- #


class TestInitErrors:
    def test_both_inputs(self):
        with pytest.raises(ValueError):
            SequenceCollection(
                fasta_file_path="path.fasta", sequence_list=SEQ_LIST_1, strands_to_load="forward"
            )

    def test_bad_strands(self):
        with pytest.raises(ValueError):
            SequenceCollection(sequence_list=SEQ_LIST_1, strands_to_load="nonsense")

    def test_empty_sequence(self):
        with pytest.raises(ValueError):
            SequenceCollection(
                sequence_list=[("chr1", "ATCG"), ("chr2", "")], strands_to_load="forward"
            )

    def test_illegal_base(self):
        with pytest.raises(ValueError):
            SequenceCollection(sequence_list=[("chr1", "ATCGE")], strands_to_load="forward")

    def test_lowercase_rejected_in_seq_list(self):
        # reference: seq_list input is NOT uppercased (sequence_collection.py:663-699)
        with pytest.raises(ValueError):
            SequenceCollection(sequence_list=[("chr1", "atcg")], strands_to_load="forward")

    def test_repeated_record_name(self):
        with pytest.raises(ValueError):
            SequenceCollection(
                sequence_list=[("chr1", "ATCG"), ("chr1", "GGCC")], strands_to_load="forward"
            )


# --------------------------------------------------------------------------- #
# seq_list init
# --------------------------------------------------------------------------- #


class TestSeqListInit:
    def test_forward_single(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_1, strands_to_load="forward")
        assert np.array_equal(sc.forward_sba, to_sba(SEQ_1))
        assert np.array_equal(sc._forward_sba_seg_starts, np.array([0], dtype=np.uint32))
        assert sc.forward_record_names == ["chr1"]
        assert sc.revcomp_sba is None
        assert sc._revcomp_sba_seg_starts is None
        assert sc.revcomp_record_names is None
        assert sc.strands_loaded() == "forward"
        assert len(sc) == 1

    def test_forward_multi(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        assert np.array_equal(sc.forward_sba, to_sba(SEQ_2))
        assert np.array_equal(sc._forward_sba_seg_starts, FWD_STARTS_2)
        assert sc.forward_record_names == ["chr1", "chr2", "chr3"]
        assert len(sc) == 3

    def test_revcomp_single(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_1, strands_to_load="reverse_complement")
        assert sc.forward_sba is None
        assert np.array_equal(sc.revcomp_sba, to_sba(REVCOMP_SEQ_1))
        assert sc.revcomp_record_names == ["chr1"]
        assert sc.strands_loaded() == "reverse_complement"

    def test_revcomp_multi(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="reverse_complement")
        assert np.array_equal(sc.revcomp_sba, to_sba(REVCOMP_SEQ_2))
        assert np.array_equal(sc._revcomp_sba_seg_starts, RC_STARTS_2)
        assert sc.revcomp_record_names == ["chr3", "chr2", "chr1"]

    def test_both(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="both")
        assert np.array_equal(sc.forward_sba, to_sba(SEQ_2))
        assert np.array_equal(sc.revcomp_sba, to_sba(REVCOMP_SEQ_2))
        assert np.array_equal(sc._forward_sba_seg_starts, FWD_STARTS_2)
        assert np.array_equal(sc._revcomp_sba_seg_starts, RC_STARTS_2)
        assert sc.forward_record_names == ["chr1", "chr2", "chr3"]
        assert sc.revcomp_record_names == ["chr3", "chr2", "chr1"]
        assert sc.strands_loaded() == "both"

    def test_iupac_alphabet_allowed(self):
        sc = SequenceCollection(
            sequence_list=[("chr1", "ACGTRYSWKMBDHVN")], strands_to_load="forward"
        )
        assert np.array_equal(sc.forward_sba, to_sba("ACGTRYSWKMBDHVN"))

    def test_str_forward(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        assert str(sc) == FASTA_STR_2

    def test_str_revcomp_preserves_record_order(self):
        # reference sequence_collection.py:316-336: record order kept even
        # when revcomp is the loaded strand
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="reverse_complement")
        assert str(sc) == ">chr1\nCTAATTCGAT\n>chr2\nAATGCAAGATCC\n>chr3\nAGGGGTCAATCAC"

    def test_sequence_length(self):
        """EXTENSION: implemented for real with the semantics the reference
        docstring declares (reference sequence_collection.py:337-353)."""
        for strands in ("forward", "reverse_complement", "both"):
            sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load=strands)
            for i, (name, seq) in enumerate(SEQ_LIST_2):
                assert sc.sequence_length(record_num=i) == len(seq)
                assert sc.sequence_length(record_name=name) == len(seq)
            assert sc.sequence_length() == sum(len(s) for _, s in SEQ_LIST_2)
        sc = SequenceCollection(sequence_list=SEQ_LIST_1, strands_to_load="forward")
        with pytest.raises(ValueError):
            sc.sequence_length(record_num=0, record_name="chr1")
        with pytest.raises(ValueError):
            sc.sequence_length(record_num=5)
        with pytest.raises(ValueError):
            sc.sequence_length(record_name="nope")


# --------------------------------------------------------------------------- #
# fasta init (real temp files)
# --------------------------------------------------------------------------- #


class TestFastaInit:
    def test_forward_single(self, tmp_path):
        p = write_fasta(tmp_path, FASTA_STR_1)
        sc = SequenceCollection(fasta_file_path=p, strands_to_load="forward")
        assert np.array_equal(sc.forward_sba, to_sba(SEQ_1))
        assert sc.forward_record_names == ["chr1"]

    def test_forward_multi(self, tmp_path):
        p = write_fasta(tmp_path, FASTA_STR_2)
        sc = SequenceCollection(fasta_file_path=p, strands_to_load="forward")
        assert np.array_equal(sc.forward_sba, to_sba(SEQ_2))
        assert np.array_equal(sc._forward_sba_seg_starts, FWD_STARTS_2)
        assert sc.forward_record_names == ["chr1", "chr2", "chr3"]

    def test_both(self, tmp_path):
        p = write_fasta(tmp_path, FASTA_STR_2)
        sc = SequenceCollection(fasta_file_path=p, strands_to_load="both")
        assert np.array_equal(sc.revcomp_sba, to_sba(REVCOMP_SEQ_2))

    def test_revcomp(self, tmp_path):
        p = write_fasta(tmp_path, FASTA_STR_2)
        sc = SequenceCollection(fasta_file_path=p, strands_to_load="reverse_complement")
        assert sc.forward_sba is None
        assert np.array_equal(sc.revcomp_sba, to_sba(REVCOMP_SEQ_2))

    def test_multiline_records(self, tmp_path):
        p = write_fasta(tmp_path, ">chr1\nATCGA\nATTAG\n>chr2\nGGATCTTGCATT")
        sc = SequenceCollection(fasta_file_path=p, strands_to_load="forward")
        assert np.array_equal(sc.forward_sba, to_sba("ATCGAATTAG$GGATCTTGCATT"))

    def test_lowercase_uppercased(self, tmp_path):
        # reference sequence_collection.py:554: FASTA input is uppercased
        p = write_fasta(tmp_path, ">chr1\natcgaattag")
        sc = SequenceCollection(fasta_file_path=p, strands_to_load="forward")
        assert np.array_equal(sc.forward_sba, to_sba("ATCGAATTAG"))

    def test_record_name_up_to_whitespace(self, tmp_path):
        p = write_fasta(tmp_path, ">chr1 description here\nATCG")
        sc = SequenceCollection(fasta_file_path=p, strands_to_load="forward")
        assert sc.forward_record_names == ["chr1"]

    def test_crlf(self, tmp_path):
        p = tmp_path / "crlf.fasta"
        p.write_bytes(b">chr1\r\nATCG\r\nAATT\r\n>chr2\r\nGGCC\r\n")
        sc = SequenceCollection(fasta_file_path=p, strands_to_load="forward")
        assert np.array_equal(sc.forward_sba, to_sba("ATCGAATT$GGCC"))

    def test_no_trailing_newline(self, tmp_path):
        p = tmp_path / "nonl.fasta"
        p.write_bytes(b">chr1\nATCG")
        sc = SequenceCollection(fasta_file_path=p, strands_to_load="forward")
        assert np.array_equal(sc.forward_sba, to_sba("ATCG"))

    def test_empty_sequence_error(self, tmp_path):
        p = write_fasta(tmp_path, ">chr1\nATCG\n>chr2\n>chr3\nGGCC")
        with pytest.raises(ValueError):
            SequenceCollection(fasta_file_path=p, strands_to_load="forward")

    def test_illegal_base_error(self, tmp_path):
        p = write_fasta(tmp_path, ">chr1\nATCGE")
        with pytest.raises(ValueError):
            SequenceCollection(fasta_file_path=p, strands_to_load="forward")

    def test_repeated_name_error(self, tmp_path):
        p = write_fasta(tmp_path, ">chr1\nATCG\n>chr1\nGGCC")
        with pytest.raises(ValueError):
            SequenceCollection(fasta_file_path=p, strands_to_load="forward")

    def test_fasta_path_recorded(self, tmp_path):
        p = write_fasta(tmp_path, FASTA_STR_1)
        sc = SequenceCollection(fasta_file_path=p, strands_to_load="forward")
        assert sc._fasta_file_path == p


# --------------------------------------------------------------------------- #
# low-level sba mapping kernels
# --------------------------------------------------------------------------- #


class TestSbaMapping:
    def test_bisect_right_vs_stdlib(self):
        import bisect as _b

        rng = np.random.default_rng(0)
        for _ in range(20):
            a = np.sort(rng.integers(0, 100, size=rng.integers(1, 20)))
            x = int(rng.integers(-5, 105))
            assert bisect_right(a, x) == _b.bisect_right(list(a), x)

    def test_get_segment_num(self):
        starts = FWD_STARTS_2
        for idx, expected in [(0, 0), (5, 0), (10, 0), (11, 1), (23, 1), (24, 2), (36, 2)]:
            assert get_segment_num_from_sba_index(idx, "forward", starts) == expected

    def test_get_forward_seq_idx_forward(self):
        assert get_forward_seq_idx(13, "forward", 11, 23) == 2
        assert get_forward_seq_idx(13, "forward", 11, 23, one_based=True) == 3

    def test_get_forward_seq_idx_revcomp(self):
        # revcomp index counts from the segment's right edge
        # (reference sequence_collection.py:141-144)
        assert get_forward_seq_idx(13, "reverse_complement", 11, 23) == 10
        assert get_forward_seq_idx(23, "reverse_complement", 11, 23) == 0

    def test_get_forward_seq_idx_errors(self):
        with pytest.raises(ValueError):
            get_forward_seq_idx(10, "forward", 11, 23)
        with pytest.raises(ValueError):
            get_forward_seq_idx(24, "forward", 11, 23)
        with pytest.raises(ValueError):
            get_forward_seq_idx(13, "bad_strand", 11, 23)

    def test_segment_start_end(self):
        len_sba = len(SEQ_2)
        assert get_sba_start_end_indices_for_segment(0, "forward", FWD_STARTS_2, len_sba) == (0, 9)
        assert get_sba_start_end_indices_for_segment(1, "forward", FWD_STARTS_2, len_sba) == (
            11,
            22,
        )
        assert get_sba_start_end_indices_for_segment(2, "forward", FWD_STARTS_2, len_sba) == (
            24,
            36,
        )
        with pytest.raises(ValueError):
            get_sba_start_end_indices_for_segment(3, "forward", FWD_STARTS_2, len_sba)
        with pytest.raises(ValueError):
            get_sba_start_end_indices_for_segment(-1, "forward", FWD_STARTS_2, len_sba)


# --------------------------------------------------------------------------- #
# reverse complement
# --------------------------------------------------------------------------- #


RC_CASES = [
    ("A", "T"),
    ("T", "A"),
    ("G", "C"),
    ("C", "G"),
    ("AGCAGCCGGGT", "ACCCGGCTGCT"),
    ("AGCAGCCGGGT$CTTAGGGAGGTGTGAGCC", "GGCTCACACCTCCCTAAG$ACCCGGCTGCT"),
    ("ACGTRYSWKMBDHVN", "NBDHVKMWSRYACGT"),
]


class TestReverseComplement:
    @pytest.mark.parametrize("seq,expected", RC_CASES)
    def test_reverse_complement_sba(self, seq, expected):
        sc = SequenceCollection()
        arr = to_sba(seq)
        out = reverse_complement_sba(arr, sc._complement_mapping_arr)
        assert bytearray(out).decode() == expected
        # inplace
        reverse_complement_sba(arr, sc._complement_mapping_arr, inplace=True)
        assert bytearray(arr).decode() == expected

    def test_method_forward_to_revcomp(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        sc.reverse_complement()
        assert sc.strands_loaded() == "reverse_complement"
        assert sc.forward_sba is None
        assert np.array_equal(sc.revcomp_sba, to_sba(REVCOMP_SEQ_2))
        assert np.array_equal(sc._revcomp_sba_seg_starts, RC_STARTS_2)
        assert sc.revcomp_record_names == ["chr3", "chr2", "chr1"]

    def test_method_round_trip(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        ref = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        sc.reverse_complement()
        sc.reverse_complement()
        assert sc == ref

    def test_method_illegal_when_both(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="both")
        with pytest.raises(ValueError):
            sc.reverse_complement()

    def test_opposite_strand_index_helpers(self):
        assert SequenceCollection._get_opposite_strand_sba_index(0, 10) == 9
        assert SequenceCollection._get_opposite_strand_sba_index(9, 10) == 0
        with pytest.raises(ValueError):
            SequenceCollection._get_opposite_strand_sba_index(10, 10)
        arr = np.array([0, 3, 9], dtype=np.uint32)
        out = SequenceCollection._get_opposite_strand_sba_indices(arr, 10)
        assert np.array_equal(out, np.array([9, 6, 0], dtype=np.uint32))
        with pytest.raises(ValueError):
            SequenceCollection._get_opposite_strand_sba_indices(
                np.array([10], dtype=np.uint32), 10
            )


# --------------------------------------------------------------------------- #
# record lookups
# --------------------------------------------------------------------------- #

# (sba_idx, strand, expected record_loc) on seq_list_2 forward:
#   ATCGAATTAG$GGATCTTGCATT$GTGATTGACCCCT
#   0123456789 <- chr1 ->  <- chr2/chr3 ...
RECORD_LOC_FORWARD_CASES = [
    (0, ("+", "chr1", 0)),
    (5, ("+", "chr1", 5)),
    (9, ("+", "chr1", 9)),
    (11, ("+", "chr2", 0)),
    (17, ("+", "chr2", 6)),
    (22, ("+", "chr2", 11)),
    (24, ("+", "chr3", 0)),
    (30, ("+", "chr3", 6)),
    (36, ("+", "chr3", 12)),
]

# revcomp SBA: AGGGGTCAATCAC$AATGCAAGATCC$CTAATTCGAT (chr3, chr2, chr1)
# seq_idx counts from the segment's RIGHT edge (forward-strand coordinates)
RECORD_LOC_RC_CASES = [
    (0, ("-", "chr3", 12)),
    (6, ("-", "chr3", 6)),
    (12, ("-", "chr3", 0)),
    (14, ("-", "chr2", 11)),
    (19, ("-", "chr2", 6)),
    (25, ("-", "chr2", 0)),
    (27, ("-", "chr1", 9)),
    (32, ("-", "chr1", 4)),
    (36, ("-", "chr1", 0)),
]


class TestGetRecordLoc:
    @pytest.mark.parametrize("sba_idx,expected", RECORD_LOC_FORWARD_CASES)
    def test_forward(self, sba_idx, expected):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        assert sc.get_record_loc_from_sba_index(sba_idx) == expected

    @pytest.mark.parametrize("sba_idx,expected", RECORD_LOC_RC_CASES)
    def test_revcomp(self, sba_idx, expected):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="reverse_complement")
        assert sc.get_record_loc_from_sba_index(sba_idx) == expected

    def test_one_based(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        assert sc.get_record_loc_from_sba_index(11, one_based=True) == ("+", "chr2", 1)

    def test_both_loaded_requires_strand(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="both")
        with pytest.raises(ValueError):
            sc.get_record_loc_from_sba_index(0)
        assert sc.get_record_loc_from_sba_index(0, sba_strand="forward") == ("+", "chr1", 0)
        assert sc.get_record_loc_from_sba_index(0, sba_strand="reverse_complement") == (
            "-",
            "chr3",
            12,
        )

    def test_strand_mismatch_raises(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        with pytest.raises(ValueError):
            sc.get_record_loc_from_sba_index(0, sba_strand="reverse_complement")

    def test_record_name(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        assert sc.get_record_name_from_sba_index(0) == "chr1"
        assert sc.get_record_name_from_sba_index(11) == "chr2"
        assert sc.get_record_name_from_sba_index(36) == "chr3"

    def test_segment_num_method(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        assert sc.get_segment_num_from_sba_index(0) == 0
        assert sc.get_segment_num_from_sba_index(23) == 1
        with pytest.raises(IndexError):
            sc.get_segment_num_from_sba_index(37)
        with pytest.raises(IndexError):
            sc.get_segment_num_from_sba_index(-1)

    def test_segment_bounds_method(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        assert sc.get_sba_start_end_indices_for_segment(1) == (11, 22)

    def test_record_info_closure(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        f = sc.generate_get_record_info_from_sba_index_func()
        assert f(13) == (1, 11, 22, "+", "chr2", 2)

    def test_iter_records_forward(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        assert list(sc.iter_records()) == [("chr1", 0, 9), ("chr2", 11, 22), ("chr3", 24, 36)]

    def test_iter_records_revcomp_record_order(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="reverse_complement")
        # record_num order => iterate revcomp segments in reverse
        # (reference sequence_collection.py:381-388)
        assert list(sc.iter_records()) == [("chr1", 27, 36), ("chr2", 14, 25), ("chr3", 0, 12)]

    @pytest.mark.parametrize("one_based", [False, True])
    def test_exhaustive_both_strands(self, one_based):
        """Every base index of both strand SBAs, beyond the reference's
        18-point table (reference test_sequence_collection.py:869-893):
        expectations reconstructed independently from the raw seq_list.

        Forward: records in order, seq_idx counts left-to-right. Revcomp:
        records reversed, each sequence reverse-complemented, and seq_idx
        still reports FORWARD sequence coordinates (so it counts from the
        segment's right edge)."""
        off = 1 if one_based else 0
        sc_f = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        want = {}
        sba_idx = 0
        for name, seq in SEQ_LIST_2:
            for j in range(len(seq)):
                want[sba_idx] = ("+", name, j + off)
                sba_idx += 1
            sba_idx += 1  # '$'
        for idx, exp in want.items():
            assert sc_f.get_record_loc_from_sba_index(idx, one_based=one_based) == exp
            assert sc_f.get_record_name_from_sba_index(idx) == exp[1]

        sc_r = SequenceCollection(
            sequence_list=SEQ_LIST_2, strands_to_load="reverse_complement"
        )
        want_rc = {}
        sba_idx = 0
        for name, seq in reversed(SEQ_LIST_2):
            for j in range(len(seq)):
                # position j of the revcomp segment maps to forward index
                # len(seq) - 1 - j
                want_rc[sba_idx] = ("-", name, len(seq) - 1 - j + off)
                sba_idx += 1
            sba_idx += 1
        for idx, exp in want_rc.items():
            assert sc_r.get_record_loc_from_sba_index(idx, one_based=one_based) == exp
            assert sc_r.get_record_name_from_sba_index(idx) == exp[1]


# --------------------------------------------------------------------------- #
# equality
# --------------------------------------------------------------------------- #


class TestComparisons:
    def test_equal(self):
        a = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        b = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        assert a == b

    def test_fasta_path_ignored(self, tmp_path):
        p = write_fasta(tmp_path, FASTA_STR_2)
        a = SequenceCollection(fasta_file_path=p, strands_to_load="forward")
        b = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        assert a == b

    def test_different_seq(self):
        a = SequenceCollection(sequence_list=SEQ_LIST_1, strands_to_load="forward")
        b = SequenceCollection(sequence_list=[("chr1", "ATCGAATTAC")], strands_to_load="forward")
        assert a != b

    def test_different_names(self):
        a = SequenceCollection(sequence_list=SEQ_LIST_1, strands_to_load="forward")
        b = SequenceCollection(sequence_list=[("chrX", "ATCGAATTAG")], strands_to_load="forward")
        assert a != b

    def test_different_strands(self):
        a = SequenceCollection(sequence_list=SEQ_LIST_1, strands_to_load="forward")
        b = SequenceCollection(sequence_list=SEQ_LIST_1, strands_to_load="both")
        assert a != b

    def test_different_num_records(self):
        a = SequenceCollection(sequence_list=SEQ_LIST_1, strands_to_load="forward")
        b = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        assert a != b


# --------------------------------------------------------------------------- #
# save / load
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("fmt", ["hdf5", "shelve"])
@pytest.mark.parametrize("strands", ["forward", "reverse_complement", "both"])
class TestSaveLoad:
    def test_round_trip(self, tmp_path, fmt, strands):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load=strands)
        path = str(tmp_path / ("sc.h5" if fmt == "hdf5" else "sc.shelve"))
        sc.save(path, format=fmt)
        sc2 = SequenceCollection()
        sc2.load(path, format=fmt)
        assert sc2 == sc
        assert sc2.strands_loaded() == strands


def test_save_bad_format(tmp_path):
    sc = SequenceCollection(sequence_list=SEQ_LIST_1, strands_to_load="forward")
    with pytest.raises(ValueError):
        sc.save(str(tmp_path / "x"), format="json")
    with pytest.raises(ValueError):
        sc.load(str(tmp_path / "x"), format="json")
