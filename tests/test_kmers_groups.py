"""Group-statistics tests: get_kmers / get_kmer_count / get_kmer_group_counts
and the generic group-walk generator, swept against the pure-Python group
oracle (reference tests/test_kmers.py:837-1560, :1325-1464).
"""

import numpy as np
import pytest

from genome_kmers_tpu import (
    Kmers,
    SequenceCollection,
    get_compare_sba_kmers_func,
    get_kmer_group_size_hist,
    get_kmer_info_minimal,
    kmer_filter_keep_all,
    kmer_info_by_group_generator,
)
from oracle import expected_groups, expected_hist, expected_kmers

SEQ_LIST_1 = [("chr1", "ATCGAATTAG")]
SEQ_LIST_2 = [("chr1", "ATCGAATTAG"), ("chr2", "GGATCTTGCATT"), ("chr3", "GTGATTGACCCCT")]

GROUP_PARAM_SWEEP = [
    # (min_group_size, max_group_size, yield_first_n)
    (1, None, None),
    (1, None, 1),
    (1, None, 2),
    (1, 1, None),
    (1, 2, None),
    (1, 3, 1),
    (2, None, None),
    (2, 4, 2),
    (2, 2, None),
    (3, None, None),
    (4, None, 1),
]


# full product at the reference's granularity (reference
# test_kmers.py:1483-1495): min x max x yield_first_n, invalid (max < min)
# combinations excluded — ~130 parameter triples
FULL_GROUP_PARAM_PRODUCT = [
    (mgs, xgs, yfn)
    for mgs in (1, 2, 3, 4)
    for xgs in (1, 2, 3, 4, 7, None)
    if xgs is None or xgs >= mgs
    for yfn in (1, 2, 3, 4, 7, None)
]


def make_sorted_kmers(seq_list, min_kmer_len, max_kmer_len):
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=min_kmer_len, max_kmer_len=max_kmer_len)
    km.sort()
    return km


class TestGetKmersMinimal:
    @pytest.mark.parametrize("kmer_len", [1, 2, 3, 4, 8])
    @pytest.mark.parametrize("mgs,xgs,yfn", GROUP_PARAM_SWEEP)
    def test_sweep_seq_list_2(self, kmer_len, mgs, xgs, yfn):
        km = make_sorted_kmers(SEQ_LIST_2, kmer_len, kmer_len)
        _, _, sorted_kmers, _ = expected_kmers(SEQ_LIST_2, kmer_len, kmer_len)
        exp = expected_groups(sorted_kmers, kmer_len, mgs, xgs, yfn)
        got = list(
            km.get_kmers(
                kmer_len,
                min_group_size=mgs,
                max_group_size=xgs,
                yield_first_n=yfn,
            )
        )
        assert [(k, g, t) for k, g, t in got] == exp

    @pytest.mark.parametrize("kmer_len", [2, 3])
    def test_full_param_product_seq_list_2(self, kmer_len):
        """Every (min, max, yield_first_n) combination of the reference's
        full product sweep, pinned to the oracle (one test node per kmer_len
        to keep collection overhead sane)."""
        km = make_sorted_kmers(SEQ_LIST_2, kmer_len, kmer_len)
        _, _, sorted_kmers, _ = expected_kmers(SEQ_LIST_2, kmer_len, kmer_len)
        for mgs, xgs, yfn in FULL_GROUP_PARAM_PRODUCT:
            exp = expected_groups(sorted_kmers, kmer_len, mgs, xgs, yfn)
            got = list(
                km.get_kmers(
                    kmer_len,
                    min_group_size=mgs,
                    max_group_size=xgs,
                    yield_first_n=yfn,
                )
            )
            assert [(k, g, t) for k, g, t in got] == exp, (mgs, xgs, yfn)
            # the count query must agree with the same walk
            exp_count = sum(t for (_, _, t) in expected_groups(
                sorted_kmers, kmer_len, mgs, xgs, yield_first_n=1))
            assert (
                km.get_kmer_count(kmer_len, min_group_size=mgs, max_group_size=xgs)
                == exp_count
            ), (mgs, xgs)

    def test_kmer_len_caps_group_identity(self):
        """Group identity for get_kmers(kmer_len=L) uses an L-base compare
        even when the index was sorted with a larger cap (SURVEY.md gotcha 2)."""
        km = make_sorted_kmers(SEQ_LIST_2, 2, None)
        _, _, sorted_kmers, _ = expected_kmers(SEQ_LIST_2, 2, None)
        exp = expected_groups(sorted_kmers, 2)
        got = list(km.get_kmers(2))
        assert [(k, g, t) for k, g, t in got] == exp

    def test_unsorted_yields_input_order_singleton_groups(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=3, max_kmer_len=3)
        got = list(km.get_kmers(3))
        assert got == [(i, 1, 1) for i in range(len(km))]

    def test_group_params_rejected_when_unsorted(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=3, max_kmer_len=3)
        with pytest.raises(ValueError):
            list(km.get_kmers(3, min_group_size=2))
        with pytest.raises(ValueError):
            list(km.get_kmers(3, max_group_size=2))
        with pytest.raises(ValueError):
            list(km.get_kmers(3, yield_first_n=1))

    def test_bad_kmer_len(self):
        km = make_sorted_kmers(SEQ_LIST_2, 3, 3)
        with pytest.raises(ValueError):
            list(km.get_kmers(0))

    def test_bad_info_kind(self):
        km = make_sorted_kmers(SEQ_LIST_2, 3, 3)
        with pytest.raises(ValueError):
            list(km.get_kmers(3, kmer_info_to_yield="everything"))


class TestGetKmersFull:
    def test_full_info_3mers(self):
        """Hand-verifiable full-info yields (reference tests/test_kmers.py:984-1043)."""
        km = make_sorted_kmers(SEQ_LIST_2, 3, 3)
        got = list(km.get_kmers(3, kmer_info_to_yield="full"))
        # verify each tuple against the string it names
        seqs = dict(SEQ_LIST_2)
        _, _, sorted_kmers, _ = expected_kmers(SEQ_LIST_2, 3, 3)
        assert len(got) == len(sorted_kmers)
        for (kmer_num, strand, chrom, start, klen, gsy, gst), exp_str in zip(
            got, sorted_kmers
        ):
            assert strand == "+"
            assert klen == 3
            assert seqs[chrom][start : start + 3] == exp_str
            assert km.get_kmer_str(kmer_num, 3) == exp_str

    def test_full_one_based(self):
        km = make_sorted_kmers(SEQ_LIST_1, 3, 3)
        got0 = list(km.get_kmers(3, kmer_info_to_yield="full"))
        got1 = list(km.get_kmers(3, one_based_seq_index=True, kmer_info_to_yield="full"))
        for a, b in zip(got0, got1):
            assert b[3] == a[3] + 1

    def test_full_group_sizes_match_minimal(self):
        km = make_sorted_kmers(SEQ_LIST_2, 2, 2)
        minimal = list(km.get_kmers(2, min_group_size=2, yield_first_n=1))
        full = list(
            km.get_kmers(2, kmer_info_to_yield="full", min_group_size=2, yield_first_n=1)
        )
        assert [(m[0], m[1], m[2]) for m in minimal] == [(f[0], f[5], f[6]) for f in full]


class TestGetKmerCount:
    @pytest.mark.parametrize("kmer_len", [1, 2, 3, 4, 8])
    @pytest.mark.parametrize("mgs,xgs", [(1, None), (2, None), (1, 1), (2, 3), (3, None)])
    def test_sweep(self, kmer_len, mgs, xgs):
        km = make_sorted_kmers(SEQ_LIST_2, kmer_len, kmer_len)
        _, _, sorted_kmers, _ = expected_kmers(SEQ_LIST_2, kmer_len, kmer_len)
        exp = sum(
            t for (_, _, t) in expected_groups(sorted_kmers, kmer_len, mgs, xgs, yield_first_n=1)
        )
        assert km.get_kmer_count(kmer_len, min_group_size=mgs, max_group_size=xgs) == exp

    def test_unsorted_total(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=3, max_kmer_len=3)
        assert km.get_kmer_count(3) == len(km)

    def test_group_params_rejected_when_unsorted(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=3, max_kmer_len=3)
        with pytest.raises(ValueError):
            km.get_kmer_count(3, min_group_size=2)


class TestGetKmerGroupCounts:
    @pytest.mark.parametrize("kmer_len", [1, 2, 3, 4])
    @pytest.mark.parametrize("mgs,xgs", [(1, None), (2, None), (2, 3)])
    def test_sweep(self, kmer_len, mgs, xgs):
        km = make_sorted_kmers(SEQ_LIST_2, kmer_len, kmer_len)
        _, _, sorted_kmers, _ = expected_kmers(SEQ_LIST_2, kmer_len, kmer_len)
        exp_counts, exp_total = expected_hist(
            sorted_kmers, kmer_len, mgs, xgs, max_counts_bin=20
        )
        counts, total = km.get_kmer_group_counts(
            kmer_len, min_group_size=mgs, max_group_size=xgs, max_counts_bin=20
        )
        assert total == exp_total
        assert np.array_equal(counts, exp_counts)

    def test_clip_into_top_bin(self):
        # 'A' x 8 -> single group of size 8 for 1-mers; bin cap 3 clips to bin 3
        km = make_sorted_kmers([("chr1", "AAAAAAAA")], 1, 1)
        counts, total = km.get_kmer_group_counts(1, max_counts_bin=3)
        assert total == 8
        assert counts[3] == 1
        assert counts.sum() == 1

    def test_requires_sorted(self):
        sc = SequenceCollection(sequence_list=SEQ_LIST_2, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=3, max_kmer_len=3)
        with pytest.raises(AssertionError):
            km.get_kmer_group_counts(3)

    def test_bad_max_counts_bin(self):
        km = make_sorted_kmers(SEQ_LIST_2, 3, 3)
        with pytest.raises(ValueError):
            km.get_kmer_group_counts(3, max_counts_bin=0)


class TestGenericWalkParity:
    """The free-function group walk (host fallback) against the oracle —
    this is the escape hatch for arbitrary user callables."""

    @pytest.mark.parametrize("kmer_len", [1, 2, 3])
    @pytest.mark.parametrize("mgs,xgs,yfn", GROUP_PARAM_SWEEP[:6])
    def test_walk_matches_oracle(self, kmer_len, mgs, xgs, yfn):
        km = make_sorted_kmers(SEQ_LIST_2, kmer_len, kmer_len)
        sba = km.seq_coll.forward_sba
        _, _, sorted_kmers, _ = expected_kmers(SEQ_LIST_2, kmer_len, kmer_len)
        exp = expected_groups(sorted_kmers, kmer_len, mgs, xgs, yfn)
        got = list(
            kmer_info_by_group_generator(
                sba,
                "forward",
                kmer_len,
                km.kmer_sba_start_indices,
                get_compare_sba_kmers_func(kmer_len),
                kmer_filter_keep_all,
                get_kmer_info_minimal,
                mgs,
                xgs,
                yfn,
            )
        )
        assert [(k, g, t) for k, g, t in got] == exp

    def test_walk_param_validation(self):
        km = make_sorted_kmers(SEQ_LIST_1, 2, 2)
        sba = km.seq_coll.forward_sba
        gen = kmer_info_by_group_generator(
            sba, "forward", 2, km.kmer_sba_start_indices,
            get_compare_sba_kmers_func(2), kmer_filter_keep_all,
            get_kmer_info_minimal, min_group_size=0,
        )
        with pytest.raises(ValueError):
            next(gen)
        gen = kmer_info_by_group_generator(
            sba, "forward", 2, km.kmer_sba_start_indices,
            get_compare_sba_kmers_func(2), kmer_filter_keep_all,
            get_kmer_info_minimal, min_group_size=3, max_group_size=2,
        )
        with pytest.raises(ValueError):
            next(gen)
        gen = kmer_info_by_group_generator(
            sba, "forward", 2, km.kmer_sba_start_indices,
            get_compare_sba_kmers_func(2), kmer_filter_keep_all,
            get_kmer_info_minimal, yield_first_n=0,
        )
        with pytest.raises(ValueError):
            next(gen)

    def test_free_hist_function(self):
        km = make_sorted_kmers(SEQ_LIST_2, 2, 2)
        sba = km.seq_coll.forward_sba
        _, _, sorted_kmers, _ = expected_kmers(SEQ_LIST_2, 2, 2)
        exp_counts, exp_total = expected_hist(sorted_kmers, 2, max_counts_bin=10)
        counts, total = get_kmer_group_size_hist(
            sba,
            "forward",
            2,
            km.kmer_sba_start_indices,
            get_compare_sba_kmers_func(2),
            kmer_filter_keep_all,
            max_counts_bin=10,
        )
        assert total == exp_total
        assert np.array_equal(counts, exp_counts)
