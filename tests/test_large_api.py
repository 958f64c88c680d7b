"""LargeKmers full API parity: the 64-bit regime class must agree exactly
with the uint32 Kmers engine on genomes both can handle — filters, streaming
queries, canonical statistics, bulk extraction arrays, string decode, and
sharded checkpoint round-trips (round-4 scope; the >2^32 exactness proof is
tests/test_large.py::TestPast2p32, which drives the same machinery through
this API at a genome past the uint32 ceiling)."""

import tempfile

import numpy as np
import pytest

from genome_kmers_tpu import Kmers, LargeKmers, SequenceCollection
from genome_kmers_tpu.ops.filters import (
    VectorizedFilter,
    crispr_ngg_pam_filter,
    gen_kmer_gc_content_filter_func,
    gen_kmer_homopolymer_filter_func,
    gen_kmer_length_filter_func,
    gen_no_ambiguous_bases_filter,
)
from genome_kmers_tpu.parallel import make_mesh


def _acgt_seqs(seed=5, sizes=(3001, 1999, 800), p=None):
    rng = np.random.default_rng(seed)
    return [
        (f"r{i}", "".join(rng.choice(list("ACGT"), size=n, p=p)))
        for i, n in enumerate(sizes)
    ]


def _pair(seqs, min_k, max_k, mesh, both=False):
    """(sorted uint32 Kmers, sorted LargeKmers) over the same records."""
    strands = "both" if both else "forward"
    sc = SequenceCollection(sequence_list=seqs, strands_to_load=strands)
    if both:
        km = Kmers.from_strand(sc, min_kmer_len=min_k, max_kmer_len=max_k,
                               source_strand="both")
    else:
        km = Kmers(sc, min_kmer_len=min_k, max_kmer_len=max_k)
    km.sort()
    lk = LargeKmers.from_records(seqs, min_k, max_k, both_strands=both)
    lk.sort(mesh)
    np.testing.assert_array_equal(
        lk.sorted_positions(), km.kmer_sba_start_indices.astype(np.uint64)
    )
    return km, lk


class TestLargeFilters:
    K = 23

    @pytest.fixture(scope="class")
    def pair(self):
        return _pair(_acgt_seqs(), self.K, 31, make_mesh(8))

    @pytest.mark.parametrize(
        "name",
        ["gc", "length", "homopoly", "noamb", "crispr"],
    )
    def test_filtered_stats_match(self, pair, name):
        km, lk = pair
        K = self.K
        f = {
            "gc": lambda: gen_kmer_gc_content_filter_func(0.35, 0.65, K),
            "length": lambda: gen_kmer_length_filter_func(25),
            "homopoly": lambda: gen_kmer_homopolymer_filter_func(2, K),
            "noamb": lambda: gen_no_ambiguous_bases_filter(K),
            "crispr": lambda: crispr_ngg_pam_filter,
        }[name]()
        ck, tk = km.get_kmer_group_counts(K, kmer_filter_func=f, max_counts_bin=40)
        cl, tl = lk.get_kmer_group_counts(K, kmer_filter_func=f, max_counts_bin=40)
        np.testing.assert_array_equal(cl.astype(np.int64), ck)
        assert tk == tl
        assert km.get_kmer_count(K, kmer_filter_func=f) == lk.get_kmer_count(
            K, kmer_filter_func=f
        )

    def test_group_size_bounds_with_filter(self):
        seqs = _acgt_seqs(7, sizes=(4000, 1500), p=[0.6, 0.2, 0.1, 0.1])
        km, lk = _pair(seqs, 8, 16, make_mesh(8))
        f = gen_kmer_gc_content_filter_func(0.2, 0.8, 8)
        ck, tk = km.get_kmer_group_counts(
            8, kmer_filter_func=f, min_group_size=2, max_group_size=9,
            max_counts_bin=15,
        )
        cl, tl = lk.get_kmer_group_counts(
            8, kmer_filter_func=f, min_group_size=2, max_group_size=9,
            max_counts_bin=15,
        )
        assert tk > 0
        np.testing.assert_array_equal(cl.astype(np.int64), ck)
        assert tk == tl

    def test_filter_error_parity(self, pair):
        km, lk = pair
        f = gen_no_ambiguous_bases_filter(31)
        with pytest.raises(ValueError) as ek:
            km.get_kmer_count(31, kmer_filter_func=f)
        with pytest.raises(ValueError) as el:
            lk.get_kmer_count(31, kmer_filter_func=f)
        assert str(ek.value) == str(el.value)

    def test_iupac_four_bit_filters(self):
        seqs = [("n1", "ACGTNNACGTACGGTTAACCGT"), ("n2", "GGNNCCATACGGTTACGT")]
        mesh = make_mesh(4)
        km, lk = _pair(seqs, 5, 8, mesh)
        assert not lk.two_bit
        f = gen_no_ambiguous_bases_filter(5)
        ck, tk = km.get_kmer_group_counts(5, kmer_filter_func=f, max_counts_bin=20)
        cl, tl = lk.get_kmer_group_counts(5, kmer_filter_func=f, max_counts_bin=20)
        np.testing.assert_array_equal(cl.astype(np.int64), ck)
        assert tk == tl

    def test_custom_callable_rejected(self, pair):
        _, lk = pair
        with pytest.raises(NotImplementedError, match="library KmerFilter"):
            lk.get_kmer_count(
                self.K, kmer_filter_func=lambda sba, strand, idx: True
            )
        with pytest.raises(NotImplementedError, match="key lanes"):
            lk.get_kmer_count(
                self.K, kmer_filter_func=VectorizedFilter(lambda s, p, v: p >= 0)
            )


class TestLargeQueries:
    K = 23

    @pytest.fixture(scope="class")
    def pair(self):
        return _pair(_acgt_seqs(), self.K, 31, make_mesh(8))

    def test_counts_match_uint32_engine(self, pair):
        km, lk = pair
        qs = [km.get_kmer_str(0, self.K), km.get_kmer_str(5, self.K), "A" * self.K]
        np.testing.assert_array_equal(
            lk.count_queries(qs, self.K).astype(np.uint32),
            km.count_queries(qs, self.K),
        )

    def test_non_acgt_query_counts_zero_on_2bit(self, pair):
        _, lk = pair
        out = lk.count_queries(["N" + "A" * (self.K - 1)], self.K)
        assert out.tolist() == [0]

    def test_prefix_kmer_len(self, pair):
        km, lk = pair
        qs = [km.get_kmer_str(0, self.K)[:11], "ACGTACGTACG"]
        np.testing.assert_array_equal(
            lk.count_queries(qs, 11).astype(np.uint32), km.count_queries(qs, 11)
        )

    def test_canonical_queries(self, pair):
        km, lk = pair
        qs = [km.get_kmer_str(0, self.K), "A" * self.K]
        np.testing.assert_array_equal(
            lk.count_queries_canonical(qs, self.K).astype(np.uint32),
            km.count_queries_canonical(qs, self.K),
        )

    def test_iupac_four_bit_queries(self):
        seqs = [("n1", "ACGTNNACGTACGGTTAACCGT"), ("n2", "GGNNCCATACGGTTACGT")]
        km, lk = _pair(seqs, 5, 8, make_mesh(4))
        qs = [km.get_kmer_str(0, 5), "ACGTN", "NNACG"]
        np.testing.assert_array_equal(
            lk.count_queries(qs, 5).astype(np.uint32), km.count_queries(qs, 5)
        )

    def test_requires_sorted(self):
        lk = LargeKmers.from_records(_acgt_seqs(), self.K, 31)
        with pytest.raises(AssertionError, match="sorted"):
            lk.count_queries(["A" * self.K], self.K)


class TestLargeCanonical:
    def test_matches_uint32_engine(self):
        km, lk = _pair(_acgt_seqs(9, sizes=(2500, 900)), 8, 16, make_mesh(8))
        for k in (8, 16):
            ck, tk = km.get_canonical_kmer_group_counts(k, max_counts_bin=30)
            cl, tl = lk.get_canonical_kmer_group_counts(k, max_counts_bin=30)
            np.testing.assert_array_equal(cl.astype(np.int64), ck)
            assert tk == tl

    def test_rejects_both_strand_and_caps_4bit(self):
        lk = LargeKmers.from_records(_acgt_seqs(), 8, 16, both_strands=True)
        with pytest.raises(NotImplementedError, match="single-strand"):
            lk.get_canonical_kmer_group_counts(8, mesh=make_mesh(2))
        # round 5: IUPAC genomes are supported (4-bit lanes) — verify counts
        # against the uint32 engine instead of expecting an error; the 4-bit
        # lanes cap kmer_len at 32
        seqs = [("n", "ACGTNACGTACG")]
        lk4 = LargeKmers.from_records(seqs, 3, 4)
        got_c, got_t = lk4.get_canonical_kmer_group_counts(3, mesh=make_mesh(2))
        sc = SequenceCollection(sequence_list=seqs, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=3, max_kmer_len=4)
        want_c, want_t = km.get_canonical_kmer_group_counts(3)
        np.testing.assert_array_equal(
            np.asarray(got_c)[: len(want_c)].astype(np.int64), want_c
        )
        assert got_t == want_t
        with pytest.raises(ValueError, match=r"\[1, 32\]"):
            lk4.get_canonical_kmer_group_counts(33, mesh=make_mesh(2))


class TestLargeArrays:
    K = 8

    @pytest.fixture(scope="class")
    def pair(self):
        return _pair(
            _acgt_seqs(7, sizes=(4000, 1500), p=[0.6, 0.2, 0.1, 0.1]),
            self.K, 16, make_mesh(8),
        )

    @pytest.mark.parametrize(
        "kwargs",
        [
            dict(),
            dict(min_group_size=2, yield_first_n=2),
            dict(min_group_size=2, max_group_size=9),
            dict(yield_first_n=1),
        ],
    )
    def test_get_kmers_arrays_matches(self, pair, kwargs):
        km, lk = pair
        ak = km.get_kmers_arrays(self.K, **kwargs)
        al = lk.get_kmers_arrays(self.K, **kwargs)
        assert len(ak[0]) > 0
        for i in range(4):
            np.testing.assert_array_equal(
                np.asarray(al[i]).astype(np.asarray(ak[i]).dtype), ak[i]
            )

    def test_filtered_arrays_match(self, pair):
        km, lk = pair
        f = gen_kmer_gc_content_filter_func(0.2, 0.8, self.K)
        ak = km.get_kmers_arrays(self.K, kmer_filter_func=f, min_group_size=2,
                                 yield_first_n=2)
        al = lk.get_kmers_arrays(self.K, kmer_filter_func=f, min_group_size=2,
                                 yield_first_n=2)
        assert len(ak[0]) > 100
        for i in range(4):
            np.testing.assert_array_equal(
                np.asarray(al[i]).astype(np.asarray(ak[i]).dtype), ak[i]
            )

    def test_full_arrays_match(self, pair):
        km, lk = pair
        fk = km.get_kmers_full_arrays(self.K, yield_first_n=1)
        fl = lk.get_kmers_full_arrays(self.K, yield_first_n=1)
        for key in fk:
            np.testing.assert_array_equal(
                np.asarray(fl[key]).astype(np.asarray(fk[key]).dtype),
                fk[key], err_msg=key,
            )

    def test_full_arrays_one_based_and_both_strands(self):
        seqs = _acgt_seqs(3, sizes=(800, 500))
        km, lk = _pair(seqs, 6, 12, make_mesh(4), both=True)
        fk = km.get_kmers_full_arrays(6, one_based_seq_index=True, yield_first_n=1)
        fl = lk.get_kmers_full_arrays(6, one_based_seq_index=True, yield_first_n=1)
        for key in fk:
            np.testing.assert_array_equal(
                np.asarray(fl[key]).astype(np.asarray(fk[key]).dtype),
                fk[key], err_msg=key,
            )

    def test_strings_match(self, pair):
        km, lk = pair
        nums = np.arange(9)
        assert km.get_kmer_strs(nums, self.K) == lk.get_kmer_strs(nums, self.K)
        assert lk.get_kmer_str(3, self.K) == km.get_kmer_str(3, self.K)
        with pytest.raises(ValueError, match="out of bounds"):
            lk.get_kmer_strs([len(lk) + 5], self.K)

    def test_iupac_strings(self):
        seqs = [("n1", "ACGTNNACGTACGGTTAACCGT"), ("n2", "GGNNCCATACGGTTACGT")]
        km, lk = _pair(seqs, 5, 8, make_mesh(4))
        nums = np.arange(len(lk))
        assert km.get_kmer_strs(nums, 5) == lk.get_kmer_strs(nums, 5)


class TestLargeCheckpoint:
    def test_round_trip_onto_different_mesh(self, tmp_path):
        seqs = _acgt_seqs(11, sizes=(2000, 700))
        km, lk = _pair(seqs, 8, 16, make_mesh(8))
        c1, t1 = lk.get_kmer_group_counts(8, max_counts_bin=30)
        f = gen_kmer_gc_content_filter_func(0.25, 0.75, 8)
        cf1 = lk.get_kmer_count(8, kmer_filter_func=f)
        lk.save_checkpoint(tmp_path / "ck")

        lk2 = LargeKmers.from_records(seqs, 8, 16)
        assert not lk2._is_sorted
        lk2.load_checkpoint(tmp_path / "ck", make_mesh(4))
        np.testing.assert_array_equal(lk2.sorted_positions(), lk.sorted_positions())
        c2, t2 = lk2.get_kmer_group_counts(8, max_counts_bin=30)
        np.testing.assert_array_equal(c2, c1)
        assert t2 == t1
        # filters rebuild lanes lazily after a restore
        assert lk2.get_kmer_count(8, kmer_filter_func=f) == cf1
        # queries over the restored layout
        q = km.get_kmer_str(0, 8)
        np.testing.assert_array_equal(
            lk2.count_queries([q], 8), lk.count_queries([q], 8)
        )

    def test_param_mismatch_rejected(self, tmp_path):
        seqs = _acgt_seqs(11, sizes=(500,))
        _, lk = _pair(seqs, 4, 8, make_mesh(2))
        lk.save_checkpoint(tmp_path / "ck")
        other = LargeKmers.from_records(seqs, 4, 12)
        with pytest.raises(ValueError, match="do not match"):
            other.load_checkpoint(tmp_path / "ck", make_mesh(2))

    def test_requires_sorted(self, tmp_path):
        lk = LargeKmers.from_records(_acgt_seqs(11, sizes=(500,)), 4, 8)
        with pytest.raises(AssertionError, match="sorted"):
            lk.save_checkpoint(tmp_path / "ck")


class TestLargeCsv:
    """to_csv for the 64-bit regime: byte-identical to Kmers.to_csv
    (itself byte-pinned to the reference-shaped row-loop writer) on
    genomes both engines can hold."""

    FIELDS = ["kmer", "kmer_num", "chrom", "start", "strand", "group_size"]

    def test_full_fields_match_uint32_engine(self, tmp_path):
        km, lk = _pair(_acgt_seqs(7, sizes=(301, 157)), 8, 12, make_mesh(4))
        a, b = tmp_path / "km.csv", tmp_path / "lk.csv"
        km.to_csv(8, str(a), fields=self.FIELDS)
        lk.to_csv(8, str(b), fields=self.FIELDS)
        assert a.read_bytes() == b.read_bytes()

    def test_lean_fields_match(self, tmp_path):
        km, lk = _pair(_acgt_seqs(9, sizes=(222,)), 6, 9, make_mesh(2))
        a, b = tmp_path / "km.csv", tmp_path / "lk.csv"
        km.to_csv(6, str(a), fields=["kmer", "kmer_num"])
        lk.to_csv(6, str(b), fields=["kmer", "kmer_num"])
        assert a.read_bytes() == b.read_bytes()

    def test_both_strands_match(self, tmp_path):
        km, lk = _pair(_acgt_seqs(13, sizes=(120, 80)), 7, 10, make_mesh(4),
                       both=True)
        a, b = tmp_path / "km.csv", tmp_path / "lk.csv"
        km.to_csv(7, str(a), fields=self.FIELDS)
        lk.to_csv(7, str(b), fields=self.FIELDS)
        assert a.read_bytes() == b.read_bytes()

    def test_beyond_segment_raise_parity(self, tmp_path):
        km, lk = _pair(_acgt_seqs(9, sizes=(64,)), 3, 12, make_mesh(2))
        with pytest.raises(ValueError) as e1:
            km.to_csv(12, str(tmp_path / "a.csv"), fields=["kmer"])
        with pytest.raises(ValueError) as e2:
            lk.to_csv(12, str(tmp_path / "b.csv"), fields=["kmer"])
        assert str(e1.value) == str(e2.value)

    def test_bad_field_rejected(self, tmp_path):
        _, lk = _pair(_acgt_seqs(9, sizes=(64,)), 3, 8, make_mesh(2))
        with pytest.raises(ValueError, match="unrecognized fields"):
            lk.to_csv(4, str(tmp_path / "x.csv"), fields=["kmer", "nope"])

    def test_group_size_without_full_info_never_raises(self, tmp_path):
        # review-found parity bug: group_size used to route through
        # get_kmers_full_arrays, whose beyond-segment check raised where
        # Kmers.to_csv (via get_kmers_arrays) writes the file fine
        km, lk = _pair(_acgt_seqs(9, sizes=(64,)), 3, 12, make_mesh(2))
        a, b = tmp_path / "km.csv", tmp_path / "lk.csv"
        km.to_csv(12, str(a), fields=["kmer_num", "group_size"])
        lk.to_csv(12, str(b), fields=["kmer_num", "group_size"])
        assert a.read_bytes() == b.read_bytes()
        # ... but the kmer column still raises identically on both engines
        with pytest.raises(ValueError) as e1:
            km.to_csv(12, str(a), fields=["kmer", "group_size"])
        with pytest.raises(ValueError) as e2:
            lk.to_csv(12, str(b), fields=["kmer", "group_size"])
        assert str(e1.value) == str(e2.value)


class TestLargeGenerator:
    """get_kmers generator parity: same tuples as the uint32 engine."""

    def test_minimum_and_full_match(self):
        km, lk = _pair(_acgt_seqs(21, sizes=(180, 90)), 8, 12, make_mesh(4))
        a = list(km.get_kmers(8, kmer_info_to_yield="minimum",
                              min_group_size=1))
        b = list(lk.get_kmers(8, kmer_info_to_yield="minimum",
                              min_group_size=1))
        assert a == b and len(a) > 0
        a = list(km.get_kmers(8, kmer_info_to_yield="full",
                              one_based_seq_index=True))
        b = list(lk.get_kmers(8, kmer_info_to_yield="full",
                              one_based_seq_index=True))
        assert a == b

    def test_filtered_and_grouped_match(self):
        km, lk = _pair(_acgt_seqs(22, sizes=(400,), p=(0.4, 0.1, 0.1, 0.4)),
                       6, 10, make_mesh(2))
        f = gen_kmer_gc_content_filter_func(0.2, 0.8, 6)
        a = list(km.get_kmers(6, kmer_filter_func=f, min_group_size=2,
                              yield_first_n=1))
        b = list(lk.get_kmers(6, kmer_filter_func=f, min_group_size=2,
                              yield_first_n=1))
        assert a == b and len(a) > 0

    def test_beyond_segment_raise_parity(self):
        km, lk = _pair(_acgt_seqs(23, sizes=(70,)), 4, 12, make_mesh(2))

        def collect(gen):
            rows, err = [], None
            try:
                for r in gen:
                    rows.append(r)
            except ValueError as e:
                err = str(e)
            return rows, err

        # the raise is LAZY in both engines: the valid prefix is yielded
        # before the first violating row fires the error
        rows1, err1 = collect(km.get_kmers(12, kmer_info_to_yield="full"))
        rows2, err2 = collect(lk.get_kmers(12, kmer_info_to_yield="full"))
        assert err1 is not None and err1 == err2
        assert rows1 == rows2 and len(rows1) > 0

    def test_requires_sorted_names_get_kmers(self):
        lk = LargeKmers.from_records(_acgt_seqs(11, sizes=(500,)), 4, 8)
        with pytest.raises(AssertionError, match="get_kmers"):
            next(lk.get_kmers(4))

    def test_bad_info_kind(self):
        _, lk = _pair(_acgt_seqs(9, sizes=(64,)), 3, 8, make_mesh(2))
        with pytest.raises(ValueError, match="not recognized"):
            list(lk.get_kmers(4, kmer_info_to_yield="nope"))
