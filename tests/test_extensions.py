"""Extension tests: canonical k-mers and streaming count queries — features
the reference declares but does not implement (kmers.py:689-696) or has no
analog for. Verified against pure-Python brute force.
"""

import numpy as np
import pytest

from genome_kmers_tpu import Kmers, SequenceCollection

COMP = str.maketrans("ACGT", "TGCA")


def revcomp(s: str) -> str:
    return s.translate(COMP)[::-1]


def random_seq(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def make_sorted(seq_list, min_k, max_k):
    sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=min_k, max_kmer_len=max_k)
    km.sort()
    return km


class TestCountQueries:
    @pytest.mark.parametrize("k", [3, 8, 11, 31])
    def test_counts_match_brute_force(self, k):
        seq = random_seq(500, seed=k)
        km = make_sorted([("chr1", seq)], k, k)
        rng = np.random.default_rng(99)
        # half real k-mers from the genome, half random (possibly absent)
        queries = [seq[i : i + k] for i in rng.integers(0, len(seq) - k, size=8)]
        queries += [random_seq(k, seed=1000 + j) for j in range(8)]
        got = km.count_queries(queries)
        for q, c in zip(queries, got):
            expected = sum(
                1 for i in range(len(seq) - k + 1) if seq[i : i + k] == q
            )
            assert int(c) == expected, q

    def test_multi_record(self):
        seq_list = [("a", random_seq(200, 1)), ("b", random_seq(133, 2))]
        k = 6
        km = make_sorted(seq_list, k, k)
        queries = [seq_list[0][1][:k], seq_list[1][1][:k], "A" * k]
        got = km.count_queries(queries)
        for q, c in zip(queries, got):
            expected = sum(
                seq[i : i + k] == q
                for _, seq in seq_list
                for i in range(len(seq) - k + 1)
            )
            assert int(c) == expected

    def test_repetitive(self):
        km = make_sorted([("chr1", "ACGT" * 50)], 4, 4)
        got = km.count_queries(["ACGT", "CGTA", "GTAC", "TACG", "AAAA"])
        assert list(got) == [50, 49, 49, 49, 0]

    def test_iupac_genome_supported(self):
        # 4-bit key space: queries against genomes with ambiguous bases work
        km = make_sorted([("chr1", "ACGTNACGTNACGT")], 4, 4)
        got = km.count_queries(["ACGT", "GTNA"])
        assert list(got) == [3, 2]

    def test_requires_sorted(self):
        sc = SequenceCollection(sequence_list=[("c", "ACGTACGT")], strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=4, max_kmer_len=4)
        with pytest.raises(ValueError):
            km.count_queries(["ACGT"])

    def test_bad_query_length(self):
        km = make_sorted([("c", "ACGTACGT")], 4, 4)
        with pytest.raises(ValueError):
            km.count_queries(["ACG"], kmer_len=4)

    def test_empty_queries(self):
        km = make_sorted([("c", "ACGTACGT")], 4, 4)
        assert len(km.count_queries([])) == 0


class TestCanonicalGroupCounts:
    def brute_hist(self, seq_list, k, max_bin):
        from collections import Counter

        counts = Counter()
        for _, seq in seq_list:
            for i in range(len(seq) - k + 1):
                s = seq[i : i + k]
                counts[min(s, revcomp(s))] += 1
        hist = np.zeros(max_bin + 1, dtype=np.int64)
        total = 0
        for c in counts.values():
            hist[min(c, max_bin)] += 1
            total += c
        return hist, total

    @pytest.mark.parametrize("k", [1, 4, 7, 16, 17, 31, 32, 33, 48, 55, 64])
    def test_matches_brute_force(self, k):
        seq_list = [("chr1", random_seq(300, seed=k)), ("chr2", random_seq(77, seed=k + 1))]
        km = make_sorted(seq_list, min(k, 77), k)
        exp_hist, exp_total = self.brute_hist(seq_list, k, 30)
        got_hist, got_total = km.get_canonical_kmer_group_counts(k, max_counts_bin=30)
        assert got_total == exp_total
        assert np.array_equal(got_hist, exp_hist), k

    def test_palindromes(self):
        # ACGT is its own revcomp; palindromic k-mers must not double-collapse
        km = make_sorted([("c", "ACGTACGTACGT")], 4, 4)
        exp_hist, exp_total = self.brute_hist([("c", "ACGTACGTACGT")], 4, 10)
        got_hist, got_total = km.get_canonical_kmer_group_counts(4, max_counts_bin=10)
        assert got_total == exp_total
        assert np.array_equal(got_hist, exp_hist)

    def test_strand_collapse(self):
        # "AAAA" and "TTTT" collapse into one canonical group of 2
        km = make_sorted([("a", "AAAA"), ("b", "TTTT")], 4, 4)
        hist, total = km.get_canonical_kmer_group_counts(4, max_counts_bin=10)
        assert total == 2
        assert hist[2] == 1 and hist.sum() == 1

    def test_unsorted_allowed(self):
        # canonical stats sort internally; Kmers.sort() not required
        sc = SequenceCollection(sequence_list=[("c", "ACGTACGT")], strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=4, max_kmer_len=4)
        hist, total = km.get_canonical_kmer_group_counts(4, max_counts_bin=10)
        assert total == 5

    def test_iupac_genome_supported(self):
        """Round 5: canonical stats on an IUPAC genome (4-bit lanes) — was
        NotImplementedError. N complements to N, so "ACGTN" has canonical
        4-mers {min(ACGT, ACGT)=ACGT, min(CGTN, NACG)=CGTN} -> 2 singletons."""
        km_sc = SequenceCollection(sequence_list=[("c", "ACGTN")], strands_to_load="forward")
        km = Kmers(km_sc, min_kmer_len=2, max_kmer_len=4)
        counts, total = km.get_canonical_kmer_group_counts(4, max_counts_bin=8)
        assert total == 2 and counts[1] == 2

    def test_bad_k(self):
        km = make_sorted([("c", "ACGTACGT")], 4, 4)
        with pytest.raises(ValueError):
            km.get_canonical_kmer_group_counts(65)
        with pytest.raises(ValueError):
            km.get_canonical_kmer_group_counts(0)
        # IUPAC (4-bit) lanes cap at 32
        km_sc = SequenceCollection(
            sequence_list=[("c", "ACGTN" * 10)], strands_to_load="forward"
        )
        km_n = Kmers(km_sc, min_kmer_len=2, max_kmer_len=40)
        with pytest.raises(ValueError, match=r"\[1, 32\]"):
            km_n.get_canonical_kmer_group_counts(40)


class TestRevcompKeyWords:
    @pytest.mark.parametrize("k", [1, 5, 16, 17, 24, 32, 33, 47, 55, 64])
    def test_revcomp_key_round_trip(self, k):
        """rc(rc(key)) == key and rc key decodes to the string revcomp."""
        import jax.numpy as jnp

        from genome_kmers_tpu.ops.canonical import revcomp_key_words
        from genome_kmers_tpu.ops.keys import pack_rank2_words

        seq = random_seq(96, seed=k)
        sba = np.frombuffer(seq.encode(), dtype=np.uint8)
        packed2 = pack_rank2_words(jnp.asarray(sba))
        from genome_kmers_tpu.ops.keys import build_key2_words

        positions = jnp.asarray(np.arange(10, dtype=np.uint32))
        cap = jnp.full(10, k, dtype=jnp.uint32)
        n_words = -(-k // 16)
        fwd = build_key2_words(packed2, positions, cap, n_words, jnp.uint32(0))
        rc = revcomp_key_words(fwd, k)
        back = revcomp_key_words(rc, k)
        for a, b in zip(fwd, back):
            assert np.array_equal(np.asarray(a), np.asarray(b))

        # decode rc words and compare against the string revcomp
        def decode(words, i):
            bases = []
            for w in range(n_words):
                v = int(np.asarray(words[w])[i])
                for f in range(16):
                    bases.append("ACGT"[(v >> (2 * (15 - f))) & 3])
            return "".join(bases[:k])

        for i in range(10):
            assert decode(rc, i) == revcomp(seq[i : i + k])


class TestGetKmersArrays:
    @pytest.mark.parametrize("mgs,xgs,yfn", [(1, None, None), (2, None, 1), (1, 2, None)])
    def test_matches_generator(self, mgs, xgs, yfn):
        km = make_sorted([("chr1", random_seq(200, 17))], 4, 4)
        gen = list(
            km.get_kmers(4, min_group_size=mgs, max_group_size=xgs, yield_first_n=yfn)
        )
        nums, pos, gsy, gst = km.get_kmers_arrays(
            4, min_group_size=mgs, max_group_size=xgs, yield_first_n=yfn
        )
        assert [(int(a), int(b), int(c)) for a, b, c in zip(nums, gsy, gst)] == gen
        assert np.array_equal(pos, km.kmer_sba_start_indices[nums])

    def test_rejected_unsorted_group_params(self):
        sc = SequenceCollection(sequence_list=[("c", "ACGTACGT")], strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=4, max_kmer_len=4)
        with pytest.raises(ValueError):
            km.get_kmers_arrays(4, min_group_size=2)


class TestCanonicalQueries:
    def test_counts_match_brute_force(self):
        seq = random_seq(400, seed=70)
        k = 6
        km = make_sorted([("chr1", seq)], k, k)
        rng = np.random.default_rng(5)
        queries = [seq[i : i + k] for i in rng.integers(0, len(seq) - k, size=6)]
        queries += ["ACGCGT"]  # palindrome (revcomp == itself)
        got = km.count_queries_canonical(queries)
        for q, c in zip(queries, got):
            r = revcomp(q)
            expected = sum(seq[i : i + k] == q for i in range(len(seq) - k + 1))
            if r != q:
                expected += sum(seq[i : i + k] == r for i in range(len(seq) - k + 1))
            assert int(c) == expected, q

    def test_palindrome_not_double_counted(self):
        km = make_sorted([("c", "ACGCGTACGCGT")], 6, 6)
        got = km.count_queries_canonical(["ACGCGT"])
        assert int(got[0]) == 2  # appears twice; its own revcomp

    def test_invalid_query_rejected(self):
        km = make_sorted([("c", "ACGTACGT")], 4, 4)
        # IUPAC queries are accepted (round 5); lowercase / non-IUPAC not
        assert km.count_queries_canonical(["ACGN"]).tolist() == [0]
        with pytest.raises(ValueError, match="uppercase IUPAC"):
            km.count_queries_canonical(["acgt"])
        with pytest.raises(ValueError, match="uppercase IUPAC"):
            km.count_queries_canonical(["ACG$"])


class TestGetKmersFullArrays:
    def test_matches_full_generator(self):
        seq_list = [("a", random_seq(120, 31)), ("b", random_seq(77, 32))]
        km = make_sorted(seq_list, 4, 4)
        gen = list(km.get_kmers(4, kmer_info_to_yield="full", min_group_size=2))
        arrs = km.get_kmers_full_arrays(4, min_group_size=2)
        names = km.seq_coll.forward_record_names
        assert len(gen) == len(arrs["kmer_num"])
        for i, (kn, strand, chrom, start, klen, gsy, gst) in enumerate(gen):
            assert int(arrs["kmer_num"][i]) == kn
            assert names[int(arrs["record_num"][i])] == chrom
            assert int(arrs["seq_start_idx"][i]) == start
            assert int(arrs["kmer_len"][i]) == klen
            assert int(arrs["group_size_yielded"][i]) == gsy
            assert int(arrs["group_size_total"][i]) == gst

    def test_one_based(self):
        km = make_sorted([("c", random_seq(60, 33))], 3, 3)
        a0 = km.get_kmers_full_arrays(3)
        a1 = km.get_kmers_full_arrays(3, one_based_seq_index=True)
        assert np.array_equal(a1["seq_start_idx"], a0["seq_start_idx"] + 1)

    def test_uncapped_len(self):
        km = make_sorted([("c", "ATCGAATTAG")], 1, None)
        arrs = km.get_kmers_full_arrays(None)
        gen = list(km.get_kmers(None, kmer_info_to_yield="full"))
        assert list(arrs["kmer_len"]) == [g[4] for g in gen]


class TestGetKmerStrs:
    def test_matches_single_decodes(self):
        seq_list = [("a", random_seq(90, 51)), ("b", random_seq(40, 52))]
        km = make_sorted(seq_list, 5, 5)
        nums = list(range(len(km)))
        bulk = km.get_kmer_strs(nums, 5)
        assert bulk == [km.get_kmer_str(i, 5) for i in nums]

    def test_bounds_and_segment_errors(self):
        km = make_sorted([("a", "ACGTACGT")], 3, None)
        with pytest.raises(ValueError):
            km.get_kmer_strs([0, 99], 3)
        with pytest.raises(ValueError):
            km.get_kmer_strs([0], 0)
        # a 3-mer starting 2 from the end cannot extend to length 5
        tail_num = int(np.flatnonzero(km.kmer_sba_start_indices == 5)[0])
        with pytest.raises(ValueError):
            km.get_kmer_strs([tail_num], 5)

    def test_empty(self):
        km = make_sorted([("a", "ACGTACGT")], 3, 3)
        assert km.get_kmer_strs([], 3) == []


def test_to_csv_bulk_matches_slow_path(tmp_path):
    seq_list = [("a", random_seq(70, 61)), ("b", random_seq(50, 62))]
    km = make_sorted(seq_list, 4, 4)
    p1 = tmp_path / "bulk.csv"
    km.to_csv(4, p1, fields=["kmer", "kmer_num", "chrom", "start", "strand", "group_size"])
    # slow generator path (kmer_len=None branch) on an uncapped index
    km2 = make_sorted(seq_list, 4, None)
    p2 = tmp_path / "slow.csv"
    km2.to_csv(None, p2, fields=["kmer_num"])
    lines = p1.read_text().strip().split("\n")
    assert lines[0] == "kmer,kmer_num,chrom,start,strand,group_size"
    assert len(lines) == len(km) + 1
    # spot-check one row against the API
    kmer, num, chrom, start, strand, gs = lines[1].split(",")
    assert km.get_kmer_str(int(num), 4) == kmer
    assert strand == "+"
    assert dict(seq_list)[chrom][int(start):int(start)+4] == kmer


class TestInitFiltersAndDoublePass:
    """Init-time kmer_filters + method="double_pass" implemented for real
    via Kmers.from_strand (the reference declares both but raises,
    reference kmers.py:775-781)."""

    SEQS = [("a", "ACGTNNACGGCCTTAGGC"), ("b", "GGGCCCAATTNACG")]

    def _sc(self):
        return SequenceCollection(sequence_list=self.SEQS, strands_to_load="forward")

    def test_library_filter_prunes_index(self):
        from genome_kmers_tpu.ops.filters import NoAmbiguousBasesFilter

        sc = self._sc()
        km = Kmers.from_strand(sc, min_kmer_len=3, max_kmer_len=3,
                               kmer_filters=[NoAmbiguousBasesFilter(3)])
        # oracle: positions whose 3-mer is ACGT-only
        exp = []
        pos = 0
        for _, s in self.SEQS:
            for j in range(len(s) - 2):
                if set(s[j : j + 3]) <= set("ACGT"):
                    exp.append(pos + j)
            pos += len(s) + 1
        assert km.kmer_sba_start_indices.tolist() == exp
        # statistics equal query-time filtering of the unfiltered index
        km.sort()
        km_u = Kmers(self._sc(), min_kmer_len=3, max_kmer_len=3)
        km_u.sort()
        assert km.get_kmer_count(3) == km_u.get_kmer_count(
            3, kmer_filter_func=NoAmbiguousBasesFilter(3)
        )

    def test_double_pass_equals_single_pass(self):
        from genome_kmers_tpu.ops.filters import GcContentFilter

        for filters in ([], [GcContentFilter(0.4, 1.0, 3)]):
            km_s = Kmers.from_strand(self._sc(), min_kmer_len=3, max_kmer_len=3,
                                     method="single_pass", kmer_filters=filters)
            km_d = Kmers.from_strand(self._sc(), min_kmer_len=3, max_kmer_len=3,
                                     method="double_pass", kmer_filters=filters)
            np.testing.assert_array_equal(
                km_s.kmer_sba_start_indices, km_d.kmer_sba_start_indices
            )

    def test_multiple_filters_and_callable(self):
        from genome_kmers_tpu.ops.filters import NoAmbiguousBasesFilter

        def no_leading_g(sba, sba_strand, idx):
            return sba[idx] != ord("G")

        km = Kmers.from_strand(
            self._sc(), min_kmer_len=3, max_kmer_len=3,
            kmer_filters=[NoAmbiguousBasesFilter(3), no_leading_g],
        )
        exp = []
        pos = 0
        for _, s in self.SEQS:
            for j in range(len(s) - 2):
                if set(s[j : j + 3]) <= set("ACGT") and s[j] != "G":
                    exp.append(pos + j)
            pos += len(s) + 1
        assert km.kmer_sba_start_indices.tolist() == exp

    def test_both_strand_init_filters(self):
        def fwd_coords_only(sba, sba_strand, idx):
            # per-strand dispatch: idx must be strand-local
            assert 0 <= idx < len(sba) and sba[idx] != ord("$")
            return sba_strand == "forward"

        sc = SequenceCollection(
            sequence_list=[("a", "ACGTACGT")], strands_to_load="both"
        )
        km = Kmers.from_strand(sc, min_kmer_len=3, max_kmer_len=3,
                               source_strand="both",
                               kmer_filters=[fwd_coords_only])
        assert km.kmer_sba_start_indices.tolist() == list(range(6))

    def test_parity_errors_preserved(self):
        sc = self._sc()
        with pytest.raises(NotImplementedError, match="double_pass"):
            Kmers(sc, min_kmer_len=3, method="double_pass")
        km = Kmers(sc, min_kmer_len=3, max_kmer_len=3)
        with pytest.raises(NotImplementedError, match="kmer_filters"):
            km._initialize(kmer_filters=[lambda *a: True])
        with pytest.raises(ValueError, match="not recognized"):
            Kmers(sc, min_kmer_len=3, method="triple_pass")


class TestToCsvBulkParity:
    """to_csv's columnar bulk path must be byte-identical to the
    reference-shaped per-row writer (_to_csv_row_loop), including raise
    behavior, for every kmer_len mode and field combination."""

    FIELD_SETS = [
        ["kmer"],
        ["kmer", "kmer_num"],
        ["kmer", "chrom", "start", "strand"],
        ["kmer", "group_size"],
        ["kmer", "chrom", "group_size"],
        ["kmer_num"],
        ["kmer", "kmer_num", "chrom", "start", "strand", "group_size"],
    ]

    def _run(self, km, fn, kl, fields, tmp_path, name):
        p = tmp_path / name
        try:
            fn(kl, str(p), fields=fields)
            return p.read_bytes()
        except ValueError as e:
            return ("RAISE", str(e))

    @pytest.mark.parametrize("min_k,max_k", [(4, 4), (3, 8), (3, None), (1, None)])
    def test_bulk_matches_row_loop(self, min_k, max_k, tmp_path):
        seq_list = [("a", random_seq(70, 81)), ("b", random_seq(45, 82)),
                    ("c", random_seq(33, 83))]
        km = make_sorted(seq_list, min_k, max_k)
        for kl in (min_k, None):
            for fields in self.FIELD_SETS:
                bulk = self._run(km, km.to_csv, kl, fields, tmp_path, "b.csv")
                loop = self._run(km, km._to_csv_row_loop, kl, fields, tmp_path, "s.csv")
                assert bulk == loop, (min_k, max_k, kl, fields)

    @pytest.mark.parametrize("strand", ["reverse_complement", "both"])
    def test_bulk_matches_row_loop_strands(self, strand, tmp_path):
        seq_list = [("a", random_seq(60, 84)), ("b", random_seq(41, 85))]
        sc = SequenceCollection(sequence_list=seq_list, strands_to_load=strand)
        km = Kmers.from_strand(sc, min_kmer_len=3, max_kmer_len=None,
                               source_strand=strand)
        km.sort()
        for kl in (3, None):
            for fields in (["kmer", "chrom", "start", "strand"], ["kmer", "group_size"]):
                bulk = self._run(km, km.to_csv, kl, fields, tmp_path, "b.csv")
                loop = self._run(km, km._to_csv_row_loop, kl, fields, tmp_path, "s.csv")
                assert bulk == loop, (strand, kl, fields)

    def test_unbounded_kmer_len_none_raise_parity(self, tmp_path):
        # full-info + kmer_len=None feeds the UNCLAMPED length into
        # get_kmer_str in the row loop, which raises past max_kmer_len; the
        # bulk path must raise the identical message
        km = make_sorted([("a", random_seq(30, 86))], 3, 8)
        bulk = self._run(km, km.to_csv, None, ["kmer", "chrom"], tmp_path, "b.csv")
        loop = self._run(km, km._to_csv_row_loop, None, ["kmer", "chrom"], tmp_path, "s.csv")
        assert bulk == loop
        assert isinstance(bulk, tuple) and "greater than max_kmer_len" in bulk[1]
        # ...while minimum info clamps and does not raise
        bulk2 = self._run(km, km.to_csv, None, ["kmer"], tmp_path, "b2.csv")
        assert not isinstance(bulk2, tuple)


def test_get_kmer_strs_kmer_len_none():
    km = make_sorted([("a", random_seq(40, 87)), ("b", random_seq(25, 88))], 3, 9)
    nums = list(range(len(km)))
    assert km.get_kmer_strs(nums, None) == [km.get_kmer_str(i, None) for i in nums]
    km2 = make_sorted([("a", random_seq(30, 89))], 2, None)
    nums2 = list(range(len(km2)))
    assert km2.get_kmer_strs(nums2, None) == [km2.get_kmer_str(i, None) for i in nums2]
