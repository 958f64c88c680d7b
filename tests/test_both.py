"""Real ``source_strand="both"`` + ``track_strands_separately`` support
(Kmers.from_strand — EXTENSION; the plain constructor preserves the
reference's NotImplementedError, reference kmers.py:689-696).

Oracle: the both-strand index is defined over the virtual concatenated SBA
``forward + '$' + revcomp`` (SequenceCollection.both_concat_arrays), so the
expected k-mer set is every forward k-mer plus every revcomp-SBA k-mer,
sorted by (string, concatenated position) — forward entries before
reverse entries within an equal-string run. Collapsed groups count equal
strings across strands; track_strands_separately splits them by strand."""

from collections import Counter

import numpy as np
import pytest

from genome_kmers_tpu import Kmers, SequenceCollection
from genome_kmers_tpu.parallel import make_mesh

_COMP = str.maketrans("ACGT", "TGCA")

SEQ_LIST = [
    ("chr1", "ACGTTAGGCATTACGGATCCAAGGTT"),
    ("chr2", "GGGTTTAAACCCGGGACGT"),
    ("chr3", "ATATATATCGCGCG"),
]


def _rc(s: str) -> str:
    return s.translate(_COMP)[::-1]


def both_oracle(seq_list, k):
    """All (kmer, concat_pos, strand, record_name, fwd_seq_idx) entries of
    length k, reconstructed from the raw strings alone."""
    entries = []
    pos = 0
    for name, s in seq_list:
        for j in range(len(s) - k + 1):
            entries.append((s[j : j + k], pos + j, "+", name, j))
        pos += len(s) + 1
    # pos == len(forward_sba) + 1 == first index of the revcomp half
    for name, s in reversed(seq_list):
        rs = _rc(s)
        for j in range(len(rs) - k + 1):
            # revcomp convention: seq_idx is the FORWARD coordinate,
            # counted from the segment's right edge
            entries.append((rs[j : j + k], pos + j, "-", name, len(s) - 1 - j))
        pos += len(s) + 1
    return entries


@pytest.fixture(scope="module")
def sc_both():
    return SequenceCollection(sequence_list=SEQ_LIST, strands_to_load="both")


@pytest.fixture(scope="module")
def km_sorted(sc_both):
    km = Kmers.from_strand(sc_both, min_kmer_len=4, max_kmer_len=4, source_strand="both")
    km.sort()
    return km


@pytest.fixture(scope="module")
def km_sep(sc_both):
    km = Kmers.from_strand(
        sc_both, min_kmer_len=4, max_kmer_len=4, source_strand="both",
        track_strands_separately=True,
    )
    km.sort()
    return km


class TestBothStrandIndex:
    def test_unsorted_enumeration(self, sc_both):
        km = Kmers.from_strand(sc_both, min_kmer_len=4, max_kmer_len=4,
                               source_strand="both")
        exp = [p for (_, p, _, _, _) in both_oracle(SEQ_LIST, 4)]
        assert km.kmer_sba_start_indices.tolist() == exp
        assert len(km) == len(exp)

    def test_sorted_order_matches_oracle(self, km_sorted):
        exp = sorted(both_oracle(SEQ_LIST, 4), key=lambda t: (t[0], t[1]))
        got_pos = km_sorted.kmer_sba_start_indices.tolist()
        assert got_pos == [p for (_, p, _, _, _) in exp]
        got_strs = km_sorted.get_kmer_strs(list(range(len(got_pos))), 4)
        assert got_strs == [s for (s, _, _, _, _) in exp]

    def test_collapsed_group_counts(self, km_sorted):
        by_str = Counter(s for (s, _, _, _, _) in both_oracle(SEQ_LIST, 4))
        counts, total = km_sorted.get_kmer_group_counts(4, max_counts_bin=50)
        exp_hist = Counter(by_str.values())
        for size in range(1, 51):
            assert counts[size] == exp_hist.get(size, 0), size
        assert total == sum(by_str.values())
        assert km_sorted.get_kmer_count(4) == total

    def test_separate_group_counts(self, km_sep):
        by_pair = Counter((s, st) for (s, _, st, _, _) in both_oracle(SEQ_LIST, 4))
        counts, total = km_sep.get_kmer_group_counts(4, max_counts_bin=50)
        exp_hist = Counter(by_pair.values())
        for size in range(1, 51):
            assert counts[size] == exp_hist.get(size, 0), size
        assert total == sum(by_pair.values())

    def test_separate_vs_collapsed_relationship(self, km_sorted, km_sep):
        # every collapsed group splits into 1 or 2 strand groups; totals agree
        _, t_collapsed = km_sorted.get_kmer_group_counts(4)
        _, t_sep = km_sep.get_kmer_group_counts(4)
        assert t_collapsed == t_sep

    @pytest.mark.parametrize("mgs,xgs,yfn", [(1, None, None), (2, None, 1), (1, 2, 2)])
    def test_get_kmers_walk(self, km_sorted, mgs, xgs, yfn):
        exp_sorted = sorted(both_oracle(SEQ_LIST, 4), key=lambda t: (t[0], t[1]))
        # oracle group walk over sorted entries (collapsed identity)
        groups = []
        i = 0
        while i < len(exp_sorted):
            j = i
            while j < len(exp_sorted) and exp_sorted[j][0] == exp_sorted[i][0]:
                j += 1
            groups.append((i, j - i))
            i = j
        exp = []
        for start, size in groups:
            if size < mgs or (xgs is not None and size > xgs):
                continue
            n_yield = size if yfn is None else min(size, yfn)
            for r in range(n_yield):
                exp.append((start + r, n_yield, size))
        got = list(
            km_sorted.get_kmers(4, min_group_size=mgs, max_group_size=xgs,
                                yield_first_n=yfn)
        )
        assert [(k, g, t) for k, g, t in got] == exp

    def test_full_info(self, km_sorted):
        exp = sorted(both_oracle(SEQ_LIST, 4), key=lambda t: (t[0], t[1]))
        got = list(km_sorted.get_kmers(4, kmer_info_to_yield="full"))
        assert len(got) == len(exp)
        for (kn, strand, chrom, seq_idx, klen, gsy, gst), (s, p, est, ename, eidx) in zip(
            got, exp
        ):
            assert strand == est
            assert chrom == ename
            assert seq_idx == eidx
            assert klen == 4

    def test_full_arrays_match_generator(self, km_sorted):
        gen = list(km_sorted.get_kmers(4, kmer_info_to_yield="full"))
        arrs = km_sorted.get_kmers_full_arrays(4)
        names = km_sorted.seq_coll.forward_record_names
        assert len(gen) == len(arrs["kmer_num"])
        for i, (kn, strand, chrom, start, klen, gsy, gst) in enumerate(gen):
            assert int(arrs["kmer_num"][i]) == kn
            assert str(arrs["strand"][i]) == strand
            assert names[int(arrs["record_num"][i])] == chrom
            assert int(arrs["seq_start_idx"][i]) == start
            assert int(arrs["group_size_total"][i]) == gst

    def test_library_filter(self, km_sorted):
        from genome_kmers_tpu.ops.filters import GcContentFilter

        f = GcContentFilter(0.5, 1.0, 4)

        def gc(s):
            return sum(c in "GC" for c in s) / len(s)

        by_str = Counter(
            s for (s, _, _, _, _) in both_oracle(SEQ_LIST, 4) if gc(s) >= 0.5
        )
        assert km_sorted.get_kmer_count(4, kmer_filter_func=f) == sum(by_str.values())

    def test_user_callable_filter_strand_dispatch(self, km_sorted):
        seen = set()

        def fwd_only(sba, sba_strand, idx):
            seen.add(sba_strand)
            assert sba_strand in ("forward", "reverse_complement")
            # idx must be valid in THIS strand's own SBA coordinates
            assert 0 <= idx < len(sba) and sba[idx] != ord("$")
            return sba_strand == "forward"

        n_fwd = sum(1 for (_, _, st, _, _) in both_oracle(SEQ_LIST, 4) if st == "+")
        assert km_sorted.get_kmer_count(4, kmer_filter_func=fwd_only) == n_fwd
        assert seen == {"forward", "reverse_complement"}

    def test_count_queries_counts_both_strands(self, km_sorted):
        by_str = Counter(s for (s, _, _, _, _) in both_oracle(SEQ_LIST, 4))
        queries = ["ACGT", "GGAT", "TTTT"]
        got = km_sorted.count_queries(queries, 4)
        assert got.tolist() == [by_str.get(q, 0) for q in queries]

    def test_get_kmer_str(self, km_sorted):
        exp = sorted(both_oracle(SEQ_LIST, 4), key=lambda t: (t[0], t[1]))
        for i in (0, 1, len(exp) // 2, len(exp) - 1):
            assert km_sorted.get_kmer_str(i, 4) == exp[i][0]

    def test_to_csv_strands(self, km_sorted, tmp_path):
        out = tmp_path / "both.csv"
        km_sorted.to_csv(4, str(out), fields=["kmer", "strand", "chrom", "start"])
        lines = out.read_text().strip().split("\n")
        exp = sorted(both_oracle(SEQ_LIST, 4), key=lambda t: (t[0], t[1]))
        assert lines[0] == "kmer,strand,chrom,start"
        assert len(lines) == len(exp) + 1
        for line, (s, _, st, name, idx) in zip(lines[1:], exp):
            assert line == f"{s},{st},{name},{idx}"

    def test_save_load_round_trip(self, km_sep, tmp_path):
        km_sep.save(str(tmp_path / "both.h5"), include_sequence_collection=True)
        km_l = Kmers()
        km_l.load(str(tmp_path / "both.h5"))
        assert km_l.kmer_source_strand == "both"
        assert km_l.track_strands_separately is True
        assert km_l == km_sep
        _, t1 = km_l.get_kmer_group_counts(4)
        _, t2 = km_sep.get_kmer_group_counts(4)
        assert t1 == t2

    def test_unbounded_sort(self, sc_both):
        km = Kmers.from_strand(sc_both, min_kmer_len=1, max_kmer_len=None,
                               source_strand="both")
        km.sort()
        # oracle: suffixes-until-$ of the concatenated SBA
        sba, starts = sc_both.both_concat_arrays()
        text = bytearray(sba).decode()
        segs = []
        ends = list(starts[1:] - 2) + [len(sba) - 1]
        suffixes = []
        for s, e in zip(starts, ends):
            for p in range(int(s), int(e) + 1):
                suffixes.append((text[p : int(e) + 1], p))
        suffixes.sort()
        assert km.kmer_sba_start_indices.tolist() == [p for _, p in suffixes]

    def test_mesh_pipeline_collapsed(self, sc_both, km_sorted):
        mesh = make_mesh(8)
        km_m = Kmers.from_strand(sc_both, min_kmer_len=4, max_kmer_len=4,
                                 source_strand="both")
        km_m.sort(mesh=mesh)
        np.testing.assert_array_equal(
            km_m.kmer_sba_start_indices, km_sorted.kmer_sba_start_indices
        )
        c1, t1 = km_m.get_kmer_group_counts(4, max_counts_bin=50, mesh=mesh)
        c2, t2 = km_sorted.get_kmer_group_counts(4, max_counts_bin=50)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        assert int(t1) == int(t2)

    def test_mesh_separate_matches_single_chip(self, sc_both, km_sep):
        # strand-split groups on the mesh: one extra identity lane in the
        # distributed kernel (positions >= split)
        mesh = make_mesh(8)
        km_m = Kmers.from_strand(sc_both, min_kmer_len=4, max_kmer_len=4,
                                 source_strand="both",
                                 track_strands_separately=True)
        km_m.sort(mesh=mesh)
        c1, t1 = km_m.get_kmer_group_counts(4, max_counts_bin=50, mesh=mesh)
        c2, t2 = km_sep.get_kmer_group_counts(4, max_counts_bin=50)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        assert int(t1) == int(t2)
        # no-cache path (fresh sample sort inside the stats call)
        km_m2 = Kmers.from_strand(sc_both, min_kmer_len=4, max_kmer_len=4,
                                  source_strand="both",
                                  track_strands_separately=True)
        km_m2.sort()
        c3, t3 = km_m2.get_kmer_group_counts(4, max_counts_bin=50, mesh=mesh)
        np.testing.assert_array_equal(np.asarray(c3), np.asarray(c2))
        assert int(t3) == int(t2)

    def test_parity_errors_preserved(self, sc_both):
        with pytest.raises(NotImplementedError, match="track_strands_separately"):
            Kmers(sc_both, source_strand="both", track_strands_separately=True)
        with pytest.raises(NotImplementedError, match="source_strand"):
            Kmers(sc_both, source_strand="both")
        with pytest.raises(ValueError, match="track_strands_separately"):
            Kmers.from_strand(sc_both, source_strand="forward",
                              track_strands_separately=True)
        km = Kmers.from_strand(sc_both, min_kmer_len=4, max_kmer_len=4,
                               source_strand="both")
        km.sort()
        with pytest.raises(NotImplementedError, match="single-strand"):
            km.get_canonical_kmer_group_counts(4)
        with pytest.raises(NotImplementedError, match="single-strand"):
            km.count_queries_canonical(["ACGT"], 4)

    def test_strand_mismatch_rejected(self):
        sc_f = SequenceCollection(sequence_list=SEQ_LIST, strands_to_load="forward")
        with pytest.raises(ValueError, match="does not match"):
            Kmers.from_strand(sc_f, source_strand="both")


_IUPAC_COMP = str.maketrans("ACGTRYSWKMBDHVN", "TGCAYRSWMKVHDBN")


class TestBothStrandIupac:
    """The 4-bit path (N/IUPAC genomes rule out 2-bit keys): ambiguous
    bases sort by ASCII byte value (SURVEY.md gotcha 9) and complement by
    IUPAC pairs."""

    SEQS = [
        ("c1", "ACGTNNACGTRYKM"),
        ("c2", "GGNNCCATSWBD"),
    ]

    def _oracle(self, k):
        entries = []
        pos = 0
        for _, s in self.SEQS:
            for j in range(len(s) - k + 1):
                entries.append((s[j : j + k], pos + j))
            pos += len(s) + 1
        for _, s in reversed(self.SEQS):
            rs = s.translate(_IUPAC_COMP)[::-1]
            for j in range(len(rs) - k + 1):
                entries.append((rs[j : j + k], pos + j))
            pos += len(s) + 1
        return sorted(entries, key=lambda t: (t[0], t[1]))

    def test_sorted_order_and_counts(self):
        sc = SequenceCollection(sequence_list=self.SEQS, strands_to_load="both")
        km = Kmers.from_strand(sc, min_kmer_len=3, max_kmer_len=3,
                               source_strand="both")
        km.sort()
        exp = self._oracle(3)
        assert km.kmer_sba_start_indices.tolist() == [p for _, p in exp]
        assert km.get_kmer_strs(list(range(len(exp))), 3) == [s for s, _ in exp]
        by_str = Counter(s for s, _ in exp)
        counts, total = km.get_kmer_group_counts(3, max_counts_bin=20)
        exp_hist = Counter(by_str.values())
        for size in range(1, 21):
            assert counts[size] == exp_hist.get(size, 0), size
        assert total == sum(by_str.values())

    def test_separate_tracking(self):
        sc = SequenceCollection(sequence_list=self.SEQS, strands_to_load="both")
        km = Kmers.from_strand(sc, min_kmer_len=3, max_kmer_len=3,
                               source_strand="both", track_strands_separately=True)
        km.sort()
        n_fwd = sum(len(s) - 2 for _, s in self.SEQS)
        pairs = Counter(
            (s, "-" if p >= km._revcomp_offset() else "+") for s, p in self._oracle(3)
        )
        counts, total = km.get_kmer_group_counts(3, max_counts_bin=20)
        exp_hist = Counter(pairs.values())
        for size in range(1, 21):
            assert counts[size] == exp_hist.get(size, 0), size
        assert total == 2 * n_fwd
