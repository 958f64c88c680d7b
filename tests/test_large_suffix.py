"""LargeKmers suffix mode (max_kmer_len=None) and beyond-window bounds —
the round-5 ceiling lift: the reference supports unbounded-suffix sorting
for any index it can hold (reference kmers.py:315-316, 391-393) but
hard-fails past 2^32 k-mers; the 64-bit regime now supports the same
semantics via the pair-gid iterative refinement
(parallel.sample_sort.sample_sort_positions_large_unbounded). Small-genome
runs are pinned exactly against the uint32 Kmers engine; the >2^32 suffix
case lives in test_large.py (TestPast2p32Suffix).

Also covers track_strands_separately in the large regime (strand-split
group statistics — the reference declares the flag but raises, reference
kmers.py:689-692).
"""

import numpy as np
import pytest

from genome_kmers_tpu import Kmers, LargeKmers, SequenceCollection
from genome_kmers_tpu.ops.filters import GcContentFilter
from genome_kmers_tpu.parallel.distributed import make_mesh


def _random_seqs(seed, lens=(300, 200)):
    rng = np.random.default_rng(seed)
    return [
        (f"r{i}", "".join(rng.choice(list("ACGT"), n)))
        for i, n in enumerate(lens)
    ]


def _repeat_seqs(seed, n=1200, period=40, muts=12):
    """Tiled-motif genome: ties extend ~n/mutation-spacing bases, so the
    refinement loop runs several 64-base rounds."""
    rng = np.random.default_rng(seed)
    motif = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=period)
    sba = np.tile(motif, n // period + 1)[:n].copy()
    idx = rng.choice(n, size=muts, replace=False)
    sba[idx] = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=muts)
    return [("rep", sba.tobytes().decode())]


def _assert_counts(lk_counts, lk_total, km_counts, km_total, bins):
    np.testing.assert_array_equal(
        np.asarray(lk_counts)[: bins + 1].astype(np.int64),
        np.asarray(km_counts)[: bins + 1],
    )
    assert lk_total == int(km_total)


class TestSuffixModeParity:
    """Suffix-mode LargeKmers == uint32 Kmers on genomes both hold."""

    @pytest.mark.parametrize("seqs_fn", [_random_seqs, _repeat_seqs])
    def test_sort_stats_parity(self, seqs_fn):
        seqs = seqs_fn(11)
        sc = SequenceCollection(sequence_list=seqs, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=1, max_kmer_len=None)
        km.sort()
        lk = LargeKmers.from_records(seqs, 1, None)
        assert not lk._one_window
        lk.sort(make_mesh(4))
        np.testing.assert_array_equal(
            lk.sorted_positions(), km.kmer_sba_start_indices.astype(np.uint64)
        )
        # suffix identity (kmer_len=None) and bounded refinements
        for K in (None, 3, 7):
            wc, wt = km.get_kmer_group_counts(K, max_counts_bin=20)
            c, t = lk.get_kmer_group_counts(K, max_counts_bin=20)
            _assert_counts(c, t, wc, wt, 20)
        wc, wt = km.get_kmer_group_counts(
            None, min_group_size=2, max_counts_bin=20
        )
        c, t = lk.get_kmer_group_counts(None, min_group_size=2, max_counts_bin=20)
        _assert_counts(c, t, wc, wt, 20)

    def test_extraction_parity(self, tmp_path):
        seqs = _random_seqs(7, lens=(120, 90))
        sc = SequenceCollection(sequence_list=seqs, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=1, max_kmer_len=None)
        km.sort()
        lk = LargeKmers.from_records(seqs, 1, None)
        lk.sort(make_mesh(4))
        # per-row natural-length strings
        want = [km.get_kmer_str(i, None) for i in range(8)]
        assert lk.get_kmer_strs(list(range(8)), None) == want
        # full arrays carry per-row suffix lengths
        fa_k = km.get_kmers_full_arrays(None)
        fa_l = lk.get_kmers_full_arrays(None)
        for col in ("kmer_num", "record_num", "seq_start_idx", "kmer_len"):
            np.testing.assert_array_equal(fa_k[col], fa_l[col])
        # byte-identical variable-width CSV
        km.to_csv(None, tmp_path / "k.csv",
                  fields=["kmer", "chrom", "start", "strand", "group_size"])
        lk.to_csv(None, tmp_path / "l.csv",
                  fields=["kmer", "chrom", "start", "strand", "group_size"])
        assert (tmp_path / "k.csv").read_bytes() == (tmp_path / "l.csv").read_bytes()
        # generator parity ("full" yields natural lengths)
        assert list(lk.get_kmers(None, kmer_info_to_yield="full"))[:10] == list(
            km.get_kmers(None, kmer_info_to_yield="full")
        )[:10]

    def test_filtered_stats_and_error_parity(self):
        seqs = _random_seqs(3, lens=(300, 200))
        f = GcContentFilter(0.3, 0.7, 8)
        sc = SequenceCollection(sequence_list=seqs, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=8, max_kmer_len=None)
        km.sort()
        lk = LargeKmers.from_records(seqs, 8, None)
        lk.sort(make_mesh(4))
        for K in (None, 8):
            wc, wt = km.get_kmer_group_counts(K, kmer_filter_func=f, max_counts_bin=20)
            c, t = lk.get_kmer_group_counts(K, kmer_filter_func=f, max_counts_bin=20)
            _assert_counts(c, t, wc, wt, 20)
        # reference error parity: the filter hits a too-short suffix row
        kmE = Kmers(sc, min_kmer_len=1, max_kmer_len=None)
        kmE.sort()
        lkE = LargeKmers.from_records(seqs, 1, None)
        lkE.sort(make_mesh(4))
        with pytest.raises(ValueError) as e_w:
            kmE.get_kmer_group_counts(None, kmer_filter_func=f, max_counts_bin=20)
        with pytest.raises(ValueError) as e_l:
            lkE.get_kmer_group_counts(None, kmer_filter_func=f, max_counts_bin=20)
        assert str(e_w.value) == str(e_l.value)

    def test_beyond_window_bounded(self):
        """A bounded max_kmer_len past the one-window limit (80 > 64) takes
        the refinement sort; parity vs the uint32 engine at the same k."""
        seqs = _repeat_seqs(9, n=900, period=30, muts=10)
        sc = SequenceCollection(sequence_list=seqs, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=1, max_kmer_len=80)
        km.sort()
        lk = LargeKmers.from_records(seqs, 1, 80)
        lk.sort(make_mesh(4))
        np.testing.assert_array_equal(
            lk.sorted_positions(), km.kmer_sba_start_indices.astype(np.uint64)
        )
        for K in (None, 80, 31):
            wc, wt = km.get_kmer_group_counts(K, max_counts_bin=20)
            c, t = lk.get_kmer_group_counts(K, max_counts_bin=20)
            _assert_counts(c, t, wc, wt, 20)
        with pytest.raises(ValueError, match="kmer_len"):
            lk.get_kmer_group_counts(81)

    def test_kmer_len_none_on_one_window_build(self):
        """Reference parity: ``kmer_len=None`` means UNBOUNDED suffix
        identity even on a bounded one-window build (the reference walk
        compares adjacent survivors to the segment end regardless of the
        index's max_kmer_len, reference kmers.py:315-316)."""
        seqs = [("a", "ACGTACGTAACGTC")]
        sc = SequenceCollection(sequence_list=seqs, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=1, max_kmer_len=4)
        km.sort()
        lk = LargeKmers.from_records(seqs, 1, 4)
        assert lk._one_window
        lk.sort(make_mesh(2))
        for K in (None, 4):
            wc, wt = km.get_kmer_group_counts(K, max_counts_bin=20)
            c, t = lk.get_kmer_group_counts(K, max_counts_bin=20)
            _assert_counts(c, t, wc, wt, 20)
        # extraction at None clamps to max_kmer_len, like the uint32 engine
        want = [km.get_kmer_str(i, None) for i in range(len(km))]
        assert lk.get_kmer_strs(list(range(len(km))), None) == want

    def test_four_bit_suffix(self):
        """IUPAC (4-bit) genomes take the 32-base-window refinement."""
        rng = np.random.default_rng(5)
        seqs = [("n", "".join(rng.choice(list("ACGTN"), 400, p=[0.24] * 4 + [0.04])))]
        sc = SequenceCollection(sequence_list=seqs, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=1, max_kmer_len=None)
        km.sort()
        lk = LargeKmers.from_records(seqs, 1, None)
        assert not lk.two_bit
        lk.sort(make_mesh(4))
        np.testing.assert_array_equal(
            lk.sorted_positions(), km.kmer_sba_start_indices.astype(np.uint64)
        )
        wc, wt = km.get_kmer_group_counts(None, max_counts_bin=20)
        c, t = lk.get_kmer_group_counts(None, max_counts_bin=20)
        _assert_counts(c, t, wc, wt, 20)

    def test_checkpoint_restore_rebuilds_gid(self, tmp_path):
        """Suffix-mode checkpoint restore onto a DIFFERENT mesh: converged
        run ids are not persisted, so stats after restore rebuild identity
        lazily (distributed_adjacent_gids_large)."""
        seqs = _random_seqs(13, lens=(150, 110))
        lk = LargeKmers.from_records(seqs, 1, None)
        lk.sort(make_mesh(4))
        want_c, want_t = lk.get_kmer_group_counts(None, max_counts_bin=20)
        lk.save_checkpoint(tmp_path / "ck")
        lk2 = LargeKmers.from_records(seqs, 1, None)
        lk2.load_checkpoint(tmp_path / "ck", make_mesh(2))
        assert not lk2._gid_cache  # nothing retained
        c, t = lk2.get_kmer_group_counts(None, max_counts_bin=20)
        np.testing.assert_array_equal(np.asarray(c), np.asarray(want_c))
        assert t == want_t

    def test_count_queries_on_suffix_index(self):
        """Bounded-length queries binary-search the suffix order (which
        refines every bounded order)."""
        seqs = _random_seqs(17, lens=(250,))
        sc = SequenceCollection(sequence_list=seqs, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=1, max_kmer_len=None)
        km.sort()
        lk = LargeKmers.from_records(seqs, 1, None)
        lk.sort(make_mesh(4))
        queries = [seqs[0][1][i : i + 9] for i in (0, 40, 77)] + ["ACGTACGTA"]
        want = km.count_queries(queries, 9)
        got = lk.count_queries(queries, 9)
        assert got.tolist() == list(map(int, want))


class TestTrackStrandsLarge:
    """track_strands_separately in the 64-bit regime == Kmers.from_strand
    with the flag, for bounded AND suffix identity."""

    SEQS = [("a", "ACGTACGTACGGTTAC"), ("b", "GGCCAATTACGTACGT")]

    @pytest.mark.parametrize("max_k", [4, None])
    def test_matches_from_strand(self, max_k):
        mn = 4 if max_k == 4 else 1
        sc = SequenceCollection(sequence_list=self.SEQS, strands_to_load="both")
        km = Kmers.from_strand(
            sc, min_kmer_len=mn, max_kmer_len=max_k, source_strand="both",
            track_strands_separately=True,
        )
        km.sort()
        lk = LargeKmers.from_records(
            self.SEQS, mn, max_k, both_strands=True,
            track_strands_separately=True,
        )
        lk.sort(make_mesh(4))
        np.testing.assert_array_equal(
            lk.sorted_positions(), km.kmer_sba_start_indices.astype(np.uint64)
        )
        for K in (max_k, 3):
            wc, wt = km.get_kmer_group_counts(K, max_counts_bin=20)
            c, t = lk.get_kmer_group_counts(K, max_counts_bin=20)
            _assert_counts(c, t, wc, wt, 20)

    def test_split_vs_joint_totals(self):
        """Strand-split groups refine the joint groups: same total rows,
        never fewer groups."""
        lk_joint = LargeKmers.from_records(self.SEQS, 4, 4, both_strands=True)
        lk_split = LargeKmers.from_records(
            self.SEQS, 4, 4, both_strands=True, track_strands_separately=True
        )
        mesh = make_mesh(2)
        lk_joint.sort(mesh)
        lk_split.sort(mesh)
        cj, tj = lk_joint.get_kmer_group_counts(4, max_counts_bin=20)
        cs, ts = lk_split.get_kmer_group_counts(4, max_counts_bin=20)
        assert tj == ts
        assert cs.sum() >= cj.sum()


class TestFromFasta:
    """LargeKmers.from_fasta: streaming record ingestion with the
    SequenceCollection loader's parsing rules."""

    def test_matches_from_records(self, tmp_path):
        rng = np.random.default_rng(19)
        seqs = [
            ("chrA", "".join(rng.choice(list("ACGT"), 200))),
            ("chrB", "".join(rng.choice(list("ACGT"), 150))),
        ]
        fa = tmp_path / "g.fa"
        # lowercase + wrapped lines + CRLF: the loader normalizes all three
        fa.write_bytes(
            (
                ">chrA extra description\r\n"
                + seqs[0][1][:100].lower() + "\r\n" + seqs[0][1][100:] + "\n"
                + ">chrB\n" + seqs[1][1] + "\n"
            ).encode()
        )
        lk = LargeKmers.from_fasta(fa, 1, None)
        lk_r = LargeKmers.from_records(seqs, 1, None)
        np.testing.assert_array_equal(lk.packed_words, lk_r.packed_words)
        np.testing.assert_array_equal(lk.seg_starts, lk_r.seg_starts)
        assert lk.record_names == ["chrA", "chrB"]
        mesh = make_mesh(2)
        lk.sort(mesh)
        sc = SequenceCollection(sequence_list=seqs, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=1, max_kmer_len=None)
        km.sort()
        np.testing.assert_array_equal(
            lk.sorted_positions(), km.kmer_sba_start_indices.astype(np.uint64)
        )

    def test_error_parity(self, tmp_path):
        fa = tmp_path / "bad.fa"
        fa.write_text(">a\nACGT\n>a\nGGTT\n")
        with pytest.raises(ValueError, match="Repeated record name"):
            LargeKmers.from_fasta(fa, 1, 4, two_bit=True)
        fa2 = tmp_path / "empty.fa"
        fa2.write_text(">a\nACGT\n>b\n>c\nGG\n")
        with pytest.raises(ValueError, match="empty sequence"):
            LargeKmers.from_fasta(fa2, 1, 2, two_bit=True)

    def test_trailing_empty_record_skipped(self, tmp_path):
        """The reference loader ACCEPTS a trailing empty record (preserved
        quirk); the large-regime iterator maps that acceptance to skipping
        the phantom record."""
        fa = tmp_path / "trail.fa"
        fa.write_text(">a\nACGTACGT\n>b\n")
        lk = LargeKmers.from_fasta(fa, 1, 4, two_bit=True)
        assert lk.record_names == ["a"]
        # mid-file empties still raise
        fa2 = tmp_path / "mid.fa"
        fa2.write_text(">a\nACGT\n>b\n>c\nGG\n")
        with pytest.raises(ValueError, match="empty sequence"):
            LargeKmers.from_fasta(fa2, 1, 2, two_bit=True)

    def test_preamble_bytes_rejected(self, tmp_path):
        """Bytes before the first '>' header (malformed FASTA) raise loudly
        in the large-regime iterator — the whole-buffer parser's keep-mask
        quirk splits such bytes ACROSS records, so silently indexing the
        file would give a different genome than the Kmers path."""
        from genome_kmers_tpu.io.fasta import iter_fasta_records

        fa = tmp_path / "pre.fa"
        fa.write_bytes(b"ACGTACGTAAAA\n>a\nACGT\n>b\nGGTT\n")
        with pytest.raises(ValueError, match="before the first"):
            list(iter_fasta_records(fa))


def test_suffix_filtered_arrays_parity():
    """Filtered bulk-array extraction at suffix identity (kmer_len=None +
    a lanes filter + yield_first_n) matches the uint32 engine row for row —
    the composition of _rows_for_arrays, ext_gid identity, and the lanes
    filter mask."""
    rng = np.random.default_rng(8)
    seqs = [
        ("a", "".join(rng.choice(list("ACGT"), 260))),
        ("b", "".join(rng.choice(list("ACGT"), 180))),
    ]
    sc = SequenceCollection(sequence_list=seqs, strands_to_load="forward")
    km = Kmers(sc, min_kmer_len=8, max_kmer_len=None)
    km.sort()
    lk = LargeKmers.from_records(seqs, 8, None)
    lk.sort(make_mesh(4))
    f = GcContentFilter(0.3, 0.7, 8)
    for kw in (dict(), dict(min_group_size=1, yield_first_n=2)):
        a = km.get_kmers_arrays(None, kmer_filter_func=f, **kw)
        b = lk.get_kmers_arrays(None, kmer_filter_func=f, **kw)
        for i in range(4):
            np.testing.assert_array_equal(
                np.asarray(a[i]).astype(np.int64),
                np.asarray(b[i]).astype(np.int64),
            )
