"""Device-kernel unit tests: encodings, key packing, segment math, and
segmented group ops — exercised directly against NumPy references (the analog
of the reference's low-level @jit kernel tests,
tests/test_sequence_collection.py:1322-1405).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from genome_kmers_tpu.ops.encoding import (
    ALLOWED_CHARS,
    RANK_TABLE,
    pack_rank_words_np,
    reverse_complement_bytes,
)
from genome_kmers_tpu.ops.groups import group_geometry, group_size_histogram, selection_masks
from genome_kmers_tpu.ops.keys import (
    compute_seg_ends,
    compute_valid_len,
    pack_rank_words,
    segment_ids_for_positions,
)


def _sba(s):
    return np.frombuffer(s.encode(), dtype=np.uint8).copy()


class TestEncoding:
    def test_rank_order_matches_ascii_order(self):
        """Rank order == ASCII order == reference byte-compare order."""
        assert ALLOWED_CHARS == "".join(sorted(ALLOWED_CHARS))
        ranks = [RANK_TABLE[ord(c)] for c in ALLOWED_CHARS]
        assert ranks == sorted(ranks)
        assert RANK_TABLE[ord("$")] == 0

    def test_pack_device_equals_host(self):
        rng = np.random.default_rng(3)
        chars = np.frombuffer(b"ACGTN$RY", dtype=np.uint8)
        sba = rng.choice(chars, size=100)
        host = pack_rank_words_np(sba)
        dev = np.asarray(pack_rank_words(jnp.asarray(sba)))
        assert np.array_equal(host, dev)

    def test_packed_word_comparison_equals_string_comparison(self):
        """uint32 compare of packed words == lexicographic byte compare for
        8-base windows, including '$'-pad-low semantics."""
        strings = ["ACGTACGT", "ACGTACGA", "ACG", "ACGT", "TTTTTTTT", "A", "N", "AN"]
        for a in strings:
            for b in strings:
                pa = pack_rank_words_np(_sba(a))[0]
                pb = pack_rank_words_np(_sba(b))[0]
                # 8-base-window compare: shorter-prefix-equal => smaller
                exp = (a < b) if not (a.startswith(b) or b.startswith(a)) else (len(a) < len(b))
                got = pa < pb
                assert bool(got) == exp, (a, b)

    def test_reverse_complement_bytes(self):
        assert bytearray(reverse_complement_bytes(_sba("ACGT$N"))).decode() == "N$ACGT"

    def test_pack_rank2_words(self):
        from genome_kmers_tpu.ops.keys import pack_rank2_words

        sba = _sba("ACGT" * 5)
        dev = np.asarray(pack_rank2_words(jnp.asarray(sba)))
        # P2[0] packs A,C,G,T x 4 = 0b00011011 x 4 = 0x1B1B1B1B
        assert dev[0] == 0x1B1B1B1B
        # near the end, missing bases pack as 0
        assert dev[16] == np.uint32(0x1B000000)

    def test_2bit_sort_cap_lane_rule(self):
        """'AA' (to segment end) must sort before 'AAA' on the 2-bit path —
        the rank(A)=0 ambiguity the cap lane exists to resolve."""
        from genome_kmers_tpu.ops.keys import pack_rank2_words
        from genome_kmers_tpu.ops.sort import sort_positions

        sba = _sba("AAA$AA")
        packed2 = pack_rank2_words(jnp.asarray(sba))
        positions = jnp.asarray(np.array([0, 4], dtype=np.uint32))
        cap = jnp.asarray(np.array([3, 2], dtype=np.uint32))
        out = np.asarray(sort_positions(None, positions, cap, 32, packed2=packed2))
        assert list(out) == [4, 0]


class TestSegmentMath:
    def test_seg_ends(self):
        starts = jnp.asarray(np.array([0, 11, 24], dtype=np.uint32))
        ends = np.asarray(compute_seg_ends(starts, 37))
        assert list(ends) == [9, 22, 36]

    def test_segment_ids(self):
        starts = jnp.asarray(np.array([0, 11, 24], dtype=np.uint32))
        pos = jnp.asarray(np.array([0, 9, 10, 11, 23, 24, 36], dtype=np.uint32))
        ids = np.asarray(segment_ids_for_positions(pos, starts))
        assert list(ids) == [0, 0, 0, 1, 1, 2, 2]

    def test_valid_len(self):
        starts = jnp.asarray(np.array([0, 11, 24], dtype=np.uint32))
        ends = compute_seg_ends(starts, 37)
        pos = jnp.asarray(np.array([0, 9, 11, 22, 24, 36], dtype=np.uint32))
        vl = np.asarray(compute_valid_len(pos, starts, ends))
        assert list(vl) == [10, 1, 12, 1, 13, 1]


class TestGroupOps:
    def test_group_geometry(self):
        boundary = jnp.asarray(np.array([1, 0, 0, 1, 1, 0], dtype=bool))
        start, end, size, rank = (np.asarray(x) for x in group_geometry(boundary))
        assert list(start) == [0, 0, 0, 3, 4, 4]
        assert list(end) == [3, 3, 3, 4, 6, 6]
        assert list(size) == [3, 3, 3, 1, 2, 2]
        assert list(rank) == [0, 1, 2, 0, 0, 1]

    def test_histogram(self):
        boundary = jnp.asarray(np.array([1, 0, 0, 1, 1, 0], dtype=bool))
        _, _, size, _ = group_geometry(boundary)
        counts, total = group_size_histogram(
            boundary, size, jnp.uint32(1), jnp.uint32(0xFFFFFFF0), max_counts_bin=5
        )
        counts = np.asarray(counts)
        assert counts[3] == 1 and counts[1] == 1 and counts[2] == 1
        assert int(total) == 6

    def test_histogram_bounds(self):
        boundary = jnp.asarray(np.array([1, 0, 0, 1, 1, 0], dtype=bool))
        _, _, size, _ = group_geometry(boundary)
        counts, total = group_size_histogram(
            boundary, size, jnp.uint32(2), jnp.uint32(2), max_counts_bin=5
        )
        assert int(total) == 2
        assert np.asarray(counts)[2] == 1

    def test_histogram_strategies_agree(self):
        # clipped_counts picks broadcast-compare below _COMPARE_HIST_MAX_BINS
        # and scatter-add above; both must produce the identical histogram
        from genome_kmers_tpu.ops import groups as G

        rng = np.random.default_rng(3)
        boundary = jnp.asarray(rng.random(4096) < 0.4)
        boundary = boundary.at[0].set(True)
        _, _, size, _ = group_geometry(boundary)
        for bins in (5, G._COMPARE_HIST_MAX_BINS - 1, G._COMPARE_HIST_MAX_BINS):
            qualifies = boundary & (size >= 1)
            clipped = jnp.minimum(size, jnp.uint32(bins))
            compare = np.asarray(G.clipped_counts(qualifies, clipped, bins))
            masked = jnp.where(qualifies, clipped, jnp.uint32(0))
            scatter = np.zeros(bins + 1, dtype=np.uint32)
            np.add.at(scatter, np.asarray(masked), np.asarray(qualifies).astype(np.uint32))
            assert np.array_equal(compare, scatter), bins

    def test_selection_masks(self):
        boundary = jnp.asarray(np.array([1, 0, 0, 1, 1, 0], dtype=bool))
        _, _, size, rank = group_geometry(boundary)
        yielded, gsy = selection_masks(
            boundary, size, rank, jnp.uint32(2), jnp.uint32(0xFFFFFFF0), jnp.uint32(2)
        )
        # group of 3: first 2 yielded; group of 1: excluded; group of 2: both
        assert list(np.asarray(yielded)) == [True, True, False, False, True, True]
        assert list(np.asarray(gsy)[[0, 4]]) == [2, 2]


class TestPallasKernels:
    def test_pack2_pallas_parity_interpret(self):
        """Pallas 2-bit pack == jnp pack, bitwise, for ACGT content (the
        '$'-garbage fields are cap-masked by every consumer)."""
        from genome_kmers_tpu.ops.keys import pack_rank2_words
        from genome_kmers_tpu.ops.pallas_kernels import pack_rank2_words_pallas

        rng = np.random.default_rng(8)
        for n in [64, 65536, 70001]:
            sba = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n)
            a = np.asarray(pack_rank2_words(jnp.asarray(sba)))
            b = np.asarray(pack_rank2_words_pallas(jnp.asarray(sba), interpret=True))
            assert np.array_equal(a, b), n

    def test_pack2_pallas_functional_parity_with_separators(self):
        """With '$' separators the raw words differ at separator-covering
        fields (arithmetic vs table rank), but sorted output — which only
        sees cap-masked fields — must be identical."""
        from genome_kmers_tpu import Kmers, SequenceCollection
        from genome_kmers_tpu.ops.keys import cap_lengths, compute_valid_len
        from genome_kmers_tpu.ops.pallas_kernels import pack_rank2_words_pallas
        from genome_kmers_tpu.ops.sort import sort_positions

        rng = np.random.default_rng(9)
        seq_list = [
            ("a", "".join(rng.choice(list("ACGT"), size=200))),
            ("b", "".join(rng.choice(list("ACGT"), size=90))),
        ]
        sc = SequenceCollection(sequence_list=seq_list, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=2, max_kmer_len=8)
        dc = sc.device_cache("forward")
        positions = jnp.asarray(km.kmer_sba_start_indices)
        cap = cap_lengths(compute_valid_len(positions, dc.seg_starts, dc.seg_ends), 8)
        expected = np.asarray(sort_positions(None, positions, cap, 8, packed2=dc.packed2))
        packed2_pallas = pack_rank2_words_pallas(dc.sba, interpret=True)
        got = np.asarray(sort_positions(None, positions, cap, 8, packed2=packed2_pallas))
        assert np.array_equal(got, expected)


def test_group_sizes_at_boundaries_matches_geometry():
    from genome_kmers_tpu.ops.groups import group_sizes_at_boundaries

    rng = np.random.default_rng(4)
    for _ in range(10):
        n = int(rng.integers(1, 50))
        b = rng.random(n) < 0.3
        b[0] = True
        boundary = jnp.asarray(b)
        _, _, size_full, _ = group_geometry(boundary)
        lean = np.asarray(group_sizes_at_boundaries(boundary))
        full = np.asarray(size_full)
        assert np.array_equal(lean[b], full[b])
        assert (lean[~b] == 0).all()


class TestBitonicTileSort:
    @pytest.mark.parametrize("rows", [2, 16])
    def test_interpret_parity_with_lax_sort(self, rows):
        from genome_kmers_tpu.ops.pallas_sort import bitonic_sort_tile

        rng = np.random.default_rng(rows)
        n = rows * 128
        w0 = rng.integers(0, 40, size=(rows, 128)).astype(np.uint32)  # heavy ties
        w1 = rng.integers(0, 3, size=(rows, 128)).astype(np.uint32)
        pos = rng.permutation(n).astype(np.uint32).reshape(rows, 128)
        lanes = tuple(jnp.asarray(x) for x in (w0, w1, pos))
        outs = bitonic_sort_tile(lanes, interpret=True)
        ref = jax.lax.sort(tuple(x.reshape(-1) for x in lanes), num_keys=3)
        for o, r in zip(outs, ref):
            assert np.array_equal(np.asarray(o).reshape(-1), np.asarray(r))
