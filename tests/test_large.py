"""Large (64-bit coordinate) regime: strided packs, pair-lane distributed
sort, and overflow-proof group statistics (ops/large.py, parallel/large.py,
parallel/sample_sort.py large entry points).

The reference hard-fails past 2^32 k-mers (reference kmers.py:805-808); these
tests prove the lifted ceiling: small-genome equivalence against the flat
uint32 engine first, then a synthetic genome just past 2^32 bases — built as
a tiled strided pack so the 4.3 Gbp sequence never materializes — checked
exactly against a host oracle, including positions above 2^32.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from genome_kmers_tpu.ops.encoding import RANK2_TABLE
from genome_kmers_tpu.ops.keys import (
    cap_lengths,
    compute_valid_len,
    pack_rank2_words,
    pack_rank_words,
)
from genome_kmers_tpu.ops.large import (
    build_key2_words_strided,
    build_key_words_strided,
    fuse64_np,
    pack_rank2_strided_np,
    pack_rank_strided_np,
    split64_np,
)
from genome_kmers_tpu.parallel.distributed import (
    distributed_group_size_histogram,
    make_mesh,
)
from genome_kmers_tpu.parallel.large import (
    distributed_group_size_histogram_large_ragged,
)
from genome_kmers_tpu.parallel.sample_sort import (
    sample_sort_positions,
    sample_sort_positions_large,
    sample_sort_positions_large_ragged,
)


def _random_two_segment_genome(rng, n, cut, p=None):
    sba = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n, p=p)
    sba[cut] = ord("$")
    seg_starts = np.array([0, cut + 1], dtype=np.uint64)
    seg_ends = np.array([cut - 1, n - 1], dtype=np.uint64)
    return sba, seg_starts, seg_ends


class TestStridedKeyWords:
    """Funnel-shift key words from the strided pack == flat per-position
    key words, for every in-word phase of the start position."""

    @pytest.mark.parametrize("two_bit", [True, False])
    def test_matches_flat_builder(self, two_bit):
        rng = np.random.default_rng(3)
        n = 4_099
        sba, seg_starts, seg_ends = _random_two_segment_genome(rng, n, 1_700)
        positions = np.arange(n - 64, dtype=np.uint64)
        k = 55 if two_bit else 31
        n_words = -(-k // (16 if two_bit else 8))

        pos32 = jnp.asarray(positions.astype(np.uint32))
        cap = cap_lengths(
            compute_valid_len(
                pos32,
                jnp.asarray(seg_starts.astype(np.uint32)),
                jnp.asarray(seg_ends.astype(np.uint32)),
            ),
            k,
        )
        if two_bit:
            from genome_kmers_tpu.ops.keys import build_key2_words

            flat = build_key2_words(pack_rank2_words(jnp.asarray(sba)), pos32, cap, n_words)
            strided = build_key2_words_strided(
                jnp.asarray(pack_rank2_strided_np(sba)),
                *map(jnp.asarray, split64_np(positions)),
                cap,
                n_words,
            )
        else:
            from genome_kmers_tpu.ops.keys import build_key_words

            flat = build_key_words(pack_rank_words(jnp.asarray(sba)), pos32, cap, n_words)
            strided = build_key_words_strided(
                jnp.asarray(pack_rank_strided_np(sba)),
                *map(jnp.asarray, split64_np(positions)),
                cap,
                n_words,
            )
        for w_flat, w_str in zip(flat, strided):
            np.testing.assert_array_equal(np.asarray(w_flat), np.asarray(w_str))


class TestLargeSampleSort:
    """The pair-lane strided sample sort equals the flat uint32 sample sort
    on genomes both paths can handle."""

    @pytest.mark.parametrize("k,two_bit", [(31, True), (31, False), (55, True)])
    def test_matches_flat(self, k, two_bit):
        rng = np.random.default_rng(0)
        n = 100_003
        sba, seg_starts, seg_ends = _random_two_segment_genome(rng, n, 41_000)
        positions = np.sort(
            rng.choice(n - 1, size=60_000, replace=False)
        ).astype(np.uint64)
        positions = positions[positions != 41_000]
        mesh = make_mesh(8)

        sba_j = jnp.asarray(sba)
        flat = np.asarray(
            sample_sort_positions(
                pack_rank_words(sba_j),
                jnp.asarray(positions.astype(np.uint32)),
                jnp.asarray(seg_starts.astype(np.uint32)),
                jnp.asarray(seg_ends.astype(np.uint32)),
                k,
                mesh,
                packed2=pack_rank2_words(sba_j),
            )
        ).astype(np.uint64)

        strided = (
            pack_rank2_strided_np(sba) if two_bit else pack_rank_strided_np(sba)
        )
        large = sample_sort_positions_large(
            jnp.asarray(strided), positions, seg_starts, seg_ends, k, mesh,
            two_bit=two_bit,
        )
        np.testing.assert_array_equal(large, flat)


class TestLargeStats:
    """Pair-lane distributed stats == uint32 distributed stats, across group
    size bounds and both pack widths."""

    @pytest.mark.parametrize("two_bit", [True, False])
    @pytest.mark.parametrize("mings,maxgs", [(1, None), (2, 50), (3, 7)])
    def test_matches_uint32_engine(self, two_bit, mings, maxgs):
        rng = np.random.default_rng(7)
        n = 80_007
        sba, seg_starts, seg_ends = _random_two_segment_genome(
            rng, n, 30_000, p=[0.7, 0.1, 0.1, 0.1]
        )
        positions = np.sort(
            rng.choice(n - 1, size=50_000, replace=False)
        ).astype(np.uint64)
        positions = positions[positions != 30_000]
        mesh = make_mesh(8)
        k = 8

        sba_j = jnp.asarray(sba)
        packed = pack_rank_words(sba_j)
        packed2 = pack_rank2_words(sba_j)
        pos32 = jnp.asarray(positions.astype(np.uint32))
        ss32 = jnp.asarray(seg_starts.astype(np.uint32))
        se32 = jnp.asarray(seg_ends.astype(np.uint32))
        srt = sample_sort_positions(packed, pos32, ss32, se32, k, mesh, packed2=packed2)
        c_ref, t_ref = distributed_group_size_histogram(
            packed, srt, ss32, se32, k, mesh, min_group_size=mings,
            max_group_size=maxgs, max_counts_bin=100, packed2=packed2,
        )

        strided = (
            pack_rank2_strided_np(sba) if two_bit else pack_rank_strided_np(sba)
        )
        (hi, lo), pad = sample_sort_positions_large_ragged(
            jnp.asarray(strided), positions, seg_starts, seg_ends, k, mesh,
            two_bit=two_bit,
        )
        c_l, t_l = distributed_group_size_histogram_large_ragged(
            jnp.asarray(strided), hi, lo, pad, seg_starts, seg_ends, k, mesh,
            min_group_size=mings, max_group_size=maxgs, max_counts_bin=100,
            two_bit=two_bit,
        )
        np.testing.assert_array_equal(c_l, np.asarray(c_ref).astype(np.uint64))
        assert t_l == int(t_ref)


def _tiled_past_2p32():
    """Shared >2^32 scenario: tiled genome (the 4.3 Gbp SBA never
    materializes), planted multi-member groups spanning 2^32, and the host
    oracle ingredients (block ranks + per-position 62-bit keys)."""
    rng = np.random.default_rng(11)
    BLOCK = 1 << 24          # 16M-base tile (2^20 strided words)
    TILES = (1 << 8) + 1     # 257 tiles -> L = 4,311,744,512 > 2^32
    L = BLOCK * TILES
    k = 31

    block = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=BLOCK)
    block_words = pack_rank2_strided_np(block, extra_words=0)
    n_words_total = TILES * block_words.shape[0]
    genome_words = np.zeros(n_words_total + 8, dtype=np.uint32)
    genome_words[:n_words_total].reshape(TILES, -1)[:] = block_words

    # 40k distinct tile offsets, each planted in 1-8 random tiles, so the
    # tiled genome yields real multi-member groups spanning 2^32
    n_off = 40_000
    offs = rng.choice(BLOCK - k, size=n_off, replace=False).astype(np.uint64)
    reps = rng.integers(1, 9, size=n_off)
    pos = np.concatenate(
        [
            offs[i]
            + np.uint64(BLOCK)
            * rng.choice(TILES, size=r, replace=False).astype(np.uint64)
            for i, r in enumerate(reps)
        ]
    )
    rng.shuffle(pos)
    assert int(np.sum(pos >= (1 << 32))) > 0
    assert pos.max() < L - k

    # host oracle: 62-bit packed kmer keys from the tiled block
    ranks = RANK2_TABLE[block].astype(np.uint64)
    key = np.zeros(len(pos), dtype=np.uint64)
    base = pos % np.uint64(BLOCK)
    for j in range(k):
        key = (key << np.uint64(2)) | ranks[(base + np.uint64(j)) % np.uint64(BLOCK)]
    return dict(
        BLOCK=BLOCK, TILES=TILES, L=L, k=k, block=block, ranks=ranks,
        genome_words=genome_words, pos=pos, key=key,
    )


def _oracle_hist(sizes, mings, maxgs, bins):
    q = (sizes >= mings) & (sizes <= maxgs)
    counts = np.bincount(
        np.minimum(sizes[q], bins), minlength=bins + 1
    ).astype(np.uint64)
    return counts, int(sizes[q].sum())


class TestPast2p32:
    """The headline ceiling lift: a genome just past 2^32 bases, k-mer
    positions above 2^32, sorted + grouped + filtered + queried + decoded +
    checkpointed exactly vs a host oracle — through both the functional
    layer and the LargeKmers API."""

    @pytest.fixture(scope="class")
    def big(self):
        return _tiled_past_2p32()

    def test_sort_and_stats_past_2p32(self, big):
        k, L, pos, key = big["k"], big["L"], big["pos"], big["key"]
        order = np.lexsort((pos, key))
        want_sorted = pos[order]
        ks = key[order]
        bnd = np.concatenate([[True], ks[1:] != ks[:-1]])
        sizes = np.diff(np.concatenate([np.flatnonzero(bnd), [len(ks)]]))
        MINGS, MAXGS, BINS = 2, 100, 10
        want_counts, want_total = _oracle_hist(sizes, MINGS, MAXGS, BINS)

        seg_starts = np.array([0], dtype=np.uint64)
        seg_ends = np.array([L - 1], dtype=np.uint64)
        mesh = make_mesh(2)  # 2 devices: bounds replicated-pack memory
        g = jnp.asarray(big["genome_words"])
        (hi, lo), pad = sample_sort_positions_large_ragged(
            g, pos, seg_starts, seg_ends, k, mesh, two_bit=True
        )
        hn, ln, pn = np.asarray(hi), np.asarray(lo), np.asarray(pad)
        got_sorted = fuse64_np(hn[pn == 0], ln[pn == 0])
        np.testing.assert_array_equal(got_sorted, want_sorted)

        counts, total = distributed_group_size_histogram_large_ragged(
            g, hi, lo, pad, seg_starts, seg_ends, k, mesh,
            min_group_size=MINGS, max_group_size=MAXGS, max_counts_bin=BINS,
            two_bit=True,
        )
        np.testing.assert_array_equal(counts, want_counts)
        assert total == want_total

    def test_full_api_past_2p32(self, big, tmp_path):
        """VERDICT round-3 item 1 done-criterion: filtered stats, canonical
        counts, streaming queries, string decode, and a checkpoint
        round-trip all exact past 2^32 coordinates, via LargeKmers."""
        from genome_kmers_tpu import LargeKmers
        from genome_kmers_tpu.ops.filters import gen_kmer_gc_content_filter_func

        k, L, BLOCK = big["k"], big["L"], big["BLOCK"]
        pos, key, ranks = big["pos"], big["key"], big["ranks"]
        mesh = make_mesh(2)
        lk = LargeKmers(
            big["genome_words"],
            np.array([0], dtype=np.uint64),
            np.array([L - 1], dtype=np.uint64),
            k, k, two_bit=True,
        )
        # the full canonical start set would be 8 B x 4.3e9 of host memory;
        # the explicit-positions entry point is the supported route
        lk.sort(mesh, positions=pos)

        # --- filtered stats vs host oracle ---
        MN, MX = 10, 21  # GC counts in [10, 21] of k=31
        base = pos % np.uint64(BLOCK)
        gc_plane = np.isin(ranks, (1, 2)).astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(gc_plane)])
        gc = cs[(base + np.uint64(k)).astype(np.int64)] - cs[base.astype(np.int64)]
        surv = (gc >= MN) & (gc <= MX)
        order = np.lexsort((pos, key))
        ks, surv_s = key[order], surv[order]
        bnd = np.concatenate([[True], ks[1:] != ks[:-1]])
        gid = np.cumsum(bnd) - 1
        surv_sizes = np.bincount(gid, weights=surv_s).astype(np.int64)
        want_counts, want_total = _oracle_hist(surv_sizes, 1, 1 << 62, 10)
        # half-step fractions so ceil/floor land exactly on MN/MX counts
        f = gen_kmer_gc_content_filter_func((MN - 0.5) / k, (MX + 0.5) / k, k)
        counts, total = lk.get_kmer_group_counts(
            k, kmer_filter_func=f, max_counts_bin=10
        )
        np.testing.assert_array_equal(counts, want_counts)
        assert total == want_total

        # --- streaming queries (incl. a >2^32 planted k-mer) vs oracle ---
        hi_rows = np.flatnonzero(pos >= (1 << 32))[:3]
        inv = np.empty(len(pos), dtype=np.int64)
        inv[order] = np.arange(len(pos))
        strs = lk.get_kmer_strs(inv[hi_rows], k)
        # oracle decode straight from the block
        lut = np.frombuffer(b"ACGT", dtype=np.uint8)
        for row, s in zip(hi_rows, strs):
            b = int(pos[row] % np.uint64(BLOCK))
            want = lut[ranks[b : b + k].astype(np.int64)].tobytes().decode()
            assert s == want
        want_q = [int(np.sum(key == key[r])) for r in hi_rows]
        got_q = lk.count_queries(strs, k)
        assert got_q.tolist() == want_q

        # --- canonical counts vs oracle ---
        rc_key = np.zeros(len(pos), dtype=np.uint64)
        tmp = key.copy()
        for _ in range(k):
            rc_key = (rc_key << np.uint64(2)) | ((tmp & np.uint64(3)) ^ np.uint64(3))
            tmp >>= np.uint64(2)
        can = np.minimum(key, rc_key)
        cs_sizes = np.unique(np.sort(can), return_counts=True)[1]
        want_cc, want_ct = _oracle_hist(cs_sizes.astype(np.int64), 1, 1 << 62, 10)
        cc, ct = lk.get_canonical_kmer_group_counts(
            k, max_counts_bin=10, positions=pos
        )
        np.testing.assert_array_equal(cc, want_cc)
        assert ct == want_ct

        # --- checkpoint round-trip (restore onto a 1-device mesh) ---
        lk.save_checkpoint(tmp_path / "big_ck")
        lk2 = LargeKmers(
            big["genome_words"],
            np.array([0], dtype=np.uint64),
            np.array([L - 1], dtype=np.uint64),
            k, k, two_bit=True,
        )
        lk2.load_checkpoint(tmp_path / "big_ck", make_mesh(1))
        c2, t2 = lk2.get_kmer_group_counts(
            k, kmer_filter_func=f, max_counts_bin=10
        )
        np.testing.assert_array_equal(c2, counts)
        assert t2 == total


class _StreamPacker:
    """Accumulate byte chunks into a strided 2-bit pack without ever
    materializing the whole genome (16-base word alignment handled by a
    small carry buffer)."""

    def __init__(self):
        self.chunks = []
        self.stream = np.empty(0, dtype=np.uint8)

    def emit(self, arr):
        self.stream = (
            np.concatenate([self.stream, arr]) if self.stream.size else arr
        )
        take = (len(self.stream) // 16) * 16
        if take:
            self.chunks.append(
                pack_rank2_strided_np(self.stream[:take], extra_words=0)
            )
            self.stream = self.stream[take:]

    def finish(self):
        if len(self.stream):
            self.chunks.append(pack_rank2_strided_np(self.stream, extra_words=0))
        self.chunks.append(np.zeros(8, dtype=np.uint32))
        return np.concatenate(self.chunks)


_GEN_CHUNK = 1 << 24  # 16M bases per generated block


def _gen_blocks(rng, seg_len, plant31=None):
    """Random ACGT blocks totalling ``seg_len`` bases, with optional
    (offset, 31-mer bytes) plants (each must fall inside one block)."""
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    produced = 0
    while produced < seg_len:
        n = min(_GEN_CHUNK, seg_len - produced)
        block = lut[rng.integers(0, 4, size=n, dtype=np.uint8)]
        if plant31:
            for off, w in plant31:
                if produced <= off and off + 31 <= produced + n:
                    block[off - produced : off - produced + 31] = w
        yield block
        produced += n


def _random_pack_two_segments(seg_len, tail_share, seed=21):
    """Strided 2-bit pack of two random segments of ``seg_len`` bases each
    (total > 2^32 for seg_len >= 2^31) with the last ``tail_share`` bases
    SHARED — real suffix-equal position pairs straddling the 2^32
    boundary. Returns (packed_words, seg_starts, seg_ends)."""
    rng = np.random.default_rng(seed)
    pk = _StreamPacker()
    last = None
    for block in _gen_blocks(rng, seg_len):
        last = block
        pk.emit(block)
    tail = last[-tail_share:].copy()
    pk.emit(np.frombuffer(b"$", dtype=np.uint8))
    prev = None  # hold back one block so segment B's tail can be patched
    for block in _gen_blocks(rng, seg_len):
        if prev is not None:
            pk.emit(prev)
        prev = block
    prev[-tail_share:] = tail
    pk.emit(prev)
    packed = pk.finish()
    L = 2 * seg_len + 1
    seg_starts = np.array([0, seg_len + 1], dtype=np.uint64)
    seg_ends = np.array([seg_len - 1, L - 1], dtype=np.uint64)
    return packed, seg_starts, seg_ends


class TestPast2p32Suffix:
    """Round-5 headline: suffix mode (max_kmer_len=None) past 2^32 — the
    one configuration that needs BOTH the 64-bit regime and unbounded k
    (SURVEY §7.3-1/6; the reference supports suffix semantics,
    kmers.py:315-316, but hard-fails at this scale, kmers.py:805-808)."""

    def test_suffix_sort_and_stats_past_2p32(self):
        from genome_kmers_tpu import LargeKmers
        from genome_kmers_tpu.ops.large import decode_strided_np

        SEG = (1 << 31) + (1 << 25)  # 2 segments -> L = 4.36e9 > 2^32
        TAIL = 256                   # shared tail: suffix-equal pairs,
        #                              resolved in ceil(256/64) = 4 rounds
        packed, seg_starts, seg_ends = _random_pack_two_segments(SEG, TAIL)
        L = int(seg_ends[-1]) + 1
        assert L > 2**32

        rng = np.random.default_rng(33)
        # random positions from both segments (none in the shared tails —
        # random suffixes are unique) + mirrored tail pairs at sampled
        # depths (equal suffixes straddling 2^32)
        pos_a = rng.choice(SEG - TAIL - 64, size=6000, replace=False).astype(np.uint64)
        pos_b = (
            np.uint64(SEG + 1)
            + rng.choice(SEG - TAIL - 64, size=6000, replace=False).astype(np.uint64)
        )
        depths = rng.choice(np.arange(1, TAIL + 1), size=120, replace=False).astype(np.uint64)
        pair_a = np.uint64(SEG) - depths
        pair_b = np.uint64(L) - depths
        pos = np.concatenate([pos_a, pos_b, pair_a, pair_b])
        rng.shuffle(pos)
        assert int(np.sum(pos >= (1 << 32))) > 0

        lk = LargeKmers(packed, seg_starts, seg_ends, 1, None, two_bit=True)
        assert not lk._one_window
        mesh = make_mesh(2)
        lk.sort(mesh, positions=pos)

        # oracle: 320-byte capped prefixes (tail pairs are <= 256 long and
        # truly equal; random suffixes are unique well before 320 bases)
        K_OR = 320
        starts = seg_starts
        seg_ids = np.searchsorted(starts, pos, side="right") - 1
        nat = (seg_ends[seg_ids] - pos + np.uint64(1)).astype(np.int64)
        lens = np.minimum(nat, K_OR)
        block = decode_strided_np(packed, pos, K_OR, True)
        keys = [block[i, : lens[i]].tobytes() for i in range(len(pos))]
        order = sorted(range(len(pos)), key=lambda i: (keys[i], pos[i]))
        want_sorted = pos[np.array(order)]
        got = lk.sorted_positions()
        np.testing.assert_array_equal(got, want_sorted)

        # suffix-identity stats: tail pairs form groups of 2 iff truly
        # suffix-equal (equal bytes AND equal natural length) — exactly the
        # mirrored pairs; everything else singleton
        ks = [keys[i] for i in order]
        nt = nat[np.array(order)]
        bnd = np.array(
            [True]
            + [ks[i] != ks[i - 1] or nt[i] != nt[i - 1] for i in range(1, len(ks))]
        )
        sizes = np.diff(np.concatenate([np.flatnonzero(bnd), [len(ks)]]))
        want_counts = np.bincount(np.minimum(sizes, 10), minlength=11).astype(np.uint64)
        assert want_counts[2] == 120  # the planted pairs all found
        counts, total = lk.get_kmer_group_counts(None, max_counts_bin=10)
        np.testing.assert_array_equal(counts, want_counts)
        assert total == len(pos)

        # bounded identity on the same suffix index (k=31 via in-kernel keys)
        k31 = [block[i, : min(31, lens[i])].tobytes() for i in range(len(pos))]
        s31 = sorted(k31)
        import itertools

        sizes31 = np.array([len(list(g)) for _, g in itertools.groupby(s31)])
        want31 = np.bincount(np.minimum(sizes31, 10), minlength=11).astype(np.uint64)
        c31, t31 = lk.get_kmer_group_counts(31, max_counts_bin=10)
        np.testing.assert_array_equal(c31, want31)
        assert t31 == len(pos)


class TestPast2p32TrackStrands:
    """track_strands_separately past 2^32 (VERDICT round-4 item 2): a
    both-strand index of > 2^32 total bases with strand-split stats."""

    def test_strand_split_stats_past_2p32(self):
        from genome_kmers_tpu import LargeKmers
        from genome_kmers_tpu.ops.large import decode_strided_np

        SEG = (1 << 31) + (1 << 25)
        K = 31
        rng = np.random.default_rng(55)
        lut = np.frombuffer(b"ACGT", dtype=np.uint8)
        comp_lut = np.zeros(256, dtype=np.uint8)
        for k_, v_ in ((65, 84), (67, 71), (71, 67), (84, 65)):
            comp_lut[k_] = v_
        # plant W at offset a and revcomp(W) at offset b of the FORWARD
        # strand: the both-strand index then holds "W" once on "+" (at a)
        # and once on "-" (the rc strand reads W across locus b)
        W = lut[rng.integers(0, 4, size=K, dtype=np.uint8)]
        Wrc = comp_lut[W[::-1]]
        a_off, b_off = 10_000_000, (1 << 31) + 1_000_000
        plants = [(a_off, W), (b_off, Wrc)]

        # forward strand + '$' + its reverse complement, packed streaming.
        # Per-block independent rngs ([seed, i]) make any block regenerable
        # on demand, so the rc pass re-derives blocks in reverse order
        # without holding the 2.2 GB strand in memory.
        nblocks = -(-SEG // _GEN_CHUNK)

        def ablock(i):
            n = min(_GEN_CHUNK, SEG - i * _GEN_CHUNK)
            blk = lut[
                np.random.default_rng([55, i]).integers(0, 4, size=n, dtype=np.uint8)
            ]
            base = i * _GEN_CHUNK
            for off, w in plants:
                if base <= off and off + K <= base + n:
                    blk[off - base : off - base + K] = w
            return blk

        pk = _StreamPacker()
        for i in range(nblocks):
            pk.emit(ablock(i))
        pk.emit(np.frombuffer(b"$", dtype=np.uint8))
        for i in reversed(range(nblocks)):
            pk.emit(comp_lut[ablock(i)[::-1]])
        packed = pk.finish()
        L = 2 * SEG + 1
        seg_starts = np.array([0, SEG + 1], dtype=np.uint64)
        seg_ends = np.array([SEG - 1, L - 1], dtype=np.uint64)

        lk = LargeKmers(packed, seg_starts, seg_ends, K, K, two_bit=True)
        lk._n_fwd_records = 1
        lk._track_strands = True
        lk.record_names = ["chrA", "chrA"]

        # sampled positions from both strands + the planted cross-strand pair
        rng2 = np.random.default_rng(66)
        pos_f = rng2.choice(SEG - K, size=5000, replace=False).astype(np.uint64)
        pos_r = (
            np.uint64(SEG + 1)
            + rng2.choice(SEG - K, size=5000, replace=False).astype(np.uint64)
        )
        w_plus = np.uint64(a_off)  # W on "+"
        w_minus = np.uint64(2 * SEG - (b_off + K - 1))  # W on "-" (rc coords)
        pos = np.concatenate([pos_f, pos_r, [w_plus, w_minus]])
        pos = np.unique(pos)
        rng2.shuffle(pos)
        assert int(np.sum(pos >= (1 << 32))) > 0
        mesh = make_mesh(2)
        lk.sort(mesh, positions=pos)

        # oracle over decoded 31-mers, split and joint
        block = decode_strided_np(packed, pos, K, True)
        keys = [block[i].tobytes() for i in range(len(pos))]
        is_rc = pos >= np.uint64(SEG + 1)
        import itertools

        def hist(split):
            items = sorted(
                (keys[i], bool(is_rc[i]) if split else False)
                for i in range(len(pos))
            )
            sizes = np.array([len(list(g)) for _, g in itertools.groupby(items)])
            return (
                np.bincount(np.minimum(sizes, 10), minlength=11).astype(np.uint64),
                int(sizes.sum()),
            )

        # planted pair: W appears once on each strand
        assert keys[int(np.flatnonzero(pos == w_plus)[0])] == W.tobytes()
        assert keys[int(np.flatnonzero(pos == w_minus)[0])] == W.tobytes()

        want_split, wt_split = hist(True)
        c_split, t_split = lk.get_kmer_group_counts(K, max_counts_bin=10)
        np.testing.assert_array_equal(c_split, want_split)
        assert t_split == wt_split

        lk._track_strands = False  # joint identity on the same layout
        want_joint, wt_joint = hist(False)
        c_joint, t_joint = lk.get_kmer_group_counts(K, max_counts_bin=10)
        np.testing.assert_array_equal(c_joint, want_joint)
        assert t_joint == wt_joint
        assert want_joint[2] >= 1  # the cross-strand W pair shares a group
        assert want_split[2] <= want_joint[2]  # split breaks it apart


class TestLargeKmersFacade:
    """LargeKmers: the 64-bit regime behind the familiar class surface.
    Small-genome runs must agree exactly with the uint32 Kmers engine."""

    SEQS = [("a", "ACGTACGTACGGTTAC"), ("b", "GGCCAATTACGTAC")]

    def test_matches_kmers_engine(self):
        from genome_kmers_tpu import Kmers, LargeKmers, SequenceCollection

        sc = SequenceCollection(sequence_list=self.SEQS, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=4, max_kmer_len=4)
        km.sort()
        want_counts, want_total = km.get_kmer_group_counts(4, max_counts_bin=20)

        lk = LargeKmers.from_records(self.SEQS, 4, 4)
        assert lk.two_bit and len(lk) == len(km)
        mesh = make_mesh(4)
        lk.sort(mesh)
        np.testing.assert_array_equal(
            lk.sorted_positions(),
            km.kmer_sba_start_indices.astype(np.uint64),
        )
        counts, total = lk.get_kmer_group_counts(4, max_counts_bin=20)
        np.testing.assert_array_equal(
            np.asarray(counts)[:21].astype(np.int64), np.asarray(want_counts)[:21]
        )
        assert total == want_total
        assert lk.get_kmer_count(4) == want_total
        # shorter-kmer refinement + group-size filters
        c2, t2 = km.get_kmer_group_counts(3, min_group_size=2, max_counts_bin=20)
        c3, t3 = lk.get_kmer_group_counts(3, min_group_size=2, max_counts_bin=20)
        np.testing.assert_array_equal(np.asarray(c3)[:21].astype(np.int64), np.asarray(c2)[:21])
        assert t3 == t2

    def test_four_bit_autodetect(self):
        from genome_kmers_tpu import Kmers, LargeKmers, SequenceCollection

        seqs = [("n1", "ACGTNNACGTAC"), ("n2", "GGNNCCATACGG")]
        lk = LargeKmers.from_records(seqs, 3, 3)
        assert not lk.two_bit
        sc = SequenceCollection(sequence_list=seqs, strands_to_load="forward")
        km = Kmers(sc, min_kmer_len=3, max_kmer_len=3)
        km.sort()
        mesh = make_mesh(2)
        lk.sort(mesh)
        np.testing.assert_array_equal(
            lk.sorted_positions(), km.kmer_sba_start_indices.astype(np.uint64)
        )
        c1, t1 = lk.get_kmer_group_counts(3, max_counts_bin=20)
        c2, t2 = km.get_kmer_group_counts(3, max_counts_bin=20)
        np.testing.assert_array_equal(np.asarray(c1)[:21].astype(np.int64), np.asarray(c2)[:21])
        assert t1 == t2

    def test_both_strands_matches_from_strand(self):
        from genome_kmers_tpu import Kmers, LargeKmers, SequenceCollection

        sc = SequenceCollection(sequence_list=self.SEQS, strands_to_load="both")
        km = Kmers.from_strand(sc, min_kmer_len=4, max_kmer_len=4,
                               source_strand="both")
        km.sort()
        want_counts, want_total = km.get_kmer_group_counts(4, max_counts_bin=20)

        lk = LargeKmers.from_records(self.SEQS, 4, 4, both_strands=True)
        assert len(lk) == len(km)
        mesh = make_mesh(2)
        lk.sort(mesh)
        np.testing.assert_array_equal(
            lk.sorted_positions(), km.kmer_sba_start_indices.astype(np.uint64)
        )
        counts, total = lk.get_kmer_group_counts(4, max_counts_bin=20)
        np.testing.assert_array_equal(
            np.asarray(counts)[:21].astype(np.int64), np.asarray(want_counts)[:21]
        )
        assert total == want_total

    def test_from_sequence_collection(self):
        from genome_kmers_tpu import LargeKmers, SequenceCollection

        sc = SequenceCollection(sequence_list=self.SEQS, strands_to_load="forward")
        lk = LargeKmers.from_sequence_collection(sc, 4, 4)
        lk2 = LargeKmers.from_records(self.SEQS, 4, 4)
        np.testing.assert_array_equal(lk.packed_words, lk2.packed_words)
        np.testing.assert_array_equal(lk.seg_starts, lk2.seg_starts)

    def test_alphabet_validation(self):
        """Invalid bytes must raise, never silently pack as rank 0 (the
        Kmers path rejects them in SequenceCollection validation)."""
        from genome_kmers_tpu import LargeKmers

        with pytest.raises(ValueError, match="disallowed characters"):
            LargeKmers.from_records([("a", "acgtacgt")], 3, 3)  # soft-masked
        with pytest.raises(ValueError, match="disallowed characters"):
            LargeKmers.from_records([("a", "ACGTNACGT")], 3, 3, two_bit=True)
        with pytest.raises(ValueError, match="disallowed characters"):
            LargeKmers.from_records([("a", "ACGT$ACGT")], 3, 3, two_bit=True)
        # N autodetects onto the 4-bit pack and works
        lk = LargeKmers.from_records([("a", "ACGTNACGT")], 3, 3)
        assert not lk.two_bit

    def test_errors(self):
        from genome_kmers_tpu import LargeKmers

        # round 5: max_kmer_len=None (suffix mode) and beyond-window bounds
        # are now real modes, not errors
        assert not LargeKmers.from_records(self.SEQS, 4, None, two_bit=True)._one_window
        assert not LargeKmers.from_records(self.SEQS, 4, 65, two_bit=True)._one_window
        with pytest.raises(ValueError, match="track_strands_separately"):
            LargeKmers.from_records(self.SEQS, 4, 4, track_strands_separately=True)
        with pytest.raises(ValueError, match="min_kmer_len"):
            LargeKmers.from_records(self.SEQS, 0, 4, two_bit=True)
        with pytest.raises(ValueError, match="empty"):
            LargeKmers.from_records([("a", "")], 1, 4, two_bit=True)
        lk = LargeKmers.from_records(self.SEQS, 4, 4)
        with pytest.raises(ValueError, match="sorted"):
            lk.sorted_positions()
        with pytest.raises(AssertionError, match="sorted"):
            lk.get_kmer_group_counts(4)
