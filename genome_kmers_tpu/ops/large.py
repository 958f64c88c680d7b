"""64-bit-coordinate building blocks for genomes past the int32 gather limit.

The standard compute path stores one packed key word PER POSITION
(ops/keys.py): gathers index by the position itself, which dies at 2^31
(int32 gather indices) and costs 4 bytes of HBM per base. Past ~2 Gbp both
constraints bind, so the large regime switches representation:

  * **strided packs** — one uint32 word per 16 bases (2-bit) or 8 bases
    (4-bit), the memory-optimal layout (0.25/0.5 byte per base). Word
    indices are ``position >> 4``: int32-safe up to 32 Gbp (2-bit).
    Per-position key words are rebuilt on the fly with a funnel shift over
    two adjacent words — two gathers + three VPU ops per word, trading a
    little compute for 16x less HBM traffic per gathered byte.
  * **positions as (hi, lo) uint32 lane pairs** — TPUs have no 64-bit
    integer ALU (XLA itself emulates u64 as pairs), so the pair
    representation IS the native design: comparisons become lexicographic
    over two sort lanes, and arithmetic is explicit carry/borrow on the VPU.

No reference counterpart: the reference hard-fails at 2^32 k-mers
(reference kmers.py:805-808); this module is what lifts that ceiling
(SURVEY.md §7.3-6, both-strand human genome ~6.2G k-mers).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .encoding import DIBIT_MASKS, NIBBLE_MASKS, RANK2_TABLE, RANK_TABLE

# Largest SBA length the flat (per-position pack, int32 gather) path can
# index safely. Beyond it, callers must switch to the strided/64-bit path.
INT32_SAFE_LEN = (1 << 31) - 256

# 64-bit "no cap" sentinel (mirrors keys.NO_CAP); saturated uint32 form is
# keys.NO_CAP itself since caps are only ever compared against k <= 64.
_ONES32 = np.uint32(0xFFFFFFFF)


# --------------------------------------------------------------------------- #
# host-side u64 <-> (hi, lo) uint32 pair
# --------------------------------------------------------------------------- #


def split64_np(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 host array -> (hi, lo) uint32 pair."""
    a = np.asarray(a, dtype=np.uint64)
    return (a >> np.uint64(32)).astype(np.uint32), (a & np.uint64(0xFFFFFFFF)).astype(np.uint32)


def fuse64_np(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """(hi, lo) uint32 pair -> uint64 host array."""
    return (np.asarray(hi, dtype=np.uint64) << np.uint64(32)) | np.asarray(lo, dtype=np.uint64)


# --------------------------------------------------------------------------- #
# device-side pair arithmetic (uint32 lanes, explicit carry/borrow)
# --------------------------------------------------------------------------- #


def add64_u32(hi, lo, k):
    """(hi, lo) + k where k is a uint32-sized addend (array or scalar)."""
    k = jnp.uint32(k)
    lo2 = lo + k
    carry = (lo2 < lo).astype(jnp.uint32)
    return hi + carry, lo2


def add64(ahi, alo, bhi, blo):
    lo = alo + blo
    carry = (lo < alo).astype(jnp.uint32)
    return ahi + bhi + carry, lo


def sub64(ahi, alo, bhi, blo):
    """(a - b) as a pair; caller guarantees a >= b."""
    lo = alo - blo
    borrow = (alo < blo).astype(jnp.uint32)
    return ahi - bhi - borrow, lo


def less64(ahi, alo, bhi, blo):
    return (ahi < bhi) | ((ahi == bhi) & (alo < blo))


def lesseq64(ahi, alo, bhi, blo):
    return (ahi < bhi) | ((ahi == bhi) & (alo <= blo))


def min64(ahi, alo, bhi, blo):
    a_lt = less64(ahi, alo, bhi, blo)
    return jnp.where(a_lt, ahi, bhi), jnp.where(a_lt, alo, blo)


def lexmin2(a, b):
    """associative_scan monoid: elementwise 64-bit min over (hi, lo) pairs."""
    return min64(a[0], a[1], b[0], b[1])


def lexmax2(a, b):
    a_lt = less64(a[0], a[1], b[0], b[1])
    return jnp.where(a_lt, b[0], a[0]), jnp.where(a_lt, b[1], a[1])


def pairsum_small(vals):
    """Exact (hi, lo) sum of a small static-length uint32 vector (unrolled
    carry adds) — shared by the distributed stats and the large run-id
    cumsum (cross-shard prefix offsets)."""
    hi = jnp.zeros((), jnp.uint32)
    lo = jnp.zeros((), jnp.uint32)
    for i in range(int(vals.shape[0])):
        hi, lo = add64_u32(hi, lo, vals[i])
    return hi, lo


def searchsorted64_right(table_hi, table_lo, q_hi, q_lo) -> jax.Array:
    """count of table entries <= query, per query row (int32) — the pair-lane
    analog of ``jnp.searchsorted(side="right")`` via an unrolled binary
    search on the replicated (small) table."""
    n = int(table_hi.shape[0])
    nq = q_hi.shape[0]
    lo = jnp.zeros(nq, dtype=jnp.int32)
    hi = jnp.full(nq, n, dtype=jnp.int32)
    if n == 0:
        return lo
    rounds = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)
    for _ in range(rounds):
        active = lo < hi
        mid = (lo + hi) >> 1
        th = jnp.take(table_hi, mid, mode="clip")
        tl = jnp.take(table_lo, mid, mode="clip")
        go_right = lesseq64(th, tl, q_hi, q_lo)  # table[mid] <= q
        lo = jnp.where(active & go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
    return lo


# --------------------------------------------------------------------------- #
# strided packs (host numpy build — one pass, chunked; uploaded once)
# --------------------------------------------------------------------------- #

_CHUNK = 1 << 26  # 64M bases per chunk keeps the transient uint32 ranks small


def _pack_strided_np(sba_u8: np.ndarray, bases_per_word: int, bits: int,
                     table: np.ndarray, extra_words: int) -> np.ndarray:
    try:
        # native multithreaded pack (~10x the NumPy path at genome scale);
        # falls through to NumPy when the toolchain/library is unavailable
        from ..native import pack_strided_native

        out = pack_strided_native(sba_u8, table, bits, extra_words)
        if out is not None:
            return out
    except Exception:
        pass
    n = len(sba_u8)
    n_words = -(-n // bases_per_word)
    out = np.zeros(n_words + extra_words, dtype=np.uint32)
    shift_top = 32 - bits
    for c0 in range(0, n, _CHUNK):
        c1 = min(c0 + _CHUNK, n)
        # chunk boundaries are word-aligned because _CHUNK % bases_per_word == 0
        ranks = table[sba_u8[c0:c1]].astype(np.uint32)
        pad = (-len(ranks)) % bases_per_word
        if pad:
            ranks = np.concatenate([ranks, np.zeros(pad, dtype=np.uint32)])
        grid = ranks.reshape(-1, bases_per_word)
        word = np.zeros(grid.shape[0], dtype=np.uint32)
        for j in range(bases_per_word):
            word |= grid[:, j] << np.uint32(shift_top - bits * j)
        out[c0 // bases_per_word : c0 // bases_per_word + len(word)] = word
    return out


def pack_rank2_strided_np(sba_u8: np.ndarray, extra_words: int = 8) -> np.ndarray:
    """S2[w] = 2-bit ranks of bases 16w..16w+15, big-endian (base 16w in the
    top field), plus ``extra_words`` trailing zero words so funnel-shift
    gathers at the array edge read rank 0 ('$'/past-end)."""
    return _pack_strided_np(sba_u8, 16, 2, RANK2_TABLE, extra_words)


def pack_rank_strided_np(sba_u8: np.ndarray, extra_words: int = 8) -> np.ndarray:
    """S[w] = 4-bit ranks of bases 8w..8w+7, big-endian, zero-padded tail."""
    return _pack_strided_np(sba_u8, 8, 4, RANK_TABLE, extra_words)


# --------------------------------------------------------------------------- #
# funnel-shift key builders over strided packs
# --------------------------------------------------------------------------- #


def _funnel_words(packed_s, pos_hi, pos_lo, cap_len, n_words, offset,
                  log2_bpw, bits, masks):
    """Shared funnel-shift core: key word w covers bases
    [offset + bpw*w, offset + bpw*(w+1)) from each position. ``offset`` may
    be a TRACED uint32 scalar — the unbounded-suffix refinement rounds pass
    it traced so every round (offset 0, 64, 128, ...) shares ONE compiled
    executable (remote-TPU compiles run minutes per shape)."""
    bpw = 1 << log2_bpw
    offset = jnp.asarray(offset, dtype=jnp.uint32)
    words = []
    for w in range(n_words):
        off = offset + jnp.uint32(bpw * w)
        bhi, blo = add64_u32(pos_hi, pos_lo, off)
        widx = ((blo >> jnp.uint32(log2_bpw))
                | (bhi << jnp.uint32(32 - log2_bpw))).astype(jnp.int32)
        a = jnp.take(packed_s, widx, mode="clip")
        b = jnp.take(packed_s, widx + 1, mode="clip")
        sh = (blo & jnp.uint32(bpw - 1)) * jnp.uint32(bits)
        # (a << sh) | (b >> (32 - sh)); guard the undefined >>32 at sh == 0
        hi_part = a << sh
        lo_part = jnp.where(sh == 0, jnp.uint32(0), b >> (jnp.uint32(32) - sh))
        word = hi_part | lo_part
        # zero fields at or beyond the compare cap (identical semantics to
        # ops/keys.build_key*_words: comparison stops where the reference's
        # comparator would, kmers.py:360-393)
        beyond = cap_len > off
        r = jnp.where(beyond, jnp.minimum(cap_len - off, jnp.uint32(bpw)), jnp.uint32(0))
        words.append(word & jnp.take(masks, r.astype(jnp.int32)))
    return tuple(words)


@partial(jax.jit, static_argnames=("n_words",))
def build_key2_words_strided(packed2_s, pos_hi, pos_lo, cap_len, n_words,
                             offset=0):
    """2-bit key words from the strided pack (16 bases/word). The cap must
    also ride as an explicit sort lane (see ops/encoding.py docstring).
    ``offset`` is traced (one executable serves every window offset)."""
    return _funnel_words(packed2_s, pos_hi, pos_lo, cap_len, n_words, offset,
                         4, 2, jnp.asarray(DIBIT_MASKS))


@partial(jax.jit, static_argnames=("n_words",))
def build_key_words_strided(packed_s, pos_hi, pos_lo, cap_len, n_words,
                            offset=0):
    """4-bit key words from the strided pack (8 bases/word). ``offset`` is
    traced (one executable serves every window offset)."""
    return _funnel_words(packed_s, pos_hi, pos_lo, cap_len, n_words, offset,
                         3, 4, jnp.asarray(NIBBLE_MASKS))


def decode_strided_np(packed_words: np.ndarray, positions_u64, length: int,
                      two_bit: bool) -> np.ndarray:
    """ASCII byte matrix (n, length) decoded from a strided pack at each
    uint64 position (host NumPy; the string-extraction path of the large
    regime, where no byte SBA ever exists). Reads past the last real word
    hit the zero tail and decode as '$'/'A' — callers bounds-check first."""
    from .encoding import UNRANK_TABLE

    pos = np.asarray(positions_u64, dtype=np.uint64)
    bpw = 16 if two_bit else 8
    bits = 2 if two_bit else 4
    field_mask = np.uint32((1 << bits) - 1)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8) if two_bit else UNRANK_TABLE
    out = np.empty((len(pos), length), dtype=np.uint8)
    for j in range(length):
        p = pos + np.uint64(j)
        w = packed_words[np.minimum(p // np.uint64(bpw),
                                    np.uint64(len(packed_words) - 1)).astype(np.int64)]
        sh = ((np.uint64(bpw - 1) - (p % np.uint64(bpw))) * np.uint64(bits)).astype(np.uint32)
        r = (w >> sh) & field_mask
        out[:, j] = lut[r]
    return out


def decode_strided_var_np(packed_words: np.ndarray, positions_u64, lens,
                          two_bit: bool) -> tuple[np.ndarray, np.ndarray]:
    """Variable-width decode from a strided pack: ``(data, offsets)`` with
    ``data[offsets[r] : offsets[r+1]]`` = the ASCII bases at
    ``positions[r] .. positions[r]+lens[r]-1`` — an arrow-style string
    column, the large-regime analog of ``Kmers._decode_var_bytes`` (suffix
    strings have per-row natural lengths; no byte SBA exists here). Work is
    O(total output bytes), fully vectorized: one gather per output byte off
    the strided words."""
    from .encoding import UNRANK_TABLE

    pos = np.asarray(positions_u64, dtype=np.uint64)
    L = np.asarray(lens, dtype=np.int64)
    offsets = np.zeros(len(pos) + 1, dtype=np.int64)
    np.cumsum(L, out=offsets[1:])
    total = int(offsets[-1])
    bpw = 16 if two_bit else 8
    bits = 2 if two_bit else 4
    field_mask = np.uint32((1 << bits) - 1)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8) if two_bit else UNRANK_TABLE
    # absolute base coordinate of every output byte
    j = np.arange(total, dtype=np.uint64) - np.repeat(
        offsets[:-1].astype(np.uint64), L
    )
    p = np.repeat(pos, L) + j
    w = packed_words[
        np.minimum(p // np.uint64(bpw), np.uint64(len(packed_words) - 1)).astype(np.int64)
    ]
    sh = ((np.uint64(bpw - 1) - (p % np.uint64(bpw))) * np.uint64(bits)).astype(np.uint32)
    r = (w >> sh) & field_mask
    return lut[r], offsets


@partial(jax.jit, static_argnames=("n",))
def _dense_pairs_jit(cum_excl, starts_hi, starts_lo, n):
    idx = jax.lax.iota(jnp.uint32, n)
    rec = (
        jnp.searchsorted(cum_excl, idx, side="right").astype(jnp.int32) - 1
    )
    off = idx - jnp.take(cum_excl, rec)
    return add64_u32(jnp.take(starts_hi, rec), jnp.take(starts_lo, rec), off)


def build_dense_positions_pairs(seg_starts_u64, seg_ends_u64, min_kmer_len):
    """The canonical dense k-mer start set as DEVICE (hi, lo) uint32 pairs —
    no host position array, no 24 B/k-mer tunnel upload (the large analog of
    Kmers._build_positions_device: per-record aranges become one iota +
    searchsorted over the cumulative-count table). Valid for indexes below
    2^31 rows per process (the uint32 row iota); larger index builds stay on
    the host-array path. Returns ((hi, lo), n)."""
    starts = np.asarray(seg_starts_u64, dtype=np.uint64)
    ends = np.asarray(seg_ends_u64, dtype=np.uint64)
    counts = (
        ends.astype(np.int64) - starts.astype(np.int64) + 1
    ) - int(min_kmer_len) + 1
    if (counts < 1).any():
        # a negative count would make cum_excl non-monotonic and the device
        # searchsorted silently misassign rows
        raise ValueError(
            "every segment must hold at least one k-mer "
            "(min_kmer_len exceeds a segment length)"
        )
    n = int(counts.sum())
    if n >= (1 << 31):
        raise ValueError("device dense pairs require < 2^31 rows")
    cum_excl = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.uint32)
    sh, sl = split64_np(starts)
    hi, lo = _dense_pairs_jit(
        jnp.asarray(cum_excl), jnp.asarray(sh), jnp.asarray(sl), n
    )
    return (hi, lo), n


def compute_valid_len64(pos_hi, pos_lo, starts_hi, starts_lo, ends_hi, ends_lo):
    """uint32-saturated bases-to-segment-end per position (the 64-bit analog
    of ops/keys.compute_valid_len; saturation at NO_CAP is lossless because
    caps are only ever min()'d with k <= 64)."""
    from .keys import NO_CAP

    seg = searchsorted64_right(starts_hi, starts_lo, pos_hi, pos_lo) - 1
    seg = jnp.maximum(seg, 0)
    ehi = jnp.take(ends_hi, seg)
    elo = jnp.take(ends_lo, seg)
    dhi, dlo = sub64(ehi, elo, pos_hi, pos_lo)
    vhi, vlo = add64_u32(dhi, dlo, 1)
    return jnp.where(vhi > 0, NO_CAP, jnp.minimum(vlo, NO_CAP))


