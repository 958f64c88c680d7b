"""Device-side k-mer key construction.

A k-mer is identified by its start position in the SBA (reference kmers.py:811).
Its sort key is the sequence of 4-bit ranks of its bases, zero-padded past the
end of its segment (see encoding.py for why this reproduces the reference's
comparator, kmers.py:306-397). Keys are materialized as ``W = ceil(k/8)``
uint32 words gathered from the precomputed packed-rank array ``P`` — W gathers
per k-mer instead of the reference's byte-at-a-time comparator loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .encoding import (
    BASES_PER_WORD,
    BASES_PER_WORD2,
    DIBIT_MASKS,
    NIBBLE_MASKS,
    RANK2_TABLE,
    RANK_TABLE,
)

# Sentinel "infinite" cap used when max_kmer_len is None. Must exceed any
# possible segment length while staying < 2**32 (uint32 arithmetic).
NO_CAP = jnp.uint32(0xFFFFFFF0)


@jax.jit
def ascii_to_ranks(sba_u8: jax.Array) -> jax.Array:
    """Map ASCII bytes to 4-bit ranks (uint8)."""
    return jnp.take(jnp.asarray(RANK_TABLE), sba_u8.astype(jnp.int32))


@jax.jit
def pack_rank_words(sba_u8: jax.Array) -> jax.Array:
    """P[i] = ranks of bytes i..i+7, nibble-packed big-endian into uint32.

    Built with 8 shifted adds over the rank array — one pass, O(8N), runs on
    the VPU. Positions past the array end pack as 0.
    """
    n = sba_u8.shape[0]
    ranks = ascii_to_ranks(sba_u8).astype(jnp.uint32)
    padded = jnp.zeros(n + BASES_PER_WORD - 1, dtype=jnp.uint32).at[:n].set(ranks)
    out = jnp.zeros(n, dtype=jnp.uint32)
    for j in range(BASES_PER_WORD):
        out = out | (jax.lax.dynamic_slice(padded, (j,), (n,)) << (4 * (7 - j)))
    return out


@jax.jit
def compute_seg_ends(seg_starts: jax.Array, sba_len) -> jax.Array:
    """Per-segment inclusive end index.

    seg_ends[i] = seg_starts[i+1] - 2 (skip the '$'), last segment ends at
    sba_len - 1 (reference sequence_collection.py:155-187).
    """
    sba_len = jnp.uint32(sba_len)
    shifted = jnp.concatenate(
        [seg_starts[1:] - jnp.uint32(2), jnp.array([sba_len - jnp.uint32(1)], dtype=jnp.uint32)]
    )
    return shifted


@jax.jit
def segment_ids_for_positions(positions: jax.Array, seg_starts: jax.Array) -> jax.Array:
    """Batched segment lookup: searchsorted(seg_starts, pos, 'right') - 1.

    The vectorized equivalent of the reference's per-call binary search
    (sequence_collection.py:76-97).
    """
    return (
        jnp.searchsorted(seg_starts, positions, side="right").astype(jnp.uint32)
        - jnp.uint32(1)
    )


@jax.jit
def compute_valid_len(positions: jax.Array, seg_starts: jax.Array, seg_ends: jax.Array) -> jax.Array:
    """Number of real bases from each position to the end of its segment.

    valid_len[p] = seg_end(segment containing p) - p + 1. Replaces the
    reference's in-band '$' probing (kmers.py:361-362) with precomputed
    per-position extents — TPUs prefer masks to data-dependent branches.
    """
    seg_ids = segment_ids_for_positions(positions, seg_starts)
    ends = jnp.take(seg_ends, seg_ids.astype(jnp.int32))
    return ends - positions + jnp.uint32(1)


@partial(jax.jit, static_argnames=("n_words",))
def build_key_words(
    packed: jax.Array,
    positions: jax.Array,
    cap_len: jax.Array,
    n_words: int,
    offset=jnp.uint32(0),
) -> tuple[jax.Array, ...]:
    """Build ``n_words`` uint32 key words for each position.

    Word w of the key for position p covers bases [offset + 8w, offset + 8w+8).
    Nibbles at or beyond ``cap_len`` bases from p (cap_len = min(valid_len,
    max_kmer_len)) are zeroed, so comparison terminates exactly where the
    reference's comparator would stop (kmers.py:360-393).
    """
    masks = jnp.asarray(NIBBLE_MASKS)
    offset = jnp.uint32(offset)
    words = []
    for w in range(n_words):
        off = offset + jnp.uint32(8 * w)
        word = jnp.take(packed, (positions + off).astype(jnp.int32), mode="clip")
        # r = clamp(cap_len - off, 0, 8) without uint32 underflow
        beyond = cap_len > off
        r = jnp.where(beyond, jnp.minimum(cap_len - off, jnp.uint32(8)), jnp.uint32(0))
        word = word & jnp.take(masks, r.astype(jnp.int32))
        words.append(word)
    return tuple(words)


def cap_lengths(valid_len: jax.Array, max_kmer_len) -> jax.Array:
    """min(valid_len, max_kmer_len), with max_kmer_len=None meaning unbounded."""
    if max_kmer_len is None:
        return valid_len
    return jnp.minimum(valid_len, jnp.uint32(max_kmer_len))


# --------------------------------------------------------------------------- #
# dense key builds: key words for EVERY position 0..L-1 at once.
#
# ``build_key{2,}_words`` gather ``packed[positions + off]`` per row — fine
# for arbitrary position sets, but TPU gathers serialize: at 2^24 rows the
# two gathers of the k=31 build cost ~304 ms on v5e, ~80% of the whole
# index build. When positions are ALL positions (the fresh-sort case —
# Kmers always indexes the full canonical start set), the gather is a
# shifted SLICE of the packed array (word w of position p = packed[p + bpw*w])
# — measured 47 ms for the same two words. Invalid rows (separators,
# segment tails shorter than min_kmer_len) are folded by the caller.
# --------------------------------------------------------------------------- #


def _dense_words(packed: jax.Array, cap_len, n_words: int, bases_per_word: int,
                 bits: int) -> tuple[jax.Array, ...]:
    L = packed.shape[0]
    src = jnp.concatenate(
        [packed, jnp.zeros((bases_per_word * n_words,), dtype=jnp.uint32)]
    )
    full = jnp.uint32(0xFFFFFFFF)
    words = []
    for w in range(n_words):
        off = bases_per_word * w
        word = jax.lax.slice(src, (off,), (off + L,))
        # zero fields at/past cap_len: mask = 0xFFFFFFFF << (32 - bits*keep),
        # computed with shifts (no mask-table gather); keep==0 selected out
        # because a 32-bit shift is undefined
        beyond = cap_len > jnp.uint32(off)
        keep = jnp.where(
            beyond,
            jnp.minimum(cap_len - jnp.uint32(off), jnp.uint32(bases_per_word)),
            jnp.uint32(0),
        )
        nbits = keep * jnp.uint32(bits)
        shift = jnp.minimum(jnp.uint32(32) - nbits, jnp.uint32(31))
        mask = jnp.where(nbits == 0, jnp.uint32(0), full << shift)
        words.append(word & mask)
    return tuple(words)


def build_key2_words_dense(packed2: jax.Array, cap_len, n_words: int):
    """2-bit key words for every position 0..L-1 (slice build, no gather).
    Bit-identical to ``build_key2_words(packed2, arange(L), cap_len, n_words)``."""
    return _dense_words(packed2, cap_len, n_words, BASES_PER_WORD2, 2)


def build_key_words_dense(packed: jax.Array, cap_len, n_words: int):
    """4-bit key words for every position 0..L-1 (slice build, no gather).
    Bit-identical to ``build_key_words(packed, arange(L), cap_len, n_words)``."""
    return _dense_words(packed, cap_len, n_words, BASES_PER_WORD, 4)


@jax.jit
def valid_len_all(seg_starts: jax.Array, seg_ends: jax.Array, iota: jax.Array):
    """valid_len for EVERY position 0..L-1 without a searchsorted gather.

    Scatter each segment's inclusive end at its start index, forward-fill
    with cummax (seg_ends are strictly increasing), then
    vl[p] = end_fill[p] - p + 1 where p <= end_fill else 0 — separators and
    any padding past the last segment land at 0. Equals
    ``compute_valid_len(arange(L), seg_starts, seg_ends)`` on real positions.
    """
    L = iota.shape[0]
    markers = (
        jnp.zeros((L,), dtype=jnp.uint32)
        .at[seg_starts.astype(jnp.int32)]
        .max(seg_ends)
    )
    end_fill = jax.lax.cummax(markers)
    inside = iota <= end_fill
    return jnp.where(inside, end_fill - iota + jnp.uint32(1), jnp.uint32(0))


# --------------------------------------------------------------------------- #
# strided-pack expansion: per-position words from a host-built strided pack.
# The strided pack (ops/large.pack_rank{2,}_strided_np) is 1/4 (2-bit) or 1/2
# (4-bit) the bytes of the ASCII SBA, so uploading it instead of the bytes
# cuts the host->device ingest transfer accordingly (measured ~4 MB/s on the
# remote-tunnel backend — the transfer, not the pack, is the ingest cost).
# The expansion is a funnel shift: out[i] = S[i/bpw] << r | S[i/bpw+1] >> 32-r.
# --------------------------------------------------------------------------- #


def _expand_strided(packed_s: jax.Array, n: int, log2_bpw: int, bits: int) -> jax.Array:
    # repeat/shift formulation, NOT a gather: jnp.take(S, i >> log2_bpw) is
    # 12x slower on v5e (311 ms vs 25 ms at 2^24 — TPU gathers serialize,
    # while repeat lowers to broadcast+reshape on the VPU)
    bpw = 1 << log2_bpw
    nw = -(-n // bpw) if n else 0
    a = jnp.repeat(packed_s[:nw], bpw)[:n]
    b = jnp.repeat(packed_s[1 : nw + 1], bpw)[:n]
    r = (jnp.arange(n, dtype=jnp.uint32) & jnp.uint32(bpw - 1)) * jnp.uint32(bits)
    # guard the undefined >>32 at r == 0
    return jnp.where(r == 0, a, (a << r) | (b >> (jnp.uint32(32) - r)))


@partial(jax.jit, static_argnames=("n",))
def expand_strided2(packed2_s: jax.Array, n: int) -> jax.Array:
    """Per-position 2-bit words from a strided pack — bit-identical to
    ``pack_rank2_words`` of the original bytes. ``packed2_s`` must carry at
    least one trailing zero word (the host packers append 8) so the clipped
    ``q+1`` gather at the array edge reads rank 0."""
    return _expand_strided(packed2_s, n, 4, 2)


@partial(jax.jit, static_argnames=("n",))
def expand_strided4(packed_s: jax.Array, n: int) -> jax.Array:
    """Per-position 4-bit words from a strided pack — bit-identical to
    ``pack_rank_words`` of the original bytes (same trailing-zero-word
    requirement as ``expand_strided2``)."""
    return _expand_strided(packed_s, n, 3, 4)


# --------------------------------------------------------------------------- #
# 2-bit fast path (see encoding.py: requires alphabet subset of {A,C,G,T,$}
# and an explicit cap key lane alongside the words)
# --------------------------------------------------------------------------- #


@jax.jit
def pack_rank2_words(sba_u8: jax.Array) -> jax.Array:
    """P2[i] = 2-bit ranks of bytes i..i+15, packed big-endian into uint32."""
    n = sba_u8.shape[0]
    ranks = jnp.take(jnp.asarray(RANK2_TABLE), sba_u8.astype(jnp.int32)).astype(jnp.uint32)
    padded = jnp.zeros(n + BASES_PER_WORD2 - 1, dtype=jnp.uint32).at[:n].set(ranks)
    out = jnp.zeros(n, dtype=jnp.uint32)
    for j in range(BASES_PER_WORD2):
        out = out | (jax.lax.dynamic_slice(padded, (j,), (n,)) << (2 * (15 - j)))
    return out


@partial(jax.jit, static_argnames=("n_words",))
def build_key2_words(
    packed2: jax.Array,
    positions: jax.Array,
    cap_len: jax.Array,
    n_words: int,
    offset=jnp.uint32(0),
) -> tuple[jax.Array, ...]:
    """``n_words`` uint32 2-bit-packed key words per position; word w covers
    bases [offset + 16w, offset + 16w + 16). Fields at or beyond cap_len are
    zeroed (the cap itself must ride as a separate key lane)."""
    masks = jnp.asarray(DIBIT_MASKS)
    offset = jnp.uint32(offset)
    words = []
    for w in range(n_words):
        off = offset + jnp.uint32(BASES_PER_WORD2 * w)
        word = jnp.take(packed2, (positions + off).astype(jnp.int32), mode="clip")
        beyond = cap_len > off
        r = jnp.where(beyond, jnp.minimum(cap_len - off, jnp.uint32(16)), jnp.uint32(0))
        word = word & jnp.take(masks, r.astype(jnp.int32))
        words.append(word)
    return tuple(words)
