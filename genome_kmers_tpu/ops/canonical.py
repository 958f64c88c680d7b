"""Canonical (strand-collapsed) k-mer keys — EXTENSION beyond the reference.

The reference declares both-strand handling (``source_strand="both"``,
``track_strands_separately``) but raises NotImplementedError
(reference kmers.py:689-696). This module implements the canonical-k-mer
convention used by k-mer counters (BASELINE.json config 5): each k-mer is
identified with min(kmer, revcomp(kmer)), so a k-mer and its reverse
complement count as one.

TPU-native formulation: on the 2-bit packing (A=0 C=1 G=2 T=3) the reverse
complement of a key is bit-arithmetic — complement = XOR all-ones (A<->T,
C<->G), reversal = 2-bit-field reversal via masked shifts — so canonical keys
are computed from the forward packed words without touching the genome
bytes. Full-length (non-truncated) k-mers only.

ROUND 5: IUPAC genomes take the 4-BIT lane variant — per-nibble rank-space
complement (a 256-entry byte-pair table applied per uint32 byte, mapping
R<->Y, K<->M, B<->V, D<->H; N, S, W self-complementary — reference
sequence_collection.py:402-433) + 4-bit field reversal. Ranks are
ASCII-ordered (ops/encoding.py), so min(fwd, rc) over the packed words IS
min of the ASCII strings — the same canonical convention, exact on any
IUPAC genome.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .encoding import COMPLEMENT_PAIRS, RANK_TABLE
from .keys import build_key2_words, build_key_words

# 4-bit rank -> rank of the IUPAC complement ('$' -> '$': rank 0 -> 0)
_COMP_RANK = np.zeros(16, dtype=np.uint8)
for _ch, _cc in COMPLEMENT_PAIRS.items():
    _COMP_RANK[RANK_TABLE[ord(_ch)]] = RANK_TABLE[ord(_cc)]
# byte-level pair table: complements BOTH nibbles of a byte in one lookup
_COMP_BYTE = np.zeros(256, dtype=np.uint32)
for _b in range(256):
    _COMP_BYTE[_b] = (np.uint32(_COMP_RANK[_b >> 4]) << 4) | _COMP_RANK[_b & 0xF]


@jax.jit
def _reverse_2bit_fields(x: jax.Array) -> jax.Array:
    """Reverse the order of the 16 2-bit fields within each uint32."""
    x = (x >> 16) | (x << 16)
    x = ((x & jnp.uint32(0xFF00FF00)) >> 8) | ((x & jnp.uint32(0x00FF00FF)) << 8)
    x = ((x & jnp.uint32(0xF0F0F0F0)) >> 4) | ((x & jnp.uint32(0x0F0F0F0F)) << 4)
    x = ((x & jnp.uint32(0xCCCCCCCC)) >> 2) | ((x & jnp.uint32(0x33333333)) << 2)
    return x


@partial(jax.jit, static_argnames=("k",))
def revcomp_key_words(words: tuple, k: int) -> tuple:
    """Reverse-complement 2-bit key words (left-justified, k <= 16*len(words)
    bases, any word count).

    complement = bitwise NOT (A=0 <-> T=3, C=1 <-> G=2); reversal = 2-bit
    field reversal of the whole 32W-bit container (reverse word order +
    reverse fields within each word); the result is then left-shifted by the
    (16W - k)-field padding so the k valid fields stay left-justified, and
    fields past k are cleared (complemented padding reversed into low bits).
    """
    ones = jnp.uint32(0xFFFFFFFF)
    W = len(words)
    # reversed container: word i <- rev_fields(~word_{W-1-i})
    rev = [_reverse_2bit_fields(~words[W - 1 - i] & ones) for i in range(W)]
    # left-shift by f = 16W - k fields across word boundaries
    f = 16 * W - k
    q, r2 = f // 16, 2 * (f % 16)
    out = []
    for i in range(W):
        hi = rev[i + q] if i + q < W else jnp.zeros_like(rev[0])
        lo = rev[i + q + 1] if i + q + 1 < W else jnp.zeros_like(rev[0])
        if r2:
            out.append(((hi << r2) | (lo >> (32 - r2))) & ones)
        else:
            out.append(hi)
    # clear fields past k
    full_words = k // 16
    rem = k % 16
    for i in range(W):
        if i < full_words:
            continue
        if i == full_words and rem:
            out[i] = out[i] & ((ones << jnp.uint32(2 * (16 - rem))) & ones)
        else:
            out[i] = jnp.zeros_like(out[i])
    return tuple(out)


@jax.jit
def _reverse_4bit_fields(x: jax.Array) -> jax.Array:
    """Reverse the order of the 8 4-bit fields within each uint32."""
    x = (x >> 16) | (x << 16)
    x = ((x & jnp.uint32(0xFF00FF00)) >> 8) | ((x & jnp.uint32(0x00FF00FF)) << 8)
    x = ((x & jnp.uint32(0xF0F0F0F0)) >> 4) | ((x & jnp.uint32(0x0F0F0F0F)) << 4)
    return x


@jax.jit
def _complement_nibbles(x: jax.Array) -> jax.Array:
    """Apply the IUPAC rank-space complement to every 4-bit field (four
    byte-pair table lookups per word)."""
    t = jnp.asarray(_COMP_BYTE)
    out = jnp.zeros_like(x)
    for sh in (0, 8, 16, 24):
        b = ((x >> jnp.uint32(sh)) & jnp.uint32(0xFF)).astype(jnp.int32)
        out = out | (jnp.take(t, b) << jnp.uint32(sh))
    return out


@partial(jax.jit, static_argnames=("k",))
def revcomp_key_words4(words: tuple, k: int) -> tuple:
    """Reverse-complement 4-BIT (IUPAC) key words — the nibble-lane analog
    of ``revcomp_key_words``: per-nibble rank complement, 4-bit field
    reversal of the whole container, left-justify, clear fields past k.
    Full-length k-mers only (no in-word terminators within the k fields)."""
    from .encoding import NIBBLE_MASKS

    ones = jnp.uint32(0xFFFFFFFF)
    W = len(words)
    rev = [
        _reverse_4bit_fields(_complement_nibbles(words[W - 1 - i]))
        for i in range(W)
    ]
    f = 8 * W - k
    q, r4 = f // 8, 4 * (f % 8)
    out = []
    for i in range(W):
        hi = rev[i + q] if i + q < W else jnp.zeros_like(rev[0])
        lo = rev[i + q + 1] if i + q + 1 < W else jnp.zeros_like(rev[0])
        if r4:
            out.append(((hi << r4) | (lo >> (32 - r4))) & ones)
        else:
            out.append(hi)
    masks = jnp.asarray(NIBBLE_MASKS)
    full_words = k // 8
    rem = k % 8
    for i in range(W):
        if i < full_words:
            continue
        if i == full_words and rem:
            out[i] = out[i] & masks[rem]
        else:
            out[i] = jnp.zeros_like(out[i])
    return tuple(out)


def revcomp_words_any(words: tuple, k: int, two_bit: bool) -> tuple:
    """Encoding-dispatching reverse complement of left-justified key words."""
    return revcomp_key_words(words, k) if two_bit else revcomp_key_words4(words, k)


@partial(jax.jit, static_argnames=("k",))
def canonical_key_words(packed2: jax.Array, positions: jax.Array, k: int) -> tuple:
    """min(forward key, revcomp key) per position, as 2-bit packed words.

    Positions must have >= k valid bases (caller filters by valid_len).
    """
    n_words = -(-k // 16)
    cap = jnp.full(positions.shape, k, dtype=jnp.uint32)
    fwd = build_key2_words(packed2, positions, cap, n_words, jnp.uint32(0))
    rc = revcomp_key_words(fwd, k)
    lt = jnp.zeros(positions.shape, dtype=bool)
    eq = jnp.ones(positions.shape, dtype=bool)
    for a, b in zip(rc, fwd):
        lt = lt | (eq & (a < b))
        eq = eq & (a == b)
    return tuple(jnp.where(lt, a, b) for a, b in zip(rc, fwd))


def _canonical_sizes_tail(lead, fwd, payload, k: int, two_bit: bool = True):
    """Shared tail of both statistics kernels: fold forward key words to
    canonical min(key, revcomp), sort, and reduce to group sizes + the
    qualifying mask + the ``[total, hi]`` digest (stage 1 of the adaptive
    histogram — the host sizes the stage-2 bin count by ``hi``, see
    ops/groups.sizes_digest).

    ``payload`` rides as the stable-sort payload, not a key (one less sort
    lane). Tie ORDER within a canonical group is unobservable here — this
    tail returns only group sizes, which depend on the sorted KEYS alone —
    so input order doesn't matter (unlike ops/sort.py's gather paths, where
    the position tie-break is part of the output contract).
    """
    from .groups import _qualify_digest, group_sizes_at_boundaries

    n_words = len(fwd)
    rc = revcomp_words_any(fwd, k, two_bit)
    lt = jnp.zeros(payload.shape, dtype=bool)
    eq = jnp.ones(payload.shape, dtype=bool)
    for a, b in zip(rc, fwd):
        lt = lt | (eq & (a < b))
        eq = eq & (a == b)
    words = tuple(jnp.where(lt, a, b) for a, b in zip(rc, fwd))

    res = jax.lax.sort(
        (lead,) + words + (payload,), num_keys=n_words + 1, is_stable=True
    )
    s_lead = res[0]
    s_words = res[1 : 1 + n_words]

    eqb = jnp.ones(payload.shape[0], dtype=bool)
    for w in (s_lead,) + tuple(s_words):
        prev = jnp.concatenate([w[:1], w[:-1]])
        eqb = eqb & (w == prev)
    boundary = (~eqb).at[0].set(True)
    size = group_sizes_at_boundaries(boundary)
    # the qualifying rule here is "real full-length row" (invalid tail
    # excluded); group-size bounds don't apply to canonical stats, so the
    # size-range terms are passed wide open
    qualifies, digest = _qualify_digest(
        boundary & (s_lead == jnp.uint32(0)), size, jnp.uint32(0),
        jnp.uint32(0xFFFFFFF0),
    )
    return size, qualifies, digest


@partial(jax.jit, static_argnames=("k",))
def canonical_sizes_digest(
    packed2: jax.Array,
    positions: jax.Array,
    valid_len: jax.Array,
    k: int,
):
    """Canonical group sizes + qualifying mask + ``[total, hi]`` digest over
    ALL positions, as ONE compiled program (adaptive-histogram stage 1).

    Truncated k-mers (valid_len < k, including shape-bucketing padding rows
    whose valid_len is 0) ride a leading invalid lane that sorts them after
    every real row with zeroed key words; the invalid tail block is excluded
    by the qualifies mask. This replaces the old host-side full-length
    selection, which downloaded valid_len and re-uploaded survivor indices
    (~8 N bytes of round-trip over the device link).
    """
    n_words = -(-k // 16)
    valid = valid_len >= jnp.uint32(k)
    lead = (~valid).astype(jnp.uint32)
    cap = jnp.where(valid, jnp.uint32(k), jnp.uint32(0))
    fwd = build_key2_words(packed2, positions, cap, n_words, jnp.uint32(0))
    return _canonical_sizes_tail(lead, fwd, positions, k)


@partial(jax.jit, static_argnames=("k",))
def canonical_sizes_digest4(
    packed: jax.Array,
    positions: jax.Array,
    valid_len: jax.Array,
    k: int,
):
    """IUPAC (4-bit lane) variant of ``canonical_sizes_digest`` — round 5:
    canonical statistics no longer require an ACGT-only genome."""
    n_words = -(-k // 8)
    valid = valid_len >= jnp.uint32(k)
    lead = (~valid).astype(jnp.uint32)
    cap = jnp.where(valid, jnp.uint32(k), jnp.uint32(0))
    fwd = build_key_words(packed, positions, cap, n_words, jnp.uint32(0))
    return _canonical_sizes_tail(lead, fwd, positions, k, two_bit=False)


@partial(jax.jit, static_argnames=("k", "two_bit"))
def _canonical_sizes_dense_jit(packed_e, seg_starts, seg_ends, min_len, k: int,
                               two_bit: bool = True):
    from .keys import build_key2_words_dense, build_key_words_dense, valid_len_all

    n_words = -(-k // (16 if two_bit else 8))
    L = packed_e.shape[0]
    iota = jax.lax.iota(jnp.uint32, L)
    vl = valid_len_all(seg_starts, seg_ends, iota)
    # index membership (vl >= min_kmer_len) AND full length (vl >= k) —
    # equal to the gather kernel's valid mask over the dense start set
    valid = vl >= jnp.maximum(jnp.uint32(k), min_len)
    lead = (~valid).astype(jnp.uint32)
    cap = jnp.where(valid, jnp.uint32(k), jnp.uint32(0))
    build = build_key2_words_dense if two_bit else build_key_words_dense
    fwd = build(packed_e, cap, n_words)
    return _canonical_sizes_tail(lead, fwd, iota, k, two_bit=two_bit)


def canonical_sizes_digest_dense(
    packed2, seg_starts, seg_ends, min_kmer_len: int, k: int,
    two_bit: bool = True,
):
    """Gather-free dense variant of ``canonical_sizes_digest`` — valid
    while the index is the canonical dense start set (every position with
    valid_len >= min_kmer_len, i.e. a FRESH ``Kmers`` whose positions were
    never customized).

    Forward key words for ALL SBA positions are shifted SLICES of the 2-bit
    pack (keys.build_key2_words_dense) and valid_len is a scatter + cummax
    (keys.valid_len_all) — no per-row gathers at all, the same formulation
    as ops/sort.sort_positions_dense. Rows that are not full-length k-mer
    starts (separators, short tails, bucket padding) carry the leading
    invalid lane with zeroed words, exactly like the gather kernel's
    truncated rows. Output is bit-identical to the gather kernel over the
    dense start set.
    """
    from .sort import _bucket, _pad_to

    L = packed2.shape[0]
    n_pad = _bucket(L)
    packed2 = _pad_to(packed2, n_pad, jnp.uint32(0))  # pad rows fall past the last
    # seg_end, so valid_len_all yields 0 for them; the fill value itself is
    # never observed (cap masks every slice read)
    return _canonical_sizes_dense_jit(
        packed2, seg_starts, seg_ends, jnp.uint32(min_kmer_len), k,
        two_bit=two_bit,
    )


def canonical_sort(packed2: jax.Array, positions: jax.Array, k: int):
    """Sort positions by canonical key; returns (sorted_positions,
    sorted_key_words). Ties break by position (deterministic) — an explicit
    key, so any input order is accepted."""
    words = canonical_key_words(packed2, positions, k)
    ops = words + (positions,)
    res = jax.lax.sort(ops, num_keys=len(ops))
    return res[-1], res[: len(words)]


@jax.jit
def _adjacent_eq_words(words: tuple) -> jax.Array:
    eq = jnp.ones(words[0].shape[0], dtype=bool)
    for w in words:
        prev = jnp.concatenate([w[:1], w[:-1]])
        eq = eq & (w == prev)
    return eq.at[0].set(False)


def canonical_boundaries(sorted_words: tuple) -> jax.Array:
    """Group-boundary mask over canonically sorted key words."""
    return ~_adjacent_eq_words(sorted_words)
