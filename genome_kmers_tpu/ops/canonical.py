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
bytes. Requires an ACGT-only alphabet and full-length (non-truncated) k-mers
with k <= 32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .keys import build_key2_words


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
    """Reverse-complement 2-bit key words (left-justified, k <= 32 bases).

    complement = bitwise NOT (A=0 <-> T=3, C=1 <-> G=2); reversal = 2-bit
    field reversal of the 32- or 64-bit container; the result is then
    left-shifted so the k valid fields stay left-justified with zero padding.
    """
    ones = jnp.uint32(0xFFFFFFFF)
    if len(words) == 1:
        (w0,) = words
        r = _reverse_2bit_fields(~w0 & ones)
        s = 2 * (16 - k)
        if s:
            r = (r << s) & ones
        # clear fields past k (complemented padding reversed into low bits)
        keep = ones << jnp.uint32(2 * (16 - k)) if k < 16 else ones
        return (r & keep,)
    w0, w1 = words
    r0 = _reverse_2bit_fields(~w1 & ones)  # 64-bit field reversal swaps words
    r1 = _reverse_2bit_fields(~w0 & ones)
    s = 2 * (32 - k)  # 0 <= s < 32 since 16 < k <= 32
    if s:
        n0 = ((r0 << s) | (r1 >> (32 - s))) & ones
        n1 = (r1 << s) & ones
    else:
        n0, n1 = r0, r1
    # zero fields past k across the 64-bit container
    rem = k - 16
    keep1 = (ones << jnp.uint32(2 * (16 - rem))) & ones if rem < 16 else ones
    return (n0, n1 & keep1)


@partial(jax.jit, static_argnames=("k",))
def canonical_key_words(packed2: jax.Array, positions: jax.Array, k: int) -> tuple:
    """min(forward key, revcomp key) per position, as 2-bit packed words.

    Positions must have >= k valid bases (caller filters by valid_len).
    """
    n_words = -(-k // 16)
    cap = jnp.full(positions.shape, k, dtype=jnp.uint32)
    fwd = build_key2_words(packed2, positions, cap, n_words, jnp.uint32(0))
    rc = revcomp_key_words(fwd, k)
    if n_words == 1:
        take_rc = rc[0] < fwd[0]
        return (jnp.where(take_rc, rc[0], fwd[0]),)
    lt = (rc[0] < fwd[0]) | ((rc[0] == fwd[0]) & (rc[1] < fwd[1]))
    return (
        jnp.where(lt, rc[0], fwd[0]),
        jnp.where(lt, rc[1], fwd[1]),
    )


def canonical_sort(packed2: jax.Array, positions: jax.Array, k: int):
    """Sort positions by canonical key; returns (sorted_positions,
    sorted_key_words). Ties break by position (deterministic)."""
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
