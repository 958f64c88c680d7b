"""Hybrid sort for genomes with sparse ambiguity (real chromosomes: ACGT
plus N runs at centromeres/telomeres).

An N anywhere in the alphabet disables the 2-bit fast path globally — but
k-mer windows that CONTAIN an ambiguous base are typically a small minority.
This module splits the positions:

  * majority (windows free of non-ACGT bases) — sorted on the 2-bit key path;
  * minority (windows covering an ambiguous base) — sorted on the 4-bit
    (full-IUPAC) key path;

then interleaves the two sorted streams exactly. Key facts that make the
merge exact and cheap:

  * restricted to ACGT-only k-mers, 4-bit order == 2-bit+cap order (both are
    byte-lexicographic with shorter-prefix-equal => smaller), so the two
    streams share one total order;
  * a minority k-mer can never tie a majority k-mer under the capped compare
    (equal strings would have to both contain and not contain a non-ACGT
    character), so insertion ranks are unambiguous — a binary search of each
    minority row against the majority stream (O(m log n) gathers) suffices;
  * the final interleave is pure gather arithmetic (no scatter): output slot
    t holds minority[j] if t == ins[j] + j for some j, else
    majority[t - (#minority before t)].

The boundary/statistics stages stay on the 4-bit path for such genomes
(group identity must see the ambiguous bases), which is exact and cheap
relative to the sort.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .keys import build_key_words, cap_lengths, compute_valid_len
from .sort import _cdiv, sort_positions


@jax.jit
def ambiguity_mask(next_amb: jax.Array, positions: jax.Array, cap_len: jax.Array):
    """True where the capped window [p, p + cap) covers a non-ACGT base.
    ``next_amb`` is filters._next_ambiguous of the SBA."""
    na = jnp.take(next_amb, positions.astype(jnp.int32), mode="clip")
    return na < positions + cap_len


def _lex_less(a: tuple, b: tuple) -> jax.Array:
    lt = jnp.zeros(a[0].shape, dtype=bool)
    eq = jnp.ones(a[0].shape, dtype=bool)
    for wa, wb in zip(a, b):
        lt = lt | (eq & (wa < wb))
        eq = eq & (wa == wb)
    return lt


def _insertion_ranks_impl(packed, m_pos, m_cap, a_pos, a_cap, n_words):
    """For each minority row, its insertion index into the sorted majority
    stream under the 4-bit key order (no ties possible across streams)."""
    n = m_pos.shape[0]
    nq = a_pos.shape[0]
    q_words = build_key_words(packed, a_pos, a_cap, n_words, jnp.uint32(0))
    lo = jnp.zeros(nq, dtype=jnp.int32)
    hi = jnp.full(nq, n, dtype=jnp.int32)
    rounds = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)

    def body(_, state):
        lo, hi = state
        active = lo < hi
        mid = (lo + hi) >> 1
        pos = jnp.take(m_pos, mid, mode="clip")
        cap = jnp.take(m_cap, mid, mode="clip")
        kw = build_key_words(packed, pos, cap, n_words, jnp.uint32(0))
        go_right = _lex_less(kw, q_words)
        lo = jnp.where(active & go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, rounds, body, (lo, hi))
    return lo


def _interleave(m_pos, a_pos, a_out_idx):
    """out[t] = a_pos[j] if t == a_out_idx[j] else m_pos[t - (#a before t)].
    Gather-only construction; a_out_idx must be strictly increasing."""
    n = m_pos.shape[0] + a_pos.shape[0]
    t = jnp.arange(n, dtype=jnp.int32)
    a_before = jnp.searchsorted(a_out_idx, t, side="right").astype(jnp.int32)
    prev_a = jnp.take(a_out_idx, jnp.maximum(a_before - 1, 0), mode="clip")
    is_a = (a_before > 0) & (prev_a == t)
    from_a = jnp.take(a_pos, jnp.maximum(a_before - 1, 0), mode="clip")
    from_m = jnp.take(m_pos, jnp.clip(t - a_before, 0, max(m_pos.shape[0] - 1, 0)), mode="clip")
    return jnp.where(is_a, from_a, from_m)


def hybrid_sort_positions(
    packed: jax.Array,
    packed2: jax.Array,
    positions: jax.Array,
    seg_starts: jax.Array,
    seg_ends: jax.Array,
    max_kmer_len: int,
    next_amb: jax.Array,
    uniform_cap: bool = False,
) -> jax.Array:
    """Sort positions of a sparsely-ambiguous genome: 2-bit fast path for
    clean windows, 4-bit for ambiguous ones, exact binary-search interleave.

    Caps are derived internally from the segment extents (pure function of
    position, so each stream re-derives them after its own sort). Requires
    bounded ``max_kmer_len`` <= 64. The split sizes are data-dependent, so
    one boolean mask syncs to the host; the streams then run with concrete
    shapes (bucketed as usual downstream).
    """
    if max_kmer_len is None or max_kmer_len > 64:
        raise NotImplementedError("hybrid sort requires max_kmer_len <= 64")
    n = positions.shape[0]
    if n <= 1:
        return positions

    def caps_of(p):
        return cap_lengths(compute_valid_len(p, seg_starts, seg_ends), max_kmer_len)

    cap_len = caps_of(positions)
    amb = ambiguity_mask(next_amb, positions, cap_len)
    amb_np = np.asarray(amb)
    a_idx = np.flatnonzero(amb_np)
    if a_idx.size == 0:
        return sort_positions(None, positions, cap_len, max_kmer_len,
                              packed2=packed2, uniform_cap=uniform_cap)
    # densely ambiguous input: the split buys nothing — run everything 4-bit
    if a_idx.size * 4 > n:
        return sort_positions(packed, positions, cap_len, max_kmer_len)
    m_idx = np.flatnonzero(~amb_np)

    m_sel = jnp.asarray(m_idx.astype(np.int32))
    a_sel = jnp.asarray(a_idx.astype(np.int32))
    m_pos = jnp.take(positions, m_sel)
    a_pos = jnp.take(positions, a_sel)

    m_sorted = sort_positions(None, m_pos, caps_of(m_pos), max_kmer_len,
                              packed2=packed2, uniform_cap=uniform_cap)
    a_sorted = sort_positions(packed, a_pos, caps_of(a_pos), max_kmer_len)

    n_words = _cdiv(max_kmer_len, 8)
    ins = _insertion_ranks_impl(
        packed, m_sorted, caps_of(m_sorted), a_sorted, caps_of(a_sorted), n_words
    )
    a_out_idx = ins + jnp.arange(a_sorted.shape[0], dtype=jnp.int32)
    return _interleave(m_sorted, a_sorted, a_out_idx)
