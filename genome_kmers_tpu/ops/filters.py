"""K-mer filters: vectorized TPU masks + scalar parity implementations.

The reference implements filters as Numba closures called once per k-mer from
inside the sequential group walk (kmers.py:14-259, applied at kmers.py:584-587).
Here each filter is an object with two faces:

  * ``__call__(sba, sba_strand, kmer_sba_start_idx) -> bool`` — scalar,
    host-side, semantics-identical to the reference closure (including which
    ValueError fires first). Used for parity tests and as a fallback for the
    generic walk.
  * ``batch_mask(ctx) -> jnp.ndarray[bool]`` — one vectorized mask over every
    k-mer start position, built from O(N) precomputed scans (GC prefix sums,
    run lengths, next-ambiguous-base pointers) instead of per-k-mer loops.

Exact-parity notes (verified against reference control flow):
  * homopolymer: overflow ValueError precedes everything; ``kmer_len <
    max_homopolymer_size`` returns True *before* any '$' check (kmers.py:66-74).
  * GC: the impossible-range short-circuit returns False before touching the
    SBA (kmers.py:167-168); a k-mer whose GC count exceeds the max *before*
    reaching a '$' returns False without raising (kmers.py:176-185).
  * no-ambiguous: a non-ACGT base found before a '$' returns False without
    raising (kmers.py:216-227).
  * CRISPR PAM: reads raw bytes at +21/+22 with no '$' check (kmers.py:252-258).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_DOLLAR = ord("$")
_ACGT = frozenset((ord("A"), ord("C"), ord("G"), ord("T")))
_BIG = jnp.uint32(0xFFFFFFF0)


class FilterContext:
    """Per-call device context handed to ``batch_mask``.

    Holds the SBA and the k-mer start positions plus lazily computed scans
    shared between filters.
    """

    def __init__(self, sba_u8: np.ndarray, positions, valid_len, sba_dev=None,
                 valid_rows=None, scans=None):
        self.sba_np = sba_u8
        self.sba_len = int(len(sba_u8))
        self._sba_dev = sba_dev
        self.positions = positions  # device uint32
        self.valid_len = valid_len  # device uint32
        # valid_rows: optional bool mask (numpy) — rows to consider for the
        # host-side error checks. Used by the mesh path, whose ragged layouts
        # carry padding rows whose positions/valid_len are sentinels; the
        # device mask (mask_pure) is computed for every row regardless.
        self.valid_rows = valid_rows
        # scans: optional provider with gc_cumsum/run_len/next_amb properties
        # (the SequenceCollection device cache) so the O(N) genome scans are
        # computed once per strand, not once per query
        self._scans = scans
        self._gc_cumsum = None
        self._run_len = None
        self._next_amb = None

    def _rows(self, condition: np.ndarray) -> np.ndarray:
        """Apply the validity mask to a host-side error condition."""
        if self.valid_rows is None:
            return condition
        return condition & self.valid_rows

    @property
    def sba(self):
        if callable(self._sba_dev):
            # lazy provider (e.g. the SequenceCollection device cache) so a
            # filter that never reads SBA bytes never triggers the upload
            self._sba_dev = self._sba_dev()
        if self._sba_dev is None:
            self._sba_dev = jnp.asarray(self.sba_np)
        return self._sba_dev

    @property
    def gc_cumsum(self):
        if self._gc_cumsum is None:
            if self._scans is not None:
                self._gc_cumsum = self._scans.gc_cumsum
            else:
                self._gc_cumsum = _gc_cumsum(self.sba)
        return self._gc_cumsum

    @property
    def run_len(self):
        if self._run_len is None:
            if self._scans is not None:
                self._run_len = self._scans.run_len
            else:
                self._run_len = _run_lengths(self.sba)
        return self._run_len

    @property
    def next_amb(self):
        if self._next_amb is None:
            if self._scans is not None:
                self._next_amb = self._scans.next_amb
            else:
                self._next_amb = _next_ambiguous(self.sba)
        return self._next_amb


@jax.jit
def _gc_cumsum(sba):
    """gc[i] = number of G/C bytes in sba[0:i] (length n+1, uint32)."""
    is_gc = (sba == ord("G")) | (sba == ord("C"))
    c = jnp.cumsum(is_gc.astype(jnp.uint32))
    return jnp.concatenate([jnp.zeros(1, dtype=jnp.uint32), c])


@jax.jit
def _run_lengths(sba):
    """r[i] = length of the equal-byte run ending at i (>= 1).

    Computed branch-free: last_change[i] = cummax over positions where the
    byte differs from its predecessor; r = i - last_change + 1.
    """
    n = sba.shape[0]
    idx = jnp.arange(n, dtype=jnp.uint32)
    prev = jnp.concatenate([sba[:1], sba[:-1]])
    changed = (sba != prev).at[0].set(True)
    last_change = jax.lax.cummax(jnp.where(changed, idx, jnp.uint32(0)))
    return idx - last_change + jnp.uint32(1)


@jax.jit
def _gc_cumsum_ranks2(packed2):
    """``_gc_cumsum`` from per-position 2-bit packed words: each word's top
    field is its own base's rank (A=0 C=1 G=2 T=3, '$'/past-end=0), so
    G/C-ness is an elementwise compare — no byte SBA required."""
    r = packed2 >> jnp.uint32(30)
    is_gc = (r == jnp.uint32(1)) | (r == jnp.uint32(2))
    c = jnp.cumsum(is_gc.astype(jnp.uint32))
    return jnp.concatenate([jnp.zeros(1, dtype=jnp.uint32), c])


@jax.jit
def _run_lengths_ranks2(packed2, is_dollar):
    """``_run_lengths`` from 2-bit ranks. '$' packs as rank 0 (== A), so the
    byte semantics — a separator differs from every base and breaks runs on
    both sides — are restored with explicit breaks at '$' rows."""
    n = packed2.shape[0]
    r = packed2 >> jnp.uint32(30)
    idx = jnp.arange(n, dtype=jnp.uint32)
    prev_r = jnp.concatenate([r[:1], r[:-1]])
    prev_d = jnp.concatenate([is_dollar[:1], is_dollar[:-1]])
    changed = ((r != prev_r) | is_dollar | prev_d).at[0].set(True)
    last_change = jax.lax.cummax(jnp.where(changed, idx, jnp.uint32(0)))
    return idx - last_change + jnp.uint32(1)


@jax.jit
def _gc_cumsum_ranks4(packed):
    """``_gc_cumsum`` from per-position 4-bit packed words (each word's top
    nibble is its own byte's rank; ranks are ASCII-ordered over
    ops/encoding.ALLOWED_CHARS, so C=3 and G=5) — IUPAC genomes get their
    filter scans without uploading the byte SBA."""
    r = packed >> jnp.uint32(28)
    is_gc = (r == jnp.uint32(3)) | (r == jnp.uint32(5))
    c = jnp.cumsum(is_gc.astype(jnp.uint32))
    return jnp.concatenate([jnp.zeros(1, dtype=jnp.uint32), c])


@jax.jit
def _run_lengths_ranks4(packed):
    """``_run_lengths`` from 4-bit ranks. Unlike the 2-bit case, ranks are a
    bijection of the allowed bytes ('$' = rank 0 is its own symbol), so
    adjacent-rank equality IS adjacent-byte equality — no '$' special case."""
    n = packed.shape[0]
    r = packed >> jnp.uint32(28)
    idx = jnp.arange(n, dtype=jnp.uint32)
    prev = jnp.concatenate([r[:1], r[:-1]])
    changed = (r != prev).at[0].set(True)
    last_change = jax.lax.cummax(jnp.where(changed, idx, jnp.uint32(0)))
    return idx - last_change + jnp.uint32(1)


@jax.jit
def _next_ambiguous_ranks4(packed):
    """``_next_ambiguous`` from 4-bit ranks (A=1, C=3, G=5, T=12, '$'=0)."""
    n = packed.shape[0]
    r = packed >> jnp.uint32(28)
    idx = jnp.arange(n, dtype=jnp.uint32)
    is_amb = ~(
        (r == jnp.uint32(1))
        | (r == jnp.uint32(3))
        | (r == jnp.uint32(5))
        | (r == jnp.uint32(12))
        | (r == jnp.uint32(0))
    )
    marked = jnp.where(is_amb, idx, _BIG)
    return jax.lax.cummin(marked, reverse=True)


@jax.jit
def _next_ambiguous(sba):
    """na[i] = smallest j >= i whose byte is neither A/C/G/T nor '$' (else BIG)."""
    n = sba.shape[0]
    idx = jnp.arange(n, dtype=jnp.uint32)
    is_amb = ~(
        (sba == ord("A"))
        | (sba == ord("C"))
        | (sba == ord("G"))
        | (sba == ord("T"))
        | (sba == _DOLLAR)
    )
    marked = jnp.where(is_amb, idx, _BIG)
    return jax.lax.cummin(marked, reverse=True)


# --------------------------------------------------------------------------- #
# genome-order flag planes.
#
# Each filter's per-position outcome over the WHOLE genome — bit 0 = passes,
# bit 1 = would raise — is computable with scans and fixed-offset slices
# only (no gathers): window sums become shifted slices of prefix sums, and
# per-segment truncation becomes a reverse cummin of the prefix value at '$'
# rows. A filtered query then gathers ONE uint8 plane at its positions
# instead of 2-3 uint32 gathers (TPU gathers cost ~150 ms/16.7M rows), and
# the plane caches on the device cache across queries.
# --------------------------------------------------------------------------- #


def _prefix_at_next_dollar(prefix, is_dollar):
    """v[p] = prefix[nd(p)] where nd(p) = first '$' row at/after p (or n).

    ``prefix`` has length n+1 and is non-decreasing, so the value at the
    nearest following '$' is a reverse cummin over the '$'-row values.
    """
    n = is_dollar.shape[0]
    v = jnp.where(is_dollar, prefix[:n], jnp.uint32(0xFFFFFFFF))
    vv = jnp.concatenate([v, prefix[n:]])
    return jax.lax.cummin(vv, reverse=True)[:n]


def _pad_prefix(prefix, k: int):
    """prefix (length n+1) extended so prefix_pad[j] = prefix[min(j, n)] for
    j up to n + k — turns clamped lookups into plain shifted slices."""
    return jnp.concatenate([prefix, jnp.broadcast_to(prefix[-1:], (k,))])


@partial(jax.jit, static_argnames=("k",))
def _gc_flags_genome(gc_cumsum, is_dollar, vl_g, min_c, max_c, k):
    """GC filter flag plane. gc_end[p] = G/C count in the first
    min(k, bases-to-segment-end) bases = min(ce[p+k], ce[nd(p)]) - ce[p]."""
    n = is_dollar.shape[0]
    ce = gc_cumsum
    ce_pk = _pad_prefix(ce, k)[k : k + n]
    ce_nd = _prefix_at_next_dollar(ce, is_dollar)
    gc_end = jnp.minimum(ce_pk, ce_nd) - ce[:n]
    trunc = vl_g < jnp.uint32(k)
    ok = (gc_end >= min_c) & (gc_end <= max_c)
    mask = (~trunc) & ok
    raises = trunc & (gc_end <= max_c)
    return mask.astype(jnp.uint8) | (raises.astype(jnp.uint8) << 1)


@partial(jax.jit, static_argnames=("k", "max_h"))
def _homopolymer_flags_genome(run_len, is_dollar, vl_g, k, max_h):
    """Homopolymer flag plane for k >= max_h (shorter k short-circuits to
    True before any '$' scan, reference kmers.py:66-74).

    Raise semantics (reference kmers.py:66-86): overflow past the array end
    raises unconditionally; a '$' inside the window raises ONLY when no run
    exceeded max_h before it — the reference's left-to-right scan returns
    False first — so the raise bit checks the truncated window
    [p + max_h, min(p + k, next '$')) for violating-run markers."""
    n = run_len.shape[0]
    bad = (run_len > jnp.uint32(max_h)).astype(jnp.uint32)
    cs = jnp.concatenate([jnp.zeros(1, dtype=jnp.uint32), jnp.cumsum(bad)])
    cs_pad = _pad_prefix(cs, k)
    hi = cs_pad[k : k + n]        # cs[min(p + k, n)]
    lo = cs_pad[max_h : max_h + n]  # cs[min(p + max_h, n)]
    any_bad = hi > lo  # prefix sums are monotone, so > replaces subtraction
    mask = ~any_bad
    # truncated-window variant: clamp both ends at cs[nd(p)] (runs never
    # cross '$', so markers in [p+max_h, nd) are exactly the pre-'$' ones)
    cs_nd = _prefix_at_next_dollar(cs, is_dollar)
    early = jnp.minimum(hi, cs_nd) > jnp.minimum(lo, cs_nd)
    idx = jnp.arange(n, dtype=jnp.uint32)
    overflow = idx >= jnp.uint32(max(n - (k - 1), 0))
    raises = overflow | ((vl_g < jnp.uint32(k)) & ~early)
    return mask.astype(jnp.uint8) | (raises.astype(jnp.uint8) << 1)


@partial(jax.jit, static_argnames=("k",))
def _no_ambiguous_flags_genome(next_amb, vl_g, k):
    """No-ambiguous flag plane. bit 1 = '$' reached before any ambiguous
    base (raises); overflow past the array end is checked separately per
    row (different message, checked first — reference kmers.py:216-227)."""
    n = next_amb.shape[0]
    idx = jnp.arange(n, dtype=jnp.uint32)
    d = jnp.minimum(vl_g, jnp.uint32(k))
    a = jnp.minimum(next_amb - idx, jnp.uint32(k))
    mask = a >= jnp.uint32(k)
    raises = (d < jnp.uint32(k)) & (d < a)
    return mask.astype(jnp.uint8) | (raises.astype(jnp.uint8) << 1)


@jax.jit
def _crispr_flags_genome(packed2):
    """CRISPR NGG plane from 2-bit ranks: base p's rank is word p's top
    field; positions past the end read rank 0 (not G) — the raw-byte read
    the reference does never sees those rows because the overflow check
    raises first."""
    n = packed2.shape[0]
    r = packed2 >> jnp.uint32(30)
    rpad = jnp.concatenate([r, jnp.zeros(23, dtype=r.dtype)])
    g = jnp.uint32(2)
    mask = (rpad[21 : 21 + n] == g) & (rpad[22 : 22 + n] == g)
    return mask.astype(jnp.uint8)


@jax.jit
def _crispr_flags_genome_ranks4(packed):
    """CRISPR NGG plane from 4-bit ranks (G = rank 5; '$'/past-end = 0) —
    the IUPAC-genome variant that skips the byte-SBA upload."""
    n = packed.shape[0]
    r = packed >> jnp.uint32(28)
    rpad = jnp.concatenate([r, jnp.zeros(23, dtype=r.dtype)])
    g = jnp.uint32(5)
    mask = (rpad[21 : 21 + n] == g) & (rpad[22 : 22 + n] == g)
    return mask.astype(jnp.uint8)


@jax.jit
def _crispr_flags_genome_bytes(sba):
    """Byte-SBA variant of the CRISPR plane (IUPAC genomes)."""
    n = sba.shape[0]
    pad = jnp.concatenate([sba, jnp.zeros(23, dtype=sba.dtype)])
    g = jnp.uint8(ord("G"))
    mask = (pad[21 : 21 + n] == g) & (pad[22 : 22 + n] == g)
    return mask.astype(jnp.uint8)


# --------------------------------------------------------------------------- #
# lanes flags: a filter's (pass, raise) outcome computed DIRECTLY from the
# retained sorted key lanes.
#
# After a sort the index retains its sorted key words (ops/sort.py
# return_lanes) — the k-mer CONTENT, already in sorted row order. Every
# library filter is a function of that content plus the compare cap, so its
# survivor mask is pure word arithmetic over lanes the stats kernel reads
# anyway: GC count = popcount of (w ^ w>>1) & 0x5555… on 2-bit words,
# ambiguity/truncation = SWAR nibble tests on 4-bit words, homopolymer runs =
# adjacent-field equality bits. No genome gather at all — the flag-plane path
# this supersedes pays one serialized uint8 gather per query (~150 ms/16.7M
# rows on v5e) plus 1-2 host syncs for its error checks; the lanes form fuses
# into the same program as the boundary + survivor histogram and returns its
# error findings inside the stats digest (zero extra transfers).
#
# Word layout invariants this relies on (ops/keys.py): field j of word w is
# base offset (bases_per_word*w + j), big-endian within the word; fields at
# or past each row's cap = min(valid_len, built_k) are ZERO.
#
# Each ``*_lanes{2,4}`` function returns ``(mask, errs)`` where ``errs`` is a
# tuple of per-row raise conditions in the exact order the filter's
# check_batch would test them; the caller (ops/groups.lanes_filtered_*)
# reduces each to an [any, first-bad-position] digest pair.
# --------------------------------------------------------------------------- #

_ONES32 = jnp.uint32(0xFFFFFFFF)


def _lanes_keep_mask(k, w_idx: int, bases_per_word: int, bits: int):
    """Bit mask keeping fields of word ``w_idx`` below (traced) base count
    ``k`` — same shift formulation as ops/sort.boundaries_from_sorted_lanes."""
    keep = jnp.clip(k.astype(jnp.int32) - w_idx * bases_per_word, 0, bases_per_word)
    nbits = (bits * keep).astype(jnp.uint32)
    shift = jnp.minimum(jnp.uint32(32) - nbits, jnp.uint32(31))
    return jnp.where(nbits == 0, jnp.uint32(0), _ONES32 << shift)


def _row_caps(cap, positions, cap_const):
    """Per-row compare caps: the retained cap lane, or the uniform constant
    (2-bit uniform-cap lanes drop the lane because every row's cap equals
    built_k)."""
    if cap is not None:
        return cap
    return jnp.broadcast_to(cap_const, positions.shape)


def _nib_nonzero_bits(y):
    """bit0 of each nibble set iff that nibble is nonzero (exact — no
    SWAR-borrow false positives: only within-nibble shifts are OR'd)."""
    z = y | (y >> 1) | (y >> 2) | (y >> 3)
    return z & jnp.uint32(0x11111111)


def _nib_match_count(zz, v: int):
    """Number of nibbles of ``zz`` equal to ``v`` (callers pre-set excluded
    nibbles to 0xF, which matches nothing we ever count)."""
    t = zz ^ jnp.uint32(v * 0x11111111)
    nz = _nib_nonzero_bits(t)
    return jax.lax.population_count(nz ^ jnp.uint32(0x11111111))


def gc_lanes_flags2(words, cap, positions, params):
    """GC-content filter on 2-bit lanes. params (uint32): [k_f, min_count,
    max_count, cap_const, impossible_range]."""
    k = params[0]
    mn, mx = params[1], params[2]
    gc = jnp.zeros(positions.shape, dtype=jnp.uint32)
    for i, w in enumerate(words):
        ww = w & _lanes_keep_mask(k, i, 16, 2)
        # per 2-bit field, b1 ^ b0 == 1 exactly for C (01) and G (10);
        # zeroed fields (past cap or past k) read as A and contribute 0
        x = (ww >> 1) ^ ww
        gc = gc + jax.lax.population_count(x & jnp.uint32(0x55555555))
    trunc = _row_caps(cap, positions, params[3]) < k
    ok = (gc >= mn) & (gc <= mx)
    possible = params[4] == jnp.uint32(0)
    mask = possible & (~trunc) & ok
    # reference scans left to right: a truncated k-mer raises only when its
    # GC count did not exceed max first (kmers.py:170-185); the impossible
    # range returns False for every row before touching the SBA
    raises = possible & trunc & (gc <= mx)
    return mask, (raises,)


def gc_lanes_flags4(words, cap, positions, params):
    """GC-content filter on 4-bit lanes (IUPAC genomes). Same params as
    ``gc_lanes_flags2``; C = rank 3, G = rank 5 (ASCII-ordered ranks)."""
    del cap  # 4-bit lanes carry termination in-word (zero nibbles)
    k = params[0]
    mn, mx = params[1], params[2]
    gc = jnp.zeros(positions.shape, dtype=jnp.uint32)
    trunc = jnp.zeros(positions.shape, dtype=bool)
    for i, w in enumerate(words):
        km = _lanes_keep_mask(k, i, 8, 4)
        zz = (w & km) | ~km  # excluded fields -> 0xF (matches no rank)
        gc = gc + _nib_match_count(zz, 3) + _nib_match_count(zz, 5)
        # a zero nibble among kept fields == compare cap inside the window
        trunc = trunc | (_nib_nonzero_bits(zz) != jnp.uint32(0x11111111))
    ok = (gc >= mn) & (gc <= mx)
    possible = params[4] == jnp.uint32(0)
    mask = possible & (~trunc) & ok
    raises = possible & trunc & (gc <= mx)
    return mask, (raises,)


def noamb_lanes_flags2(words, cap, positions, params):
    """No-ambiguous filter on 2-bit lanes: the alphabet is ACGT-only, so the
    filter reduces to truncation checks. params: [k_f, overflow_thr,
    cap_const]."""
    del words
    k = params[0]
    trunc = _row_caps(cap, positions, params[2]) < k
    overflow = positions >= params[1]
    # '$' reached before any ambiguous base (there are none) -> raise
    return ~trunc, (overflow, trunc)


def noamb_lanes_flags4(words, cap, positions, params):
    """No-ambiguous filter on 4-bit lanes. params: [k_f, overflow_thr]."""
    del cap
    k = params[0]
    trunc = jnp.zeros(positions.shape, dtype=bool)
    amb = jnp.zeros(positions.shape, dtype=bool)
    for i, w in enumerate(words):
        km = _lanes_keep_mask(k, i, 8, 4)
        zz = (w & km) | ~km
        trunc = trunc | (_nib_nonzero_bits(zz) != jnp.uint32(0x11111111))
        # ambiguous = kept nibble not in {0('$'/past-cap), A=1, C=3, G=5,
        # T=12}; excluded fields are zeroed here so they match rank 0
        ww = w & km
        amb_bits = _nib_nonzero_bits(ww)
        for v in (1, 3, 5, 12):
            amb_bits = amb_bits & _nib_nonzero_bits(ww ^ jnp.uint32(v * 0x11111111))
        amb = amb | (amb_bits != jnp.uint32(0))
    overflow = positions >= params[1]
    # reference kmers.py:216-227: an ambiguous base found before the '$'
    # fails the k-mer without raising ('$' rows are all past the ambiguity)
    return (~trunc) & (~amb), (overflow, trunc & ~amb)


def length_lanes_flags(words, cap, positions, params):
    """Length filter (>= min bases to segment end). params: [min_f,
    cap_const] with min_f pre-clamped to >= 0 and <= built_k."""
    del words
    return _row_caps(cap, positions, params[1]) >= params[0], ()


def length_lanes_flags4(words, cap, positions, params):
    """Length filter on 4-bit lanes: cap >= min_f iff no zero nibble among
    the first min_f fields. params: [min_f]."""
    del cap
    mf = params[0]
    trunc = jnp.zeros(positions.shape, dtype=bool)
    for i, w in enumerate(words):
        km = _lanes_keep_mask(mf, i, 8, 4)
        zz = (w & km) | ~km
        trunc = trunc | (_nib_nonzero_bits(zz) != jnp.uint32(0x11111111))
    return ~trunc, ()


def _compress_even_bits(x):
    """Pack the bits at even positions 0,2,...,30 of ``x`` into bits 0..15
    (the inverse of bit interleaving; input odd-position bits must be 0)."""
    x = (x | (x >> 1)) & jnp.uint32(0x33333333)
    x = (x | (x >> 2)) & jnp.uint32(0x0F0F0F0F)
    x = (x | (x >> 4)) & jnp.uint32(0x00FF00FF)
    x = (x | (x >> 8)) & jnp.uint32(0x0000FFFF)
    return x


def _shr64(hi, lo, t):
    """(hi, lo) >> t for traced t in [0, 16] — the carry is built with two
    sub-31 shifts so no shift amount can reach the undefined >= 32 range
    (t == 0 makes the carry (hi << 31) << 1 == 0, exactly right)."""
    carry = (hi << (jnp.uint32(31) - t)) << 1
    return hi >> t, (lo >> t) | carry


def _run_fold64(hi, lo, run_len):
    """Nonzero iff any run of >= ``run_len`` (traced, >= 1, <= 64)
    consecutive set bits exists in the 64-bit mask (hi, lo) — iterated
    shift-AND with doubling step caps (1+2+4+8+16+16+16 = 63 covers every
    run_len - 1; min(cap, remaining) makes extra iterations no-ops)."""
    rem = run_len - jnp.uint32(1)
    for cap_t in (1, 2, 4, 8, 16, 16, 16):
        t = jnp.minimum(jnp.uint32(cap_t), rem)
        h2, l2 = _shr64(hi, lo, t)
        hi, lo = hi & h2, lo & l2
        rem = rem - t
    return (hi | lo) != jnp.uint32(0)


def _mask_stream64(hi, lo, m):
    """Keep eq flags for bases j in [1, m-1] of a 64-bit big-endian stream
    (flag for base j at conceptual bit 63-j); ``m`` is a traced per-row or
    scalar base count."""
    mi = m.astype(jnp.int32)
    hi = hi & (_ONES32 << jnp.clip(32 - mi, 0, 31).astype(jnp.uint32))
    lo = jnp.where(
        mi > 32, lo & (_ONES32 << jnp.clip(64 - mi, 0, 31).astype(jnp.uint32)),
        jnp.uint32(0),
    )
    return hi, lo


def homopoly_lanes_flags2(words, cap, positions, params):
    """Homopolymer filter on 2-bit lanes. params: [k_f, max_h, cap_const,
    overflow_thr, short_circuit].

    Adjacent-base equality becomes one bit per base ((w ^ w>>2) folded and
    compressed), assembled into a 64-bit big-endian stream (eq flag for base
    j at conceptual bit 63-j, j = 1..k_f-1); a run longer than max_h exists
    iff max_h consecutive flags survive the shift-AND fold.

    Raise semantics (reference kmers.py:66-86): overflow past the array end
    raises unconditionally; a '$' inside the window raises ONLY when no run
    already exceeded max_h before it (the reference's left-to-right scan
    returns False first) — so the raise fold runs over flags masked to each
    row's truncation point min(k_f, cap), where fields are still real."""
    k = params[0]
    halves = []
    prev_w = None
    for w in words:
        cmp = w ^ (w >> 2)
        e = ~cmp
        ebits = e & (e >> 1) & jnp.uint32(0x55555555)  # bit (30-2j) = eq(j, j-1)
        c = _compress_even_bits(ebits) & jnp.uint32(0x7FFF)  # bit (15-j), j=1..15
        if prev_w is not None:
            seam = (prev_w & jnp.uint32(3)) == (w >> 30)
            c = c | (seam.astype(jnp.uint32) << 15)
        halves.append(c)
        prev_w = w
    while len(halves) < 4:
        halves.append(jnp.zeros(positions.shape, dtype=jnp.uint32))
    hi = (halves[0] << 16) | halves[1]
    lo = (halves[2] << 16) | halves[3]
    capv = _row_caps(cap, positions, params[2])
    # flags for j in [1, k_f-1] (mask consumers; spurious zero-field runs
    # past a row's cap only matter on truncated rows, which never pass)
    hk, lk = _mask_stream64(hi, lo, jnp.broadcast_to(k, positions.shape))
    run_bad = _run_fold64(hk, lk, params[1])
    # flags for j in [1, min(k_f, cap) - 1] (raise preemption: every field
    # below the cap is real)
    hc, lc = _mask_stream64(hi, lo, jnp.minimum(capv, k))
    run_bad_cap = _run_fold64(hc, lc, params[1])
    short = params[4] != jnp.uint32(0)
    trunc = capv < k
    overflow = positions >= params[3]
    mask = jnp.where(short, True, ~run_bad)
    raises = jnp.where(short, overflow, overflow | (trunc & ~run_bad_cap))
    return mask, (raises,)


def homopoly_lanes_flags4(words, cap, positions, params):
    """Homopolymer filter on 4-bit lanes (built_k <= 32, so the eq stream
    fits one uint32). params: [k_f, max_h, overflow_thr, short_circuit].
    Raise semantics as in ``homopoly_lanes_flags2``."""
    del cap
    k = params[0]
    eights = []
    prev_w = None
    trunc = jnp.zeros(positions.shape, dtype=bool)
    capv = jnp.zeros(positions.shape, dtype=jnp.uint32)  # min(cap, k_f)
    for w in words:
        km = _lanes_keep_mask(k, len(eights), 8, 4)
        zz = (w & km) | ~km
        nz = _nib_nonzero_bits(zz)
        trunc = trunc | (nz != jnp.uint32(0x11111111))
        capv = capv + jax.lax.population_count(nz)
        cmp = w ^ (w >> 4)
        eqnib = _nib_nonzero_bits(cmp) ^ jnp.uint32(0x11111111)  # bit (28-4j)
        c = _compress_even_bits(_compress_even_bits(eqnib))  # bit (7-j)
        c = c & jnp.uint32(0x7F)
        if prev_w is not None:
            seam = (prev_w & jnp.uint32(0xF)) == (w >> 28)
            c = c | (seam.astype(jnp.uint32) << 7)
        eights.append(c)
        prev_w = w
    e = jnp.zeros(positions.shape, dtype=jnp.uint32)
    for i, c in enumerate(eights):
        e = e | (c << (24 - 8 * i))

    def fold32(x):
        rem = params[1] - jnp.uint32(1)
        for cap_t in (1, 2, 4, 8, 16):
            t = jnp.minimum(jnp.uint32(cap_t), rem)
            x = x & (x >> t)
            rem = rem - t
        return x != jnp.uint32(0)

    ki = k.astype(jnp.int32)
    run_bad = fold32(e & (_ONES32 << jnp.clip(32 - ki, 0, 31).astype(jnp.uint32)))
    # raise preemption: flags below each row's truncation point only
    ci = capv.astype(jnp.int32)
    run_bad_cap = fold32(e & (_ONES32 << jnp.clip(32 - ci, 0, 31).astype(jnp.uint32)))
    short = params[3] != jnp.uint32(0)
    overflow = positions >= params[2]
    mask = jnp.where(short, True, ~run_bad)
    raises = jnp.where(short, overflow, overflow | (trunc & ~run_bad_cap))
    return mask, (raises,)


def crispr_lanes_flags2(words, cap, positions, params):
    """CRISPR NGG PAM on 2-bit lanes: bases +21/+22 are fields 5/6 of word 1.
    Valid only when every row's cap covers 23 bases (caller guards via the
    index min_kmer_len). params: [overflow_thr]."""
    del cap
    w1 = words[1]
    g = jnp.uint32(2)
    mask = ((w1 >> 20) & jnp.uint32(3) == g) & ((w1 >> 18) & jnp.uint32(3) == g)
    return mask, (positions >= params[0],)


def crispr_lanes_flags4(words, cap, positions, params):
    """CRISPR NGG PAM on 4-bit lanes: bases +21/+22 are fields 5/6 of word 2
    (8 bases/word); G = rank 5. Same cap guard as the 2-bit form."""
    del cap
    w2 = words[2]
    g = jnp.uint32(5)
    mask = ((w2 >> 8) & jnp.uint32(0xF) == g) & ((w2 >> 4) & jnp.uint32(0xF) == g)
    return mask, (positions >= params[0],)


def _overflow_thr(sba_len: int, last_offset: int) -> int:
    """uint32 threshold t such that (pos >= t) == (pos + last_offset >=
    sba_len) for real positions — the lanes-kernel form of _overflow_cond."""
    return max(sba_len - last_offset, 0)


def flag_plane(scans, key, build):
    """Build (or fetch) a filter's cached genome-order flag plane on a
    scans provider (the SequenceCollection device cache). Returns the uint8
    plane, or None when the provider can't support it. The mesh path calls
    this directly and replicates the N-byte plane over the mesh — still
    cheaper than the 2-3 uint32 gathers the window kernels cost."""
    if scans is None:
        return None
    store = getattr(scans, "filter_flags", None)
    if store is None:
        return None
    if key not in store:
        try:
            store[key] = build(scans)
        except Exception:
            return None
    return store[key]


def _genome_flags(ctx: FilterContext, key, build):
    """Cached genome-order flag plane gathered at ctx.positions, or None
    when the context can't support it (host-array contexts, or no
    device-cache scans). The plane caches on the device cache across
    queries; the gathered rows memoize on the context (check_batch and
    mask_pure share them)."""
    if isinstance(ctx.positions, np.ndarray):
        return None
    hit = getattr(ctx, "_flags_rows_cache", None)
    if hit is not None and hit[0] == key:
        return hit[1]
    plane = flag_plane(ctx._scans, key, build)
    if plane is None:
        return None
    rows = jnp.take(plane, ctx.positions.astype(jnp.int32), mode="clip")
    ctx._flags_rows_cache = (key, rows)
    return rows


def _any_row(ctx: FilterContext, cond) -> bool:
    """True iff any (valid) row satisfies ``cond``.

    ``cond`` may be a device bool array — the single-chip paths, where this
    costs ONE scalar sync instead of an O(N) download — or derive from a
    host-array context (the mesh error-check path, which carries numpy
    positions plus a ``valid_rows`` mask), where the previous host logic is
    kept verbatim.
    """
    if isinstance(ctx.positions, np.ndarray):
        return bool(ctx._rows(np.asarray(cond)).any())
    if ctx.valid_rows is not None:  # defensive: device ctx with a row mask
        cond = cond & jnp.asarray(ctx.valid_rows)
    return bool(jnp.any(cond))


def _first_true_pos(ctx: FilterContext, cond):
    """Position (in array order) of the first row satisfying ``cond``, or
    None. Device contexts pay one scalar sync when clean and two more only
    on the error path (argmax + gather) — never an O(N) download."""
    if isinstance(ctx.positions, np.ndarray):
        rows = ctx._rows(np.asarray(cond))
        if not rows.any():
            return None
        return int(ctx.positions[rows][0])
    if ctx.valid_rows is not None:
        cond = cond & jnp.asarray(ctx.valid_rows)
    if not bool(jnp.any(cond)):
        return None
    i = jnp.argmax(cond)
    return int(jnp.take(ctx.positions, i))


def _first_offender(ctx: FilterContext, conds):
    """(condition index, position) of the FIRST row in array (walk) order
    that trips any of ``conds``, or None. Ties at one row resolve to the
    earlier-listed condition (= the scalar filter's per-row check order) —
    the reference's sequential walk raises at the first offending row, not
    at the highest-priority condition across the whole batch."""
    if isinstance(ctx.positions, np.ndarray):
        best = None
        for ci, cond in enumerate(conds):
            rows = np.flatnonzero(ctx._rows(np.asarray(cond)))
            if rows.size and (best is None or rows[0] < best[0]):
                best = (rows[0], ci)
        if best is None:
            return None
        return best[1], int(ctx.positions[best[0]])
    combined = None
    for cond in conds:
        combined = cond if combined is None else (combined | cond)
    if ctx.valid_rows is not None:
        combined = combined & jnp.asarray(ctx.valid_rows)
    if not bool(jnp.any(combined)):
        return None
    i = jnp.argmax(combined)
    pos = int(jnp.take(ctx.positions, i))
    for ci, cond in enumerate(conds):
        if bool(jnp.take(cond, i)):
            return ci, pos
    return len(conds) - 1, pos  # unreachable (combined[i] is True)


def _overflow_cond(ctx: FilterContext, last_offset: int):
    """Rows where position + last_offset >= sba_len, computed without int64
    (pos >= sba_len - last_offset never under/overflows in uint32)."""
    thr = ctx.sba_len - last_offset
    if thr <= 0:
        return ctx.positions >= np.uint32(0)  # every row overflows
    return ctx.positions >= np.uint32(thr)


class KmerFilter:
    """Base class: a filter usable both per-k-mer (reference signature) and
    as a vectorized mask.

    ``batch_mask`` = ``check_batch`` (host-side error checks, may raise the
    reference's ValueErrors) + ``mask_pure`` (device-only boolean mask, never
    syncs to host). The mesh path calls the two halves separately so error
    checks can skip ragged padding rows while the mask stays fully on device.
    """

    batchable = True

    def __call__(self, sba, sba_strand, kmer_sba_start_idx) -> bool:
        raise NotImplementedError

    def check_batch(self, ctx: FilterContext) -> None:
        """Raise the reference's ValueError if any valid row is invalid."""
        return None

    def mask_pure(self, ctx: FilterContext):
        raise NotImplementedError

    def batch_mask(self, ctx: FilterContext):
        self.check_batch(ctx)
        return self.mask_pure(ctx)

    def _plane_spec(self):
        """(cache key, scans -> uint8 plane builder) for this filter's
        genome-order flag plane, or None when the filter has no plane form
        (bit 0 = position passes, bit 1 = position would raise)."""
        return None

    def _flags(self, ctx):
        spec = self._plane_spec()
        if spec is None:
            return None
        return _genome_flags(ctx, spec[0], spec[1])

    def lanes_spec(self, lanes, sba_len: int, index_min_kmer_len: int):
        """(flags_fn, params uint32[], msg_makers) for evaluating this filter
        directly on retained sorted key lanes (see the lanes-flags section),
        or None when these lanes can't express it.

        ``flags_fn(words, cap, positions, params) -> (mask, errs)`` is a
        module-level jax-traceable function (stable identity, so the fused
        stats kernels that take it as a static argument compile once per
        filter type, with instance parameters traced through ``params``).
        ``msg_makers`` has one ``pos -> message`` callable per errs entry,
        in check order (reference check_batch semantics)."""
        return None


class KeepAllFilter(KmerFilter):
    """Reference kmers.py:14-16."""

    def __call__(self, sba, sba_strand, kmer_sba_start_idx) -> bool:
        return True

    def mask_pure(self, ctx):
        return jnp.ones(ctx.positions.shape[0], dtype=bool)


kmer_filter_keep_all = KeepAllFilter()


def _scalar_valid_len(sba, start):
    """Bases from start to segment end, scanning for '$' (host helper)."""
    n = len(sba)
    i = start
    while i < n and sba[i] != _DOLLAR:
        i += 1
    return i - start


class LengthFilter(KmerFilter):
    """Passes iff the k-mer has at least min_kmer_len bases before the segment
    end (reference kmers.py:19-34 via kmers.py:262-282)."""

    def __init__(self, min_kmer_len: int):
        self.min_kmer_len = min_kmer_len

    def __call__(self, sba, sba_strand, kmer_sba_start_idx) -> bool:
        return kmer_has_required_len(sba, kmer_sba_start_idx, self.min_kmer_len)

    def mask_pure(self, ctx):
        return ctx.valid_len >= jnp.uint32(max(self.min_kmer_len, 0))

    def lanes_spec(self, lanes, sba_len, index_min_kmer_len):
        mf = max(self.min_kmer_len, 0)
        if mf > lanes["built_k"]:
            return None
        if lanes["two_bit"]:
            return (
                length_lanes_flags,
                np.array([mf, lanes["built_k"]], dtype=np.uint32),
                (),
            )
        return length_lanes_flags4, np.array([mf], dtype=np.uint32), ()


def gen_kmer_length_filter_func(min_kmer_len: int) -> LengthFilter:
    """Reference kmers.py:19-34."""
    return LengthFilter(min_kmer_len)


class HomopolymerFilter(KmerFilter):
    """Passes iff no homopolymer longer than max_homopolymer_size lies within
    the k-mer window (reference kmers.py:37-100)."""

    def __init__(self, max_homopolymer_size: int, kmer_len: int):
        if max_homopolymer_size < 1:
            raise ValueError(
                f"max_homopolymer_size ({max_homopolymer_size}) must be >= 1"
            )
        if kmer_len < 1:
            raise ValueError(f"kmer_len ({kmer_len}) must be >= 1")
        self.max_homopolymer_size = max_homopolymer_size
        self.kmer_len = kmer_len

    def __call__(self, sba, sba_strand, kmer_sba_start_idx) -> bool:
        k, max_h = self.kmer_len, self.max_homopolymer_size
        if kmer_sba_start_idx + k - 1 >= len(sba):
            raise ValueError(
                f"The kmer_len ({k}) requested is too large for kmer_sba_start_idx ({kmer_sba_start_idx})"
            )
        if k < max_h:
            return True
        size = 1
        for j in range(1, k):
            idx = kmer_sba_start_idx + j
            if sba[idx] == _DOLLAR:
                raise ValueError(
                    f"The kmer_len ({k}) requested is too large for kmer_sba_start_idx ({kmer_sba_start_idx})"
                )
            if sba[idx] == sba[idx - 1]:
                size += 1
                if size > max_h:
                    return False
            else:
                size = 1
        return True

    def _plane_spec(self):
        k, max_h = self.kmer_len, self.max_homopolymer_size
        if k < max_h:
            return None
        return ("homopoly", k, max_h), lambda sc: _homopolymer_flags_genome(
            sc.run_len, sc.is_dollar, sc.valid_len_genome, k, max_h
        )

    def check_batch(self, ctx):
        k, max_h = self.kmer_len, self.max_homopolymer_size
        # Overflow past the array end always raises; a '$' inside the window
        # raises only when k >= max_h (the reference early-returns True for
        # short k-mers before its '$' scan, kmers.py:66-74) AND no run
        # exceeded max_h before the '$' (the left-to-right scan returns
        # False first, kmers.py:75-86). Both raise the same message.
        if k < max_h:
            cond = _overflow_cond(ctx, k - 1)
        else:
            fl = self._flags(ctx)
            if fl is not None:
                cond = (fl & jnp.uint8(2)) != 0
            else:
                viol = (ctx.run_len > jnp.uint32(max_h)).astype(jnp.uint32)
                cs = jnp.concatenate(
                    [jnp.zeros(1, dtype=jnp.uint32), jnp.cumsum(viol)]
                )
                pos = jnp.asarray(ctx.positions)
                d = jnp.minimum(jnp.asarray(ctx.valid_len), jnp.uint32(k))
                early = _windowed_any(
                    cs, pos + jnp.uint32(max_h), pos + d - jnp.uint32(1)
                )
                cond = _overflow_cond(ctx, k - 1) | (
                    (jnp.asarray(ctx.valid_len) < jnp.uint32(k)) & ~early
                )
        bad = _first_true_pos(ctx, cond)
        if bad is not None:
            raise ValueError(
                f"The kmer_len ({k}) requested is too large for kmer_sba_start_idx ({bad})"
            )

    def mask_pure(self, ctx):
        k, max_h = self.kmer_len, self.max_homopolymer_size
        if k < max_h:
            return jnp.ones(ctx.positions.shape[0], dtype=bool)
        fl = self._flags(ctx)
        if fl is not None:
            return (fl & jnp.uint8(1)) != 0
        return _homopolymer_mask(ctx.run_len, ctx.positions, k, max_h)

    def lanes_spec(self, lanes, sba_len, index_min_kmer_len):
        k, max_h = self.kmer_len, self.max_homopolymer_size
        if k < 1 or k > lanes["built_k"]:
            return None
        short = 1 if k < max_h else 0
        mh = min(max_h, 65)  # short-circuit rows never consume the fold
        thr = _overflow_thr(sba_len, k - 1)
        if lanes["two_bit"]:
            fn = homopoly_lanes_flags2
            params = np.array(
                [k, mh, lanes["built_k"], thr, short], dtype=np.uint32
            )
        else:
            fn = homopoly_lanes_flags4
            params = np.array([k, mh, thr, short], dtype=np.uint32)

        def msg(pos):
            return (
                f"The kmer_len ({k}) requested is too large for "
                f"kmer_sba_start_idx ({pos})"
            )

        return fn, params, (msg,)


@jax.jit
def _windowed_any(flags_u32_cumsum, lo, hi):
    """any flag in index window [lo, hi] inclusive, given cumsum over flags."""
    n = flags_u32_cumsum.shape[0] - 1
    hi_c = jnp.minimum(hi + jnp.uint32(1), jnp.uint32(n))
    lo_c = jnp.minimum(lo, hi_c)
    return (
        jnp.take(flags_u32_cumsum, hi_c.astype(jnp.int32))
        - jnp.take(flags_u32_cumsum, lo_c.astype(jnp.int32))
    ) > 0


def _homopolymer_mask(run_len, positions, kmer_len, max_h):
    # A run of length > max_h fully inside window [p, p+k-1] exists iff some
    # i in [p+max_h, p+k-1] has run_len[i] > max_h (run covers i-max_h..i >= p).
    bad = (run_len > jnp.uint32(max_h)).astype(jnp.uint32)
    cs = jnp.concatenate([jnp.zeros(1, dtype=jnp.uint32), jnp.cumsum(bad)])
    lo = positions + jnp.uint32(max_h)
    hi = positions + jnp.uint32(kmer_len - 1)
    if kmer_len - 1 < max_h:  # window empty -> cannot fail
        return jnp.ones(positions.shape[0], dtype=bool)
    return ~_windowed_any(cs, lo, hi)


def gen_kmer_homopolymer_filter_func(max_homopolymer_size: int, kmer_len: int) -> HomopolymerFilter:
    """Reference kmers.py:37-100."""
    return HomopolymerFilter(max_homopolymer_size, kmer_len)


class GcContentFilter(KmerFilter):
    """Passes iff GC fraction within [min, max] (reference kmers.py:103-192)."""

    def __init__(self, min_allowed_gc_frac: float, max_allowed_gc_frac: float, kmer_len: int):
        if min_allowed_gc_frac > max_allowed_gc_frac:
            raise ValueError(
                f"min_allowed_gc_frac ({min_allowed_gc_frac}) must be <= max_allowed_gc_frac ({max_allowed_gc_frac})"
            )
        if min_allowed_gc_frac < 0.0 or min_allowed_gc_frac > 1.0:
            raise ValueError(
                f"min_allowed_gc_frac ({min_allowed_gc_frac}) must be in the range [0.0, 1.0]"
            )
        if max_allowed_gc_frac < 0.0 or max_allowed_gc_frac > 1.0:
            raise ValueError(
                f"max_allowed_gc_frac ({max_allowed_gc_frac}) must be in the range [0.0, 1.0]"
            )
        self.kmer_len = kmer_len
        self.min_allowed_gc_count = int(math.ceil(kmer_len * min_allowed_gc_frac))
        self.max_allowed_gc_count = int(math.floor(kmer_len * max_allowed_gc_frac))

    def __call__(self, sba, sba_strand, kmer_sba_start_idx) -> bool:
        if self.max_allowed_gc_count < self.min_allowed_gc_count:
            return False
        count = 0
        for j in range(self.kmer_len):
            idx = kmer_sba_start_idx + j
            if idx >= len(sba) or sba[idx] == _DOLLAR:
                raise ValueError(
                    f"The kmer_len ({self.kmer_len}) requested is too larger for kmer_sba_start_idx ({kmer_sba_start_idx})"
                )
            if sba[idx] == ord("G") or sba[idx] == ord("C"):
                count += 1
                if count > self.max_allowed_gc_count:
                    return False
        if self.min_allowed_gc_count <= count <= self.max_allowed_gc_count:
            return True
        return False

    def _gc_window(self, ctx):
        """(gc count up to min(valid_len, k) bases, truncated flag) — device.

        Memoized on the context: check_batch and mask_pure both need it, and
        its two 16.7M-row gathers are the dominant cost (~150 ms each on
        v5e)."""
        k = self.kmer_len
        cached = getattr(ctx, "_gc_window_cache", None)
        if cached is not None and cached[0] == k:
            return cached[1]
        pos = ctx.positions
        vl = ctx.valid_len
        gc = ctx.gc_cumsum
        d = jnp.minimum(vl, jnp.uint32(k))
        gc_before_end = jnp.take(gc, (pos + d).astype(jnp.int32)) - jnp.take(
            gc, pos.astype(jnp.int32)
        )
        out = (gc_before_end, vl < jnp.uint32(k))
        ctx._gc_window_cache = (k, out)
        return out

    def _plane_spec(self):
        k = self.kmer_len
        key = ("gc", k, self.min_allowed_gc_count, self.max_allowed_gc_count)
        mn = jnp.uint32(self.min_allowed_gc_count)
        mx = jnp.uint32(self.max_allowed_gc_count)
        return key, lambda sc: _gc_flags_genome(
            sc.gc_cumsum, sc.is_dollar, sc.valid_len_genome, mn, mx, k
        )

    def check_batch(self, ctx):
        k = self.kmer_len
        if self.max_allowed_gc_count < self.min_allowed_gc_count:
            return
        # A k-mer that hits '$'/array-end raises only if its GC count did not
        # exceed the max first (reference scans left to right, kmers.py:170-185).
        fl = self._flags(ctx)
        if fl is not None:
            raises = (fl & jnp.uint8(2)) != 0
        else:
            gc_before_end, truncated = self._gc_window(ctx)
            raises = truncated & (
                gc_before_end <= jnp.uint32(self.max_allowed_gc_count)
            )
        bad = _first_true_pos(ctx, raises)
        if bad is not None:
            raise ValueError(
                f"The kmer_len ({k}) requested is too larger for kmer_sba_start_idx ({bad})"
            )

    def mask_pure(self, ctx):
        if self.max_allowed_gc_count < self.min_allowed_gc_count:
            return jnp.zeros(ctx.positions.shape[0], dtype=bool)
        fl = self._flags(ctx)
        if fl is not None:
            return (fl & jnp.uint8(1)) != 0
        count, truncated = self._gc_window(ctx)  # count == full-window count where not truncated
        return (
            (~truncated)
            & (count >= jnp.uint32(self.min_allowed_gc_count))
            & (count <= jnp.uint32(self.max_allowed_gc_count))
        )

    def lanes_spec(self, lanes, sba_len, index_min_kmer_len):
        k = self.kmer_len
        if k < 1 or k > lanes["built_k"]:
            return None
        imp = 1 if self.max_allowed_gc_count < self.min_allowed_gc_count else 0
        params = np.array(
            [
                k,
                max(self.min_allowed_gc_count, 0),
                max(self.max_allowed_gc_count, 0),
                lanes["built_k"],
                imp,
            ],
            dtype=np.uint32,
        )
        fn = gc_lanes_flags2 if lanes["two_bit"] else gc_lanes_flags4

        def msg(pos):
            return (
                f"The kmer_len ({k}) requested is too larger for "
                f"kmer_sba_start_idx ({pos})"
            )

        return fn, params, (msg,)


def gen_kmer_gc_content_filter_func(
    min_allowed_gc_frac: float, max_allowed_gc_frac: float, kmer_len: int
) -> GcContentFilter:
    """Reference kmers.py:103-192."""
    return GcContentFilter(min_allowed_gc_frac, max_allowed_gc_frac, kmer_len)


class NoAmbiguousBasesFilter(KmerFilter):
    """Passes iff only A/C/G/T within the k-mer (reference kmers.py:195-229)."""

    def __init__(self, kmer_len: int):
        self.kmer_len = kmer_len

    def __call__(self, sba, sba_strand, kmer_sba_start_idx) -> bool:
        k = self.kmer_len
        if kmer_sba_start_idx + k > len(sba):
            raise ValueError(f"kmer_len ({k}) is invalid. It extends beyond len(sba)")
        for j in range(k):
            base = sba[kmer_sba_start_idx + j]
            if base == _DOLLAR:
                raise ValueError(f"end of segment was reached. kmer_len ({k}) invalid.")
            if base not in _ACGT:
                return False
        return True

    def _amb_offsets(self, ctx):
        """(first '$' offset within window (k if none), first ambiguous
        offset within window (k if none)) — device. Memoized on the context
        (shared by check_batch and mask_pure; the gather dominates)."""
        k = self.kmer_len
        cached = getattr(ctx, "_amb_offsets_cache", None)
        if cached is not None and cached[0] == k:
            return cached[1]
        pos = ctx.positions
        d = jnp.minimum(ctx.valid_len, jnp.uint32(k))
        na = jnp.take(ctx.next_amb, pos.astype(jnp.int32))
        a = jnp.minimum(na - pos, jnp.uint32(k))
        out = (d, a)
        ctx._amb_offsets_cache = (k, out)
        return out

    def _plane_spec(self):
        k = self.kmer_len
        return ("noamb", k), lambda sc: _no_ambiguous_flags_genome(
            sc.next_amb, sc.valid_len_genome, k
        )

    def check_batch(self, ctx):
        k = self.kmer_len
        if not ctx.positions.shape[0]:
            return
        # A '$' found before an ambiguous base raises; an ambiguous base found
        # first just fails the k-mer (reference kmers.py:216-227). The raise
        # comes from the FIRST offending row in walk order — per row the
        # overflow check preempts the segment check (reference
        # kmers.py:201-204 raises before the base loop).
        overflow = _overflow_cond(ctx, k - 1)
        fl = self._flags(ctx)
        if fl is not None:
            seg = (fl & jnp.uint8(2)) != 0
        else:
            d, a = self._amb_offsets(ctx)
            seg = (d < jnp.uint32(k)) & (d < a)
        hit = _first_offender(ctx, (overflow, seg))
        if hit is not None:
            if hit[0] == 0:
                raise ValueError(
                    f"kmer_len ({k}) is invalid. It extends beyond len(sba)"
                )
            raise ValueError(f"end of segment was reached. kmer_len ({k}) invalid.")

    def mask_pure(self, ctx):
        fl = self._flags(ctx)
        if fl is not None:
            return (fl & jnp.uint8(1)) != 0
        _, a = self._amb_offsets(ctx)
        return a >= jnp.uint32(self.kmer_len)

    def lanes_spec(self, lanes, sba_len, index_min_kmer_len):
        k = self.kmer_len
        if k < 1 or k > lanes["built_k"]:
            return None
        thr = _overflow_thr(sba_len, k - 1)
        if lanes["two_bit"]:
            fn = noamb_lanes_flags2
            params = np.array([k, thr, lanes["built_k"]], dtype=np.uint32)
        else:
            fn = noamb_lanes_flags4
            params = np.array([k, thr], dtype=np.uint32)

        def msg_overflow(pos):
            return f"kmer_len ({k}) is invalid. It extends beyond len(sba)"

        def msg_segment(pos):
            return f"end of segment was reached. kmer_len ({k}) invalid."

        return fn, params, (msg_overflow, msg_segment)


def gen_no_ambiguous_bases_filter(kmer_len: int) -> NoAmbiguousBasesFilter:
    """Reference kmers.py:195-229."""
    return NoAmbiguousBasesFilter(kmer_len)


class CrisprNggPamFilter(KmerFilter):
    """Passes for 23-mers ending in GG — SpyCas9 NGG PAM at offsets +21/+22
    (reference kmers.py:232-259). Reads raw bytes with no '$' check, exactly
    like the reference."""

    def __call__(self, sba, sba_strand, kmer_sba_start_idx) -> bool:
        if kmer_sba_start_idx + 23 > len(sba):
            raise ValueError("The guide defined at this start index extends beyond the sba")
        return sba[kmer_sba_start_idx + 21] == ord("G") and sba[
            kmer_sba_start_idx + 22
        ] == ord("G")

    def check_batch(self, ctx):
        if ctx.positions.shape[0] and _any_row(ctx, _overflow_cond(ctx, 22)):
            raise ValueError("The guide defined at this start index extends beyond the sba")

    def _plane_spec(self):
        def build(sc):
            # packed ranks carry base identity ('$'/past-end pack as rank 0,
            # not G — same outcome as the raw-byte read, whose out-of-range
            # rows raise in check_batch before any mask is consumed); 2-bit
            # on ACGT genomes, 4-bit on IUPAC, bytes as the last resort
            if getattr(sc, "packed2", None) is not None:
                return _crispr_flags_genome(sc.packed2)
            if getattr(sc, "packed", None) is not None:
                return _crispr_flags_genome_ranks4(sc.packed)
            return _crispr_flags_genome_bytes(sc.sba)

        return ("crispr",), build

    def mask_pure(self, ctx):
        fl = self._flags(ctx)
        if fl is not None:
            return (fl & jnp.uint8(1)) != 0
        pos = ctx.positions
        g = jnp.uint8(ord("G"))
        b21 = jnp.take(ctx.sba, (pos + jnp.uint32(21)).astype(jnp.int32))
        b22 = jnp.take(ctx.sba, (pos + jnp.uint32(22)).astype(jnp.int32))
        return (b21 == g) & (b22 == g)

    def lanes_spec(self, lanes, sba_len, index_min_kmer_len):
        # the reference reads raw bytes at +21/+22 with NO '$' check, so a
        # window crossing a segment boundary can match the NEXT segment's
        # bases — lanes zero fields past the cap, so they are only exact
        # when every row's cap covers 23 bases: index min_kmer_len >= 23
        # (all rows have valid_len >= min_kmer_len) and built_k >= 23
        if index_min_kmer_len < 23 or lanes["built_k"] < 23:
            return None
        # valid_len >= min_kmer_len holds by construction but not after a
        # user assignment to kmer_sba_start_indices — the index verifies it
        # against the data on demand (Kmers._cap_covers_min_k); rows whose
        # cap falls short must take the raw-byte paths instead
        check = lanes.get("cap_cover_check")
        if check is not None and not check():
            return None
        params = np.array([_overflow_thr(sba_len, 22)], dtype=np.uint32)
        fn = crispr_lanes_flags2 if lanes["two_bit"] else crispr_lanes_flags4

        def msg(pos):
            return "The guide defined at this start index extends beyond the sba"

        return fn, params, (msg,)


crispr_ngg_pam_filter = CrisprNggPamFilter()


def kmer_has_required_len(sba, sba_start_idx, min_kmer_len) -> bool:
    """Scalar parity version of reference kmers.py:262-282."""
    for idx in range(sba_start_idx, sba_start_idx + min_kmer_len):
        if idx >= len(sba) or sba[idx] == _DOLLAR:
            return False
    return True


class VectorizedFilter(KmerFilter):
    """EXTENSION: the fast path for CUSTOM filters.

    The reference's only custom-filter contract is a scalar callable
    ``(sba, sba_strand, kmer_sba_start_idx) -> bool`` (reference
    kmers.py:586), which this engine can honor only with a per-position
    host loop — unusable at 16M+ positions. Wrapping the same decision as
    ONE array op instead routes it through the vectorized engine (and the
    mesh paths) like the library filters:

        f = VectorizedFilter(
            lambda sba, positions, valid_len:
                jnp.take(sba, positions.astype(jnp.int32)) == ord("A")
        )
        km.get_kmer_count(k, kmer_filter_func=f)

    ``mask_fn(sba, positions, valid_len) -> bool[n]`` receives device
    arrays (uint8 SBA bytes, uint32 k-mer start positions, uint32 bases to
    segment end) and must return a boolean mask, built from jax.numpy ops
    so it fuses into the surrounding pipeline. An optional ``check_fn(ctx)``
    may raise host-side errors first (the check/mask split the mesh path
    relies on); an optional ``scalar_fn`` with the reference signature
    keeps per-k-mer ``__call__`` parity, otherwise ``__call__`` evaluates
    the mask at a single position.
    """

    def __init__(self, mask_fn, scalar_fn=None, check_fn=None):
        self._mask_fn = mask_fn
        self._scalar_fn = scalar_fn
        self._check_fn = check_fn

    def __call__(self, sba, sba_strand, kmer_sba_start_idx) -> bool:
        if self._scalar_fn is not None:
            return bool(self._scalar_fn(sba, sba_strand, kmer_sba_start_idx))
        sba_np = np.asarray(sba)
        pos = np.asarray([kmer_sba_start_idx], dtype=np.uint32)
        vl = np.asarray([_scalar_valid_len(sba_np, kmer_sba_start_idx)], dtype=np.uint32)
        return bool(np.asarray(self._mask_fn(jnp.asarray(sba_np), jnp.asarray(pos), jnp.asarray(vl)))[0])

    def check_batch(self, ctx: FilterContext) -> None:
        if self._check_fn is not None:
            self._check_fn(ctx)

    def mask_pure(self, ctx: FilterContext):
        return self._mask_fn(ctx.sba, ctx.positions, ctx.valid_len)
