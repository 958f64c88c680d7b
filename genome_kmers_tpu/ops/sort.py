"""Single-device sorted k-mer index construction.

The reference sorts its uint32 position array with a Numba quicksort whose
``<`` dereferences the SBA and compares base-by-base (kmers.py:1624-1652,
comparator kmers.py:306-397). On TPU that collapses into ``jax.lax.sort`` over
fixed-width packed key words plus the position as a final tie-break key —
deterministic and string-identical to the reference (the reference's default
sort leaves equal-kmer order unspecified; ours equals its ``break_ties=True``
mode, see kmers.py:1654-1731, which tests cannot distinguish since they
compare k-mer strings).

Stable tie-break note: ``lax.sort(is_stable=True)`` with position as a
PAYLOAD instead of a key is ~4% faster (71.7 vs 74.7 ms per 2^24-row
2-key-word sort on v5e) but breaks ties by INPUT order, which equals the
position tie-break only when the input is position-ascending within every
set of equal keys. ``sort_positions`` callers do NOT all satisfy that —
``from_strand`` reverse-complement instances iterate segments in record
order, which is DESCENDING in revcomp-SBA coordinates — so the gather-path
sorts here keep the explicit position key. Only the dense fresh-path kernels
(``sort_positions_dense``, ``_first_round_dense`` — input = iota, ascending
by construction) use the stable-payload form.

``max_kmer_len=None`` means "compare until the segment end" (kmers.py:315-316)
— unbounded suffix comparison. We handle it with iterative refinement: sort by
a 32-base window, then re-sort runs that are still tied (and still have bases
left) keyed by (run id, next 32-base window, position), until no run is both
tied and extendable. Random genomes resolve in 1-2 rounds.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .keys import (
    build_key2_words,
    build_key2_words_dense,
    build_key_words,
    build_key_words_dense,
    valid_len_all,
)

WINDOW_WORDS = 4  # 32 bases per refinement round (4-bit encoding)
WINDOW_BASES = WINDOW_WORDS * 8
WINDOW2_WORDS = 2  # the same 32 bases in the 2-bit encoding: half the lanes

# Padding sentinel for shape-bucketed sorts. Real positions are < 2**32 - 16
# (the Kmers uint32 ceiling), so padded rows sort strictly after every real
# row via the is_pad leading key.
_PAD_POS = jnp.uint32(0xFFFFFFF0)


def _device_loops_ok() -> bool:
    """True when data-dependent device-side control flow (lax.while_loop)
    actually EXECUTES on the active backend.

    The refinement loops below have two equivalent drivers: a fused
    ``lax.while_loop`` program (zero host round-trips — the right design on
    real TPU runtimes and CPU) and a host-driven loop that re-dispatches one
    round per ``bool(unresolved)`` check. The remote-tunnel "axon" runtime
    COMPILES while_loop programs but their execution never completes
    (probed 2026-08-20: even a 1000-iteration scalar while_loop dispatches,
    then hangs forever on the result transfer), so hosts drive the loops
    there, paying one ~31 ms resolve sync per round.

    ``GKT_HOST_LOOPS=1`` forces the host driver everywhere (differential
    tests pin the two drivers equal; also the escape hatch should another
    runtime ship broken while_loop).

    Detection detail: the axon plugin registers its devices with
    ``platform == "tpu"`` (``jax.default_backend()`` says "tpu", NOT
    "axon" — only the env var and the client's ``platform_version``
    string carry the runtime identity), so the check reads
    ``platform_version`` ("axon 0.1.0; ..." on the tunnel) and falls back
    to ``JAX_PLATFORMS``."""
    import os

    if os.environ.get("GKT_HOST_LOOPS"):
        return False
    try:
        pv = getattr(jax.devices()[0].client, "platform_version", "") or ""
        return "axon" not in pv.lower()
    except Exception:  # backend not initializable — fall back to the env pin
        return "axon" not in os.environ.get("JAX_PLATFORMS", "")


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _bucket(n: int) -> int:
    """Round n up to the next half-power-of-two step (8, 12, 16, 24, 32, …)
    so repeated sorts with nearby sizes reuse one compiled executable —
    static shapes are an XLA requirement, and per-genome-size recompiles
    would dominate small runs. Half-pow2 steps cap the padding waste at
    ~33% instead of ~100%: lax.sort is O(n log² n) over the PADDED rows, so
    a 46M-row genome sorting in a 48M bucket instead of 67M is a ~1.5×
    end-to-end win at the cost of at most 2× the cached executables."""
    b = 8
    while b < n:
        if b + b // 2 >= n:
            return b + b // 2
        b *= 2
    return b


def _pad_to(arr, n_pad: int, fill):
    n = arr.shape[0]
    if n == n_pad:
        return arr
    return jnp.concatenate([arr, jnp.full((n_pad - n,), fill, dtype=arr.dtype)])


@partial(jax.jit, static_argnames=("n_words", "uniform_cap"))
def _sort_one_window2(packed2, positions, cap_len, n_words, uniform_cap=False):
    """2-bit fast path: half the key lanes of the 4-bit path for the same k.

    Padding rows are recognized by cap_len == 0 (every real k-mer start has at
    least one base) and folded into the lanes as all-ones words + max cap, so
    no separate is_pad lane is needed. The cap rides as an explicit key after
    the words — with rank(A) = 0, equal masked words + smaller cap is exactly
    the reference's shorter-prefix-equal => smaller rule (kmers.py:372-377).

    ``uniform_cap=True`` asserts every real row's cap equals the same k
    (min_kmer_len == max_kmer_len, the flagship counting configs): the cap
    lane is then constant and dropped — one less lane to sort. Pads still
    order last because their all-ones words tie only with all-'T' k-mers,
    which the position lane (real < sentinel) resolves.

    Position stays an explicit KEY (not a stable payload — module note):
    callers may pass non-ascending positions (revcomp-strand instances,
    user-set indices).
    """
    words = build_key2_words(packed2, positions, cap_len, n_words, jnp.uint32(0))
    pad = cap_len == jnp.uint32(0)
    ones = jnp.uint32(0xFFFFFFFF)
    words = tuple(jnp.where(pad, ones, w) for w in words)
    if uniform_cap:
        ops = words + (positions,)
    else:
        cap_key = jnp.where(pad, ones, cap_len)
        ops = words + (cap_key, positions)
    # the full sorted lane tuple is returned (not just positions): callers
    # may retain the sorted key lanes so group-boundary masks become pure
    # adjacent compares with no genome gathers (measured: the boundary
    # re-gather is ~65% of the stats cost at 2^24 rows on v5e)
    return jax.lax.sort(ops, num_keys=len(ops))


@partial(jax.jit, static_argnames=("n_words",))
def _sort_one_window(packed, positions, cap_len, is_pad, n_words):
    """Single lax.sort when the full compare length fits in one window.

    is_pad is a leading uint32 key (0 real / 1 pad) so shape-bucketing
    padding sorts after every real row.
    """
    words = build_key_words(packed, positions, cap_len, n_words, jnp.uint32(0))
    return jax.lax.sort((is_pad,) + words + (positions,), num_keys=n_words + 2)


def _adjacent_eq(words: tuple[jax.Array, ...], base_eq: jax.Array) -> jax.Array:
    """eq[i] = base_eq[i] and all key words equal between i and i-1 (eq[0]=False)."""
    eq = base_eq
    for w in words:
        prev = jnp.concatenate([w[:1], w[:-1]])
        eq = eq & (w == prev)
    return eq.at[0].set(False)


@partial(jax.jit, static_argnames=("n_words", "first"))
def _sort_round(packed, positions, cap_len, group_id, offset, n_words, first):
    """One refinement round: sort, then recompute run structure.

    Returns (sorted positions, sorted cap_len, new group ids, any_unresolved).
    A pair of adjacent equal keys is unresolved iff either member still has
    bases beyond offset + window (see module docstring for why both-terminated
    ties are final). ``group_id`` doubles as the padding key on the first round
    (0 real / 1 pad): padded rows have cap 0 so their words are all-zero, but a
    real k-mer's first nibble is always >= rank('A') = 1, so pads sort last and
    stay resolved.
    """
    words = build_key_words(packed, positions, cap_len, n_words, offset)
    ops = (group_id,) + words + (positions, cap_len)
    res = jax.lax.sort(ops, num_keys=n_words + 2)
    s_gid = res[0]
    s_words = res[1 : 1 + n_words]
    if first:
        gid_eq = jnp.ones(positions.shape[0], dtype=bool)
    else:
        prev_gid = jnp.concatenate([s_gid[:1], s_gid[:-1]])
        gid_eq = s_gid == prev_gid
    s_pos = res[-2]
    s_cap = res[-1]

    eq = _adjacent_eq(s_words, gid_eq)
    limit = offset + jnp.uint32(n_words * 8)
    beyond = s_cap > limit
    prev_beyond = jnp.concatenate([beyond[:1], beyond[:-1]])
    unresolved = eq & (beyond | prev_beyond)
    new_gid = jnp.cumsum((~eq).astype(jnp.uint32))
    return s_pos, s_cap, new_gid, jnp.any(unresolved)


@partial(jax.jit, static_argnames=("first",))
def _sort_round2(packed2, positions, cap_len, group_id, offset, first):
    """One refinement round on the 2-BIT pack: 2 window words instead of the
    4-bit round's 4, plus an explicit in-window cap key (rank('A') = 0, so
    termination cannot ride inside the words — see ops/encoding.py). Same
    run-structure contract as ``_sort_round``; measured the suffix sort's
    round cost drops ~2x with the halved key lanes."""
    words = build_key2_words(packed2, positions, cap_len, WINDOW2_WORDS, offset)
    win = jnp.where(
        cap_len > offset,
        jnp.minimum(cap_len - offset, jnp.uint32(WINDOW_BASES)),
        jnp.uint32(0),
    )
    ops = (group_id,) + words + (win, positions, cap_len)
    res = jax.lax.sort(ops, num_keys=WINDOW2_WORDS + 3)
    s_gid = res[0]
    s_words = res[1 : 1 + WINDOW2_WORDS]
    s_win = res[1 + WINDOW2_WORDS]
    if first:
        gid_eq = jnp.ones(positions.shape[0], dtype=bool)
    else:
        prev_gid = jnp.concatenate([s_gid[:1], s_gid[:-1]])
        gid_eq = s_gid == prev_gid
    s_pos = res[-2]
    s_cap = res[-1]

    eq = _adjacent_eq(s_words + (s_win,), gid_eq)
    beyond = s_cap > offset + jnp.uint32(WINDOW_BASES)
    prev_beyond = jnp.concatenate([beyond[:1], beyond[:-1]])
    unresolved = eq & (beyond | prev_beyond)
    new_gid = jnp.cumsum((~eq).astype(jnp.uint32))
    return s_pos, s_cap, new_gid, jnp.any(unresolved)


def sort_positions(
    packed, positions, cap_len, max_kmer_len, packed2=None, uniform_cap=False,
    return_lanes=False,
):
    """Sort k-mer start positions lexicographically by their (capped) suffix.

    Args:
        packed: uint32 packed-rank words for the whole SBA (keys.pack_rank_words)
        positions: uint32 k-mer start positions
        cap_len: uint32 per-position compare length = min(valid_len, max_kmer_len)
        max_kmer_len: static compare cap (None = to segment end)
        packed2: optional 2-bit packed words (keys.pack_rank2_words) — the
            ACGT-only fast path with half the key lanes; caller must ensure
            the SBA alphabet is a subset of {A,C,G,T,$}
        return_lanes: also return the SORTED key lanes (see
            ``boundaries_from_sorted_lanes``), or None on the iterative-
            refinement path where no single-window lanes exist.

    Returns:
        uint32 sorted positions (ties broken by position — deterministic);
        with ``return_lanes``, a ``(positions, lanes_dict_or_None)`` pair.

    Accepts positions in ANY input order (fresh or re-sorts, revcomp-strand
    coordinate order, user-set indices) — the position tie-break is an
    explicit key, not input-order stability.

    Inputs are shape-bucketed to the next power of two so nearby sizes share
    one compiled executable; padded rows carry an is_pad leading key and are
    sliced off after the sort.
    """
    n = positions.shape[0]
    if n <= 1:
        return (positions, None) if return_lanes else positions
    n_pad = _bucket(n)
    positions = _pad_to(positions, n_pad, _PAD_POS)
    cap_len = _pad_to(cap_len, n_pad, jnp.uint32(0))

    if packed2 is not None and max_kmer_len is not None and max_kmer_len <= 64:
        n_words = _cdiv(max_kmer_len, 16)
        res = _sort_one_window2(packed2, positions, cap_len, n_words, uniform_cap)
        out = res[-1][:n]
        if not return_lanes:
            return out
        # pads sort strictly last, so [:n] keeps exactly the real rows
        lanes = {
            "two_bit": True,
            "built_k": max_kmer_len,
            "words": tuple(w[:n] for w in res[:n_words]),
            "cap": None if uniform_cap else res[n_words][:n],
        }
        return out, lanes

    is_pad = _pad_to(jnp.zeros(n, dtype=jnp.uint32), n_pad, jnp.uint32(1))

    if max_kmer_len is not None and max_kmer_len <= WINDOW_BASES:
        n_words = _cdiv(max_kmer_len, 8)
        res = _sort_one_window(packed, positions, cap_len, is_pad, n_words)
        out = res[-1][:n]
        if not return_lanes:
            return out
        lanes = {
            "two_bit": False,
            "built_k": max_kmer_len,
            "words": tuple(w[:n] for w in res[1 : 1 + n_words]),
            "cap": None,  # the 4-bit encoding carries termination in-word
        }
        return out, lanes

    if packed2 is not None:
        # 2-bit refinement rounds: half the key lanes per 32-base window.
        # Where the backend executes device-side loops, first round + ALL
        # refinement rounds run as ONE compiled program with zero host
        # round-trips; otherwise the host re-dispatches rounds, one ~31 ms
        # resolve sync each (see _device_loops_ok).
        if _device_loops_ok():
            pos = _sort_iterative2(packed2, positions, cap_len, is_pad)
            return (pos[:n], None) if return_lanes else pos[:n]
        pos, cap, gid, unresolved = _sort_round2(
            packed2, positions, cap_len, is_pad, jnp.uint32(0), True
        )
        offset = WINDOW_BASES
        while bool(unresolved):
            pos, cap, gid, unresolved = _sort_round2(
                packed2, pos, cap, gid, jnp.uint32(offset), False
            )
            offset += WINDOW_BASES
        return (pos[:n], None) if return_lanes else pos[:n]

    if _device_loops_ok():
        pos = _sort_iterative(packed, positions, cap_len, is_pad)
        return (pos[:n], None) if return_lanes else pos[:n]
    pos, cap, gid, unresolved = _sort_round(
        packed, positions, cap_len, is_pad, jnp.uint32(0), WINDOW_WORDS, True
    )
    offset = WINDOW_BASES
    while bool(unresolved):
        pos, cap, gid, unresolved = _sort_round(
            packed, pos, cap, gid, jnp.uint32(offset), WINDOW_WORDS, False
        )
        offset += WINDOW_BASES
    return (pos[:n], None) if return_lanes else pos[:n]


def _window_refine_loop(sort_round, pos, cap, gid, offset0, unresolved):
    """Run window-refinement rounds to convergence ON DEVICE.

    ``sort_round(pos, cap, gid, offset) -> (pos, cap, gid, unresolved)`` is
    one 32-base re-sort round (a closure over the packed genome). The loop is
    a ``lax.while_loop`` so a fully-resolved input executes zero rounds and
    NO host synchronization ever happens — the reference's comparator loop
    (kmers.py:360-393) walks bases on the host per compare; here even the
    "are we done" control decision stays on the TPU.
    """

    def body(c):
        pos, cap, gid, off, _ = c
        pos, cap, gid, unr = sort_round(pos, cap, gid, off)
        return (pos, cap, gid, off + jnp.uint32(WINDOW_BASES), unr)

    out = jax.lax.while_loop(
        lambda c: c[-1], body, (pos, cap, gid, jnp.uint32(offset0), unresolved)
    )
    return out[0], out[1], out[2]


@jax.jit
def _sort_iterative2(packed2, positions, cap_len, is_pad):
    """Fused unbounded/beyond-window sort on the 2-bit pack: first round +
    while_loop refinement, one dispatch, no host syncs."""
    pos, cap, gid, unresolved = _sort_round2(
        packed2, positions, cap_len, is_pad, jnp.uint32(0), True
    )
    pos, _, _ = _window_refine_loop(
        lambda p, c, g, o: _sort_round2(packed2, p, c, g, o, False),
        pos, cap, gid, WINDOW_BASES, unresolved,
    )
    return pos


@jax.jit
def _sort_iterative(packed, positions, cap_len, is_pad):
    """Fused unbounded/beyond-window sort on the 4-bit pack (see
    ``_sort_iterative2``)."""
    pos, cap, gid, unresolved = _sort_round(
        packed, positions, cap_len, is_pad, jnp.uint32(0), WINDOW_WORDS, True
    )
    pos, _, _ = _window_refine_loop(
        lambda p, c, g, o: _sort_round(packed, p, c, g, o, WINDOW_WORDS, False),
        pos, cap, gid, WINDOW_BASES, unresolved,
    )
    return pos


@partial(jax.jit, static_argnames=("n_words",))
def _first_round_dense(packed, seg_starts, seg_ends, min_len, max_k, n_words):
    """Gather-free FIRST refinement round over ALL positions of a
    (bucket-padded) 4-bit pack — the dense analog of
    ``_sort_round(..., first=True)``.

    Key words are shifted slices (build_key_words_dense) and valid_len is a
    scatter + cummax; the position tie-break is the stable-sort payload
    (valid ONLY here: the input position array is iota, globally ascending).
    Rows below ``min_len`` (separators, short tails, bucket padding) carry a
    leading invalid key with cap forced to 0, so they sort last and are
    resolved immediately. ``max_k`` is a TRACED cap (0xFFFFFFFF = unbounded)
    so every (min, max) combination shares one program per shape.

    Returns (sorted positions, sorted cap, group ids, any_unresolved) in the
    exact form ``_sort_round`` consumes for the remaining rounds.
    """
    L = packed.shape[0]
    iota = jax.lax.iota(jnp.uint32, L)
    vl = valid_len_all(seg_starts, seg_ends, iota)
    cap = jnp.minimum(vl, max_k)
    invalid = cap < min_len
    cap = jnp.where(invalid, jnp.uint32(0), cap)
    words = build_key_words_dense(packed, cap, n_words)
    lead = invalid.astype(jnp.uint32)
    res = jax.lax.sort(
        (lead,) + words + (iota, cap), num_keys=n_words + 1, is_stable=True
    )
    s_lead = res[0]
    s_words = res[1 : 1 + n_words]
    s_pos = res[-2]
    s_cap = res[-1]
    eq = _adjacent_eq((s_lead,) + tuple(s_words), jnp.ones(L, dtype=bool))
    limit = jnp.uint32(n_words * 8)
    beyond = s_cap > limit
    prev_beyond = jnp.concatenate([beyond[:1], beyond[:-1]])
    unresolved = eq & (beyond | prev_beyond)
    new_gid = jnp.cumsum((~eq).astype(jnp.uint32))
    return s_pos, s_cap, new_gid, jnp.any(unresolved)


# first-dense-round window: 28 bases, so the second word's low 8 bits are
# free to carry the in-window cap (<= 28) — the round then sorts the SAME
# lane structure as the flagship bounded 2-bit build (2 key words + one
# stable payload), with the resolve bit riding in the payload's top bit
WINDOW2F_BASES = 28


@jax.jit
def _first_round_dense2(packed2, seg_starts, seg_ends, min_len, max_k):
    """Gather-free FIRST refinement round on the 2-BIT pack.

    Lane budget is the whole game here (the 4-bit round sorts 6 lanes, the
    flagship bounded build 3): a 28-base window leaves 8 zero bits at the
    bottom of word 1, which hold the in-window compare cap — equal masked
    words then order by cap, exactly the shorter-prefix-equal => smaller
    rule (termination can't ride IN 2-bit words, rank('A') = 0). The
    position payload's top bit carries "extends beyond the window", so the
    whole round is 2 key lanes + 1 stable payload. Invalid rows (tails
    below min_len, '$', bucket padding) fold to all-ones words and sort
    strictly last (a real word-1 low byte is <= 28 < 0xFF)."""
    L = packed2.shape[0]
    iota = jax.lax.iota(jnp.uint32, L)
    vl = valid_len_all(seg_starts, seg_ends, iota)
    cap = jnp.minimum(vl, max_k)
    invalid = cap < min_len
    cap = jnp.where(invalid, jnp.uint32(0), cap)
    win = jnp.minimum(cap, jnp.uint32(WINDOW2F_BASES))
    w0, w1 = build_key2_words_dense(packed2, win, WINDOW2_WORDS)
    ones = jnp.uint32(0xFFFFFFFF)
    w0 = jnp.where(invalid, ones, w0)
    w1 = jnp.where(invalid, ones, w1 | win)  # win <= 28 fits the zeroed low byte
    beyond = (cap > jnp.uint32(WINDOW2F_BASES)).astype(jnp.uint32)
    iota_b = iota | (beyond << jnp.uint32(31))
    s_w0, s_w1, s_iota = jax.lax.sort(
        (w0, w1, iota_b), num_keys=2, is_stable=True
    )
    s_pos = s_iota & jnp.uint32(0x7FFFFFFF)
    s_beyond = s_iota >> jnp.uint32(31) != 0
    eq = _adjacent_eq((s_w0, s_w1), jnp.ones(L, dtype=bool))
    prev_beyond = jnp.concatenate([s_beyond[:1], s_beyond[:-1]])
    unresolved = eq & (s_beyond | prev_beyond)
    new_gid = jnp.cumsum((~eq).astype(jnp.uint32))
    return s_pos, new_gid, jnp.any(unresolved)


@jax.jit
def _double_round2(pos, gid, cap, h):
    """One PREFIX-DOUBLING round (Manber-Myers over the refinement run ids):
    rows tied at h bases re-key by (rank_h, rank_h of the suffix starting h
    bases later) — after the sort every row is ordered by 2h bases. Repeat-
    heavy genomes then resolve in O(log(longest repeat)) rounds instead of
    O(longest repeat / 32) window rounds.

    Valid ONLY for min_kmer_len == 1 and max_kmer_len == None (every lookup
    target p + h is then itself a ranked suffix start, and no compare cap
    can fall strictly inside the doubled span): the reference's flagship
    suffix semantics. ``gid`` must be the CURRENT run ids in sorted order
    (ascending = rank order); terminated rows (cap <= h) re-key to 0, which
    sorts before every real rank + 1 — the shorter-prefix-equal => smaller
    rule. Ties at (rank, rank2) keep input order (stable payload), which is
    position-ascending by induction from the first round's iota payload.
    ``h`` is traced, so every round shares one executable."""
    L = pos.shape[0]
    inv = jnp.zeros(L, dtype=jnp.uint32).at[pos.astype(jnp.int32)].set(gid)
    beyond = cap > h
    qidx = jnp.where(beyond, pos + h, jnp.uint32(0)).astype(jnp.int32)
    key2 = jnp.where(
        beyond, jnp.take(inv, qidx, mode="clip") + jnp.uint32(1), jnp.uint32(0)
    )
    s_gid, s_key2, s_pos, s_cap = jax.lax.sort(
        (gid, key2, pos, cap), num_keys=2, is_stable=True
    )
    prev_g = jnp.concatenate([s_gid[:1], s_gid[:-1]])
    prev_k = jnp.concatenate([s_key2[:1], s_key2[:-1]])
    eq = (s_gid == prev_g) & (s_key2 == prev_k)
    h2 = h + h
    b2 = s_cap > h2
    prev_b2 = jnp.concatenate([b2[:1], b2[:-1]])
    unresolved = eq & (b2 | prev_b2)
    new_gid = jnp.cumsum((~eq).astype(jnp.uint32))
    return s_pos, new_gid, s_cap, jnp.any(unresolved)


def sort_positions_suffix_dense(
    packed, seg_starts, seg_ends, n, min_kmer_len, max_kmer_len, packed2=None,
    return_gid=False,
):
    """Fresh sort of the canonical start set for UNBOUNDED or beyond-window
    ``max_kmer_len`` (the iterative-refinement regime): the first — dominant
    — round runs gather-free over every SBA position; later rounds re-sort
    within unresolved groups via gathered window words (unavoidable once the
    order is data-dependent). Output is identical to ``sort_positions`` over
    the canonical start set. ``n`` = the known canonical start count;
    ``packed`` is the 4-bit per-position pack, or pass ``packed2`` (2-bit,
    ACGT genomes) for the folded first round + halved-lane refinement.
    Measured at 2^24 on v5e (round 4): 2-bit 114.6 ms (146M suffixes/s,
    ~84 ms device time — the rest is the one ~31 ms tunnel sync on the
    resolve check) vs 4-bit 198 ms (85M/s).

    ``return_gid``: also return the CONVERGED run ids aligned with the
    sorted rows — rows share an id iff their k-mers are equal under the
    sort's full (max_kmer_len / suffix) comparison, so group-boundary
    masks at the same identity become a pure adjacent-diff with no window
    loop (the single-chip analog of the mesh's retained gid_full).
    """
    maxk = jnp.uint32(0xFFFFFFFF if max_kmer_len is None else max_kmer_len)
    # prefix doubling applies to BOTH encodings — _double_round2 is
    # pack-independent (it re-keys by run ids alone)
    doubling = min_kmer_len == 1 and max_kmer_len is None
    fused = _device_loops_ok()
    if packed2 is not None:
        L = packed2.shape[0]
        n_pad = _bucket(L)
        packed2 = _pad_to(packed2, n_pad, jnp.uint32(0))
        if fused:
            pos, gid = _suffix_dense2_all(
                packed2, seg_starts, seg_ends, jnp.uint32(min_kmer_len), maxk,
                doubling,
            )
        else:
            pos, gid, unresolved = _first_round_dense2(
                packed2, seg_starts, seg_ends, jnp.uint32(min_kmer_len), maxk
            )
            offset = WINDOW2F_BASES
            cap = None
            while bool(unresolved):
                if cap is None:
                    # the folded first round carries no cap lane; rebuild
                    # caps for the (rare) refinement rounds. Rows past
                    # their segment end (separators / bucket padding) wrap
                    # compute_valid_len — clamp to 0 so they stay resolved.
                    from .keys import compute_valid_len

                    vl = compute_valid_len(pos, seg_starts, seg_ends)
                    cap = jnp.where(
                        vl >= jnp.uint32(0x80000000), jnp.uint32(0),
                        jnp.minimum(vl, maxk),
                    )
                if doubling:
                    pos, gid, cap, unresolved = _double_round2(
                        pos, gid, cap, jnp.uint32(offset)
                    )
                    offset += offset
                else:
                    pos, cap, gid, unresolved = _sort_round2(
                        packed2, pos, cap, gid, jnp.uint32(offset), False
                    )
                    offset += WINDOW_BASES
        if return_gid:
            return pos[:n], gid[:n]
        return pos[:n]
    L = packed.shape[0]
    n_pad = _bucket(L)
    packed = _pad_to(packed, n_pad, jnp.uint32(0))  # pad rows fall past the last
    # seg_end, so valid_len_all yields 0 for them; the fill value itself is
    # never observed (cap masks every slice read)
    if fused:
        pos, gid = _suffix_dense_all(
            packed, seg_starts, seg_ends, jnp.uint32(min_kmer_len), maxk,
            doubling,
        )
    else:
        pos, cap, gid, unresolved = _first_round_dense(
            packed, seg_starts, seg_ends, jnp.uint32(min_kmer_len), maxk,
            WINDOW_WORDS,
        )
        offset = WINDOW_BASES
        while bool(unresolved):
            if doubling:
                pos, gid, cap, unresolved = _double_round2(
                    pos, gid, cap, jnp.uint32(offset)
                )
                offset += offset
            else:
                pos, cap, gid, unresolved = _sort_round(
                    packed, pos, cap, gid, jnp.uint32(offset), WINDOW_WORDS,
                    False,
                )
                offset += WINDOW_BASES
    if return_gid:
        return pos[:n], gid[:n]
    return pos[:n]


def _doubling_refine_loop(pos, gid, cap, h0, unresolved):
    """Prefix-doubling rounds to convergence ON DEVICE (see
    ``_double_round2``): the classic Manber-Myers outer loop expressed as a
    ``lax.while_loop`` — no host sync per doubling, O(log repeat) fused
    rounds in the one compiled program."""

    def body(c):
        pos, gid, cap, h, _ = c
        pos, gid, cap, unr = _double_round2(pos, gid, cap, h)
        return (pos, gid, cap, h + h, unr)

    out = jax.lax.while_loop(
        lambda c: c[-1], body, (pos, gid, cap, jnp.uint32(h0), unresolved)
    )
    return out[0], out[1]


def _refine_cap(pos, seg_starts, seg_ends, maxk, unresolved):
    """Per-row compare caps for refinement rounds, rebuilt only when a round
    will actually run (lax.cond — the resolved common case skips the
    gathered segment lookup entirely). Rows past their segment end
    (separators / bucket padding) wrap compute_valid_len — clamp them to 0
    so they stay resolved."""
    from .keys import compute_valid_len

    def rebuild(p):
        vl = compute_valid_len(p, seg_starts, seg_ends)
        return jnp.where(
            vl >= jnp.uint32(0x80000000), jnp.uint32(0), jnp.minimum(vl, maxk)
        )

    return jax.lax.cond(unresolved, rebuild, jnp.zeros_like, pos)


@partial(jax.jit, static_argnames=("doubling",))
def _suffix_dense2_all(packed2, seg_starts, seg_ends, min_len, maxk, doubling):
    """The ENTIRE 2-bit suffix/beyond-window fresh sort as one compiled
    program: gather-free folded first round + refinement to convergence
    (prefix doubling or 32-base window rounds) under ``lax.while_loop``.
    One dispatch, zero host round-trips — the old per-round
    ``bool(unresolved)`` checks each cost a ~31 ms tunnel sync on v5e."""
    pos, gid, unresolved = _first_round_dense2(
        packed2, seg_starts, seg_ends, min_len, maxk
    )
    # the folded first round carries no cap lane; rebuild caps for the
    # (rare) refinement rounds
    cap = _refine_cap(pos, seg_starts, seg_ends, maxk, unresolved)
    if doubling:
        return _doubling_refine_loop(pos, gid, cap, WINDOW2F_BASES, unresolved)
    pos, _, gid = _window_refine_loop(
        lambda p, c, g, o: _sort_round2(packed2, p, c, g, o, False),
        pos, cap, gid, WINDOW2F_BASES, unresolved,
    )
    return pos, gid


@partial(jax.jit, static_argnames=("doubling",))
def _suffix_dense_all(packed, seg_starts, seg_ends, min_len, maxk, doubling):
    """4-bit (IUPAC) variant of ``_suffix_dense2_all``."""
    pos, cap, gid, unresolved = _first_round_dense(
        packed, seg_starts, seg_ends, min_len, maxk, WINDOW_WORDS
    )
    if doubling:
        return _doubling_refine_loop(pos, gid, cap, WINDOW_BASES, unresolved)
    pos, _, gid = _window_refine_loop(
        lambda p, c, g, o: _sort_round(packed, p, c, g, o, WINDOW_WORDS, False),
        pos, cap, gid, WINDOW_BASES, unresolved,
    )
    return pos, gid


@partial(jax.jit, static_argnames=("n_words", "k", "uniform_cap", "two_bit"))
def _sort_dense(packed, seg_starts, seg_ends, min_len, n_words, k, uniform_cap,
                two_bit):
    """Gather-free fresh sort over ALL positions 0..L-1 of a (bucket-padded)
    packed array.

    Key words are shifted slices of ``packed`` (build_key*_words_dense) and
    valid_len comes from a scatter + cummax (valid_len_all) — no per-row
    gathers at all, which the gather-based build spends ~80% of the fresh
    k=31 index build on (304 of ~370 ms at 2^24 rows on v5e).

    Rows that are not k-mer starts (separators, tails shorter than
    ``min_len``, bucket padding — pad rows sit past the last seg_end so
    valid_len_all yields 0) fold to all-ones words (+ all-ones cap) and
    sort strictly last:
    real 2-bit words never equal all-ones when k % 16 != 0 (the last word
    keeps < 16 bases, low bits zero); when k % 16 == 0 the cap lane is kept
    as the discriminator (real cap = k < 0xFFFFFFFF); the 4-bit path keeps
    its leading invalid lane (a real word CAN be all-ones — rank 15 = 'Y').
    Position is the stable-sort payload (iota input = globally ascending).

    Returns the full sorted lane tuple (positions last); the caller slices
    the real-row prefix [:n].
    """
    L = packed.shape[0]
    iota = jax.lax.iota(jnp.uint32, L)
    vl = valid_len_all(seg_starts, seg_ends, iota)
    cap = jnp.minimum(vl, jnp.uint32(k))
    invalid = cap < min_len
    ones = jnp.uint32(0xFFFFFFFF)
    if two_bit:
        words = build_key2_words_dense(packed, cap, n_words)
        words = tuple(jnp.where(invalid, ones, w) for w in words)
        if uniform_cap and k % 16 != 0:
            ops = words + (iota,)
        else:
            cap_key = jnp.where(invalid, ones, cap)
            ops = words + (cap_key, iota)
    else:
        words = build_key_words_dense(packed, cap, n_words)
        ops = (invalid.astype(jnp.uint32),) + words + (iota,)
    return jax.lax.sort(ops, num_keys=len(ops) - 1, is_stable=True)


def sort_positions_dense(
    packed, seg_starts, seg_ends, n, min_kmer_len, max_kmer_len,
    two_bit=False, uniform_cap=False, return_lanes=False,
):
    """Fresh sort of the CANONICAL k-mer start set — every position with
    valid_len >= min_kmer_len — without materializing the position array or
    gathering keys. Output is identical to ``sort_positions`` over that set
    (same keys, same position tie-break). Requires bounded
    max_kmer_len <= one window. ``n`` = the known canonical start count;
    ``packed`` is the 2-bit pack when two_bit else the 4-bit pack.
    """
    L = packed.shape[0]
    n_pad = _bucket(L)
    packed = _pad_to(packed, n_pad, jnp.uint32(0))  # pad rows fall past the last
    # seg_end, so valid_len_all yields 0 for them; the fill value itself is
    # never observed (cap masks every slice read)
    n_words = _cdiv(max_kmer_len, 16 if two_bit else 8)
    res = _sort_dense(
        packed, seg_starts, seg_ends, jnp.uint32(min_kmer_len), n_words,
        max_kmer_len, uniform_cap, two_bit,
    )
    out = res[-1][:n]
    if not return_lanes:
        return out
    if two_bit:
        lanes = {
            "two_bit": True,
            "built_k": max_kmer_len,
            "words": tuple(w[:n] for w in res[:n_words]),
            "cap": None if uniform_cap else res[n_words][:n],
        }
    else:
        lanes = {
            "two_bit": False,
            "built_k": max_kmer_len,
            "words": tuple(w[:n] for w in res[1 : 1 + n_words]),
            "cap": None,
        }
    return out, lanes


@partial(jax.jit, static_argnames=("two_bit",))
def boundaries_from_sorted_lanes(words, cap, kmer_len, two_bit):
    """Group-boundary mask from RETAINED sorted key lanes — a pure adjacent
    compare with ZERO genome gathers (measured: rebuilding the words via
    gathers is ~65% of the stats cost at 2^24 rows on v5e; this path removes
    it entirely).

    ``words``/``cap`` are the sorted lanes ``sort_positions(...,
    return_lanes=True)`` produced at some built length K. Any
    ``kmer_len <= K`` is recoverable: word content beyond each row's cap is
    already zero, so masking each word to ``kmer_len`` bases and clamping
    the cap lane to ``min(cap, kmer_len)`` yields exactly the lanes a fresh
    build at kmer_len would produce. ``cap=None`` = the uniform-cap (or
    4-bit, termination-in-word) case with no cap identity lane.

    ``kmer_len`` may be a TRACED scalar: the per-word keep masks are
    computed with shifts, so ONE compiled program serves every
    ``kmer_len <= K`` (a k-sweep — the reference's flagship application —
    stops paying a fresh compile per k).
    """
    bases_per_word = 16 if two_bit else 8
    bits = 2 if two_bit else 4
    k = jnp.asarray(kmer_len, dtype=jnp.int32)
    n = words[0].shape[0]
    eq = jnp.ones(n, dtype=bool)
    full = jnp.uint32(0xFFFFFFFF)
    for w_idx, w in enumerate(words):
        keep = jnp.clip(k - w_idx * bases_per_word, 0, bases_per_word)
        nbits = (bits * keep).astype(jnp.uint32)  # bits to keep, 0..32
        # mask = 0xFFFFFFFF << (32 - nbits); a 32-bit shift is undefined,
        # so the nbits == 0 (word entirely past k) case is selected out
        shift = jnp.minimum(jnp.uint32(32) - nbits, jnp.uint32(31))
        mask = jnp.where(nbits == 0, jnp.uint32(0), full << shift)
        ww = w & mask
        prev = jnp.concatenate([ww[:1], ww[:-1]])
        eq = eq & (ww == prev)
    if cap is not None:
        c = jnp.minimum(cap, k.astype(jnp.uint32))
        prev = jnp.concatenate([c[:1], c[:-1]])
        eq = eq & (c == prev)
    return (~eq).at[0].set(True)


@partial(jax.jit, static_argnames=("n_words",))
def _adj_eq_round(packed, positions, cap_len, eq, offset, n_words):
    """One round of adjacent-pair comparison at the given base offset."""
    words = build_key_words(packed, positions, cap_len, n_words, offset)
    eq = _adjacent_eq(words, eq)
    limit = offset + jnp.uint32(n_words * 8)
    beyond = cap_len > limit
    prev_beyond = jnp.concatenate([beyond[:1], beyond[:-1]])
    unresolved = eq & (beyond | prev_beyond)
    return eq, jnp.any(unresolved)


@partial(jax.jit, static_argnames=("n_words", "uniform_cap"))
def _adjacent_eq2(packed2, sorted_positions, cap_len, n_words, uniform_cap=False):
    """2-bit adjacent equality: equal masked words AND equal caps (with
    rank(A)=0 the truncation point is not encoded in the words, so cap
    equality is part of group identity — see encoding.py). With uniform caps
    the cap compare is a constant and skipped."""
    words = build_key2_words(packed2, sorted_positions, cap_len, n_words, jnp.uint32(0))
    n = sorted_positions.shape[0]
    eq = jnp.ones(n, dtype=bool)
    lanes = words if uniform_cap else words + (cap_len,)
    for w in lanes:
        prev = jnp.concatenate([w[:1], w[:-1]])
        eq = eq & (w == prev)
    return eq.at[0].set(False)


def adjacent_boundaries(
    packed, sorted_positions, cap_len, kmer_len, packed2=None, uniform_cap=False
) -> jax.Array:
    """Group-boundary mask over a sorted position array.

    boundary[i] = True iff kmer(sorted_positions[i]) != kmer(sorted_positions[i-1])
    when compared with the reference comparator at max_kmer_len=kmer_len
    (kmers.py:306-397); boundary[0] = True. This replaces the sequential
    group-walk carry (kmers.py:592-601) with a vectorized adjacent compare.
    """
    n = sorted_positions.shape[0]
    if n == 0:
        return jnp.zeros((0,), dtype=bool)
    n_pad = _bucket(n)
    sorted_positions = _pad_to(sorted_positions, n_pad, _PAD_POS)
    cap_len = _pad_to(cap_len, n_pad, jnp.uint32(0))

    if packed2 is not None and kmer_len is not None and kmer_len <= 64:
        eq = _adjacent_eq2(
            packed2, sorted_positions, cap_len, _cdiv(kmer_len, 16), uniform_cap
        )
        return (~eq)[:n]

    if kmer_len is not None and kmer_len <= WINDOW_BASES:
        words = build_key_words(
            packed, sorted_positions, cap_len, _cdiv(kmer_len, 8), jnp.uint32(0)
        )
        eq = _adjacent_eq(words, jnp.ones(n_pad, dtype=bool))
        return (~eq)[:n]

    if _device_loops_ok():
        return (~_adj_eq_all(packed, sorted_positions, cap_len))[:n]
    eq = jnp.ones(n_pad, dtype=bool)
    offset = 0
    while True:
        eq, unresolved = _adj_eq_round(
            packed, sorted_positions, cap_len, eq, jnp.uint32(offset),
            WINDOW_WORDS,
        )
        offset += WINDOW_BASES
        if not bool(unresolved):
            break
    return (~eq)[:n]


@jax.jit
def _adj_eq_all(packed, sorted_positions, cap_len):
    """Beyond-window adjacent equality to convergence as ONE compiled
    program (do-while via lax.while_loop — no per-window host sync)."""
    eq0 = jnp.ones(sorted_positions.shape[0], dtype=bool)

    def body(c):
        eq, off, _ = c
        eq, unr = _adj_eq_round(
            packed, sorted_positions, cap_len, eq, off, WINDOW_WORDS
        )
        return (eq, off + jnp.uint32(WINDOW_BASES), unr)

    out = jax.lax.while_loop(
        lambda c: c[-1], body, (eq0, jnp.uint32(0), jnp.bool_(True))
    )
    return out[0]
