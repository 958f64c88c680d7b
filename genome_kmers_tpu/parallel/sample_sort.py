"""Splitter-based sample sort over the mesh — the bandwidth-optimal
distributed k-mer sort (BASELINE.json north star: "splitter-based all-to-all
redistribution").

Pipeline (one shard_map, all static shapes):

  1. local sort of (key words, cap, position) — position as final key makes
     every row globally unique, so splitters partition EXACTLY even under
     fully degenerate key distributions (an all-'A' genome included).
  2. regular-stride sample of s rows per shard -> all_gather -> P*s samples
     replicated -> sort -> P-1 splitters at stride s.
  3. destination shard per row = searchsorted(splitters, row) on the full
     (words, cap, pos) tuple. Rows are locally sorted, so destinations are a
     non-decreasing run; bucket b occupies one contiguous slice.
  4. fixed-capacity exchange: each shard packs bucket b into slot b of a
     (P, C) send buffer (C = per-destination capacity, padded rows flagged),
     then one ``jax.lax.all_to_all`` moves slot b of every shard to shard b —
     ~1x the data over ICI, vs the odd-even merge's P phases.
  5. local merge sort of the received (P*C) rows with an is_pad lead key:
     shard b now holds the globally b-th key range, valid rows first.

The result is globally sorted but *ragged*: shard b holds n_b real rows
(n_b ~= N/P by step 1's uniqueness) followed by pads. ``capacity_factor``
bounds the imbalance the exchange can absorb; an overflow indicator is
returned so callers can retry with a larger factor (sampling error for
s samples/shard is O(m/s), so the default is conservative).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..ops.keys import cap_lengths, compute_valid_len
from ..ops.sort import _PAD_POS, _cdiv
from .distributed import (
    AXIS,
    Mesh,
    _pad_to_multiple,
    _words_for,
    hier_shape as _hier_shape,
    mesh_axes,
    mesh_pspec,
    mesh_size,
    put_global,
)


_ONES = 0xFFFFFFFF


def _lex_less_tuple(a: tuple, b: tuple):
    """a < b, lexicographic over aligned uint32 lane tuples (broadcasts)."""
    lt = None
    eq = None
    for wa, wb in zip(a, b):
        l = wa < wb
        e = wa == wb
        if lt is None:
            lt, eq = l, e
        else:
            lt = lt | (eq & l)
            eq = eq & e
    return lt


def _searchsorted_rows(splitters: tuple, rows: tuple, n_split: int):
    """dest[i] = number of splitters <= rows[i] (lex over lanes) — a binary
    search unrolled over log2 rounds on the replicated splitter table."""
    nq = rows[0].shape[0]
    if n_split == 0:  # single-shard mesh: everything stays local
        return jnp.zeros(nq, dtype=jnp.int32)
    lo = jnp.zeros(nq, dtype=jnp.int32)
    hi = jnp.full(nq, n_split, dtype=jnp.int32)
    rounds = max(1, int(np.ceil(np.log2(max(n_split, 2)))) + 1)
    for _ in range(rounds):
        active = lo < hi
        mid = (lo + hi) >> 1
        sp = tuple(jnp.take(w, mid, mode="clip") for w in splitters)
        # advance while splitter[mid] <= row  <=>  not (row < splitter[mid])
        go_right = ~_lex_less_tuple(rows, sp)
        lo = jnp.where(active & go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
    return lo


def _words_at(genome, pos_lanes, cap_len, n_words, two_bit, offset, strided=False):
    """Key words for positions given as a lane tuple: ``(pos,)`` on the flat
    per-position-pack path, ``(hi, lo)`` uint32 pairs on the strided 64-bit
    path (ops/large.py) for genomes past the int32 gather limit."""
    if strided:
        from ..ops.large import build_key2_words_strided, build_key_words_strided

        hi, lo = pos_lanes
        fn = build_key2_words_strided if two_bit else build_key_words_strided
        return fn(genome, hi, lo, cap_len, n_words, offset)
    from ..ops.keys import build_key2_words, build_key_words

    (positions,) = pos_lanes
    if two_bit:
        return build_key2_words(genome, positions, cap_len, n_words, jnp.uint32(offset))
    return build_key_words(genome, positions, cap_len, n_words, jnp.uint32(offset))


def _sample_sort_local(genome, pos_lanes, cap_len, is_pad, n_words, n_dev, two_bit,
                       n_samples, capacity, uniform_cap, gid=None, offset=0,
                       strided=False, canonical_k=None, axes=AXIS,
                       hier_shape=None):
    words = _words_at(genome, pos_lanes, cap_len, n_words, two_bit, offset, strided)
    if canonical_k is not None:
        # canonical (strand-collapsed) keys: min(fwd, revcomp) per row —
        # bit-arithmetic revcomp on the 2-bit path, per-nibble rank
        # complement on the 4-bit (IUPAC) path. Full-length rows only (the
        # caller pads out truncated rows), so the word formats match
        # ops/canonical.revcomp_key_words / revcomp_key_words4 exactly.
        from ..ops.canonical import revcomp_words_any

        rc = revcomp_words_any(words, canonical_k, two_bit)
        lt = jnp.zeros(words[0].shape, dtype=bool)
        eq = jnp.ones(words[0].shape, dtype=bool)
        for a, b in zip(rc, words):
            lt = lt | (eq & (a < b))
            eq = eq & (a == b)
        words = tuple(jnp.where(lt, a, b) for a, b in zip(rc, words))
    # fold pads into the lanes so they sort last everywhere
    padm = is_pad != jnp.uint32(0)
    ones = jnp.uint32(_ONES)
    words = tuple(jnp.where(padm, ones, w) for w in words)
    if gid is not None:
        # refinement rounds: run id leads the key (unbounded-k suffix mode).
        # A single uint32 lane on the flat path; a (hi, lo) lane PAIR on the
        # large path, where run counts can exceed 2^32.
        gid_lanes = gid if isinstance(gid, tuple) else (gid,)
        words = tuple(jnp.where(padm, ones, g) for g in gid_lanes) + words
    pos_k = tuple(jnp.where(padm, ones, p) for p in pos_lanes)

    # local sort key (cap lane dropped when every real cap equals the same k).
    # Position lanes stay KEYS here (unlike ops/sort.py's stable-payload
    # trick): the sample sort accepts arbitrary-order position input (tests
    # shuffle it), so stable input-order tie-break would not equal the
    # position tie-break this function promises.
    if uniform_cap:
        lanes = words + pos_k
    else:
        cap_k = jnp.where(padm, ones, cap_len)
        lanes = words + (cap_k,) + pos_k
    return _exchange_merge(
        lanes, len(pos_lanes), padm, n_dev, n_samples, capacity,
        n_gid=0 if gid is None else len(gid) if isinstance(gid, tuple) else 1,
        axes=axes, hier_shape=hier_shape,
    )


def _exchange_merge(lanes, n_pos_lanes, padm, n_dev, n_samples, capacity,
                    n_gid=0, axes=AXIS, hier_shape=None):
    """Steps 1-5 of the sample-sort pipeline over a prepared key-lane tuple.

    ``lanes`` = (key lanes ..., position lanes) with pads already folded to
    all-ones in every non-position lane; ``padm`` marks local pad rows, which
    must sort to the local tail under these lanes (the fold guarantees it).

    ``axes``/``hier_shape``: collective axis spec (distributed.mesh_axes).
    On a 2-D ``(node, local)`` mesh ``hier_shape`` = (n_nodes, n_local) and
    step 4's one-hop all_to_all becomes the TWO-STAGE hierarchical exchange
    (parallel/hier.py's design): stage A moves ONE node-aggregated
    (n_local, C) block per destination node over the ``node`` axis (the DCN
    on a real pod), stage B fans blocks out to their final shard over the
    ``local`` axis (pure ICI). Splitters, destinations, and the merge are
    identical, so output bytes match the flat exchange exactly.
    """
    m = lanes[0].shape[0]
    ones = jnp.uint32(_ONES)

    # 1. local sort
    lanes = jax.lax.sort(lanes, num_keys=len(lanes))

    # 2. regular-stride samples -> all_gather -> splitters
    stride = max(m // n_samples, 1)
    samp_idx = (jnp.arange(n_samples, dtype=jnp.int32) * stride + stride // 2) % m
    local_samples = tuple(jnp.take(w, samp_idx) for w in lanes)
    gathered = tuple(
        jax.lax.all_gather(w, axes).reshape(-1) for w in local_samples
    )  # (n_dev * n_samples,)
    gsorted = jax.lax.sort(gathered, num_keys=len(gathered))
    split_idx = (jnp.arange(n_dev - 1, dtype=jnp.int32) + 1) * n_samples
    splitters = tuple(jnp.take(w, split_idx, mode="clip") for w in gsorted)

    # 3. destination shard per row (non-decreasing since rows are sorted)
    dest = _searchsorted_rows(splitters, lanes, n_dev - 1)

    # bucket run boundaries: start[b] = first row with dest >= b. Original
    # pad rows (all-ones lanes) sort to the local tail — clamp runs to the
    # real-row count so they are never exchanged.
    n_real = (m - jnp.sum(padm.astype(jnp.int32))).astype(jnp.int32)
    b_range = jnp.arange(n_dev, dtype=jnp.int32)
    starts = jnp.minimum(jnp.searchsorted(dest, b_range, side="left").astype(jnp.int32), n_real)
    ends = jnp.minimum(jnp.searchsorted(dest, b_range, side="right").astype(jnp.int32), n_real)
    counts = ends - starts
    overflow = jnp.max(counts) > capacity

    # 4. pack (n_dev, capacity) send buffers and exchange
    slot = jax.lax.broadcasted_iota(jnp.int32, (n_dev, capacity), 1)
    row = starts[:, None] + slot
    valid = slot < counts[:, None]
    row = jnp.where(valid, row, 0)

    def pack(w, fill):
        out = jnp.take(w, row.reshape(-1), mode="clip").reshape(n_dev, capacity)
        return jnp.where(valid, out, fill)

    send = [pack(w, jnp.uint32(_ONES)) for w in lanes]
    send_valid = valid.astype(jnp.uint32)

    if hier_shape is None:
        recv = [
            jax.lax.all_to_all(w, axes, split_axis=0, concat_axis=0, tiled=False)
            for w in send + [send_valid]
        ]
        recv, recv_valid = recv[:-1], recv[-1]
        flat = [w.reshape(-1) for w in recv]
        flat_valid = recv_valid.reshape(-1)
    else:
        # two-stage exchange: node-aggregated blocks over axes[0], then
        # intra-node fan-out over axes[1] (same bytes, topology-aware hops)
        n_nodes, n_local = hier_shape
        recv = []
        for w in send + [send_valid]:
            w3 = w.reshape(n_nodes, n_local, capacity)
            ra = jax.lax.all_to_all(w3, axes[0], split_axis=0, concat_axis=0)
            sb = jnp.swapaxes(ra, 0, 1)  # (n_local, n_nodes, C): dim 0 = local dest
            rb = jax.lax.all_to_all(sb, axes[1], split_axis=0, concat_axis=0)
            recv.append(rb.reshape(-1))
        flat, flat_valid = recv[:-1], recv[-1]

    # 5. local merge: is_pad leads so valid rows come first, in global order
    # (positions stay keys — see the local-sort note above)
    out_pad = (flat_valid == 0).astype(jnp.uint32)
    merged = jax.lax.sort((out_pad,) + tuple(flat), num_keys=len(flat) + 1)
    out_is_pad = merged[0]
    out_pos = tuple(merged[len(merged) - n_pos_lanes:])
    ov = jax.lax.psum(overflow.astype(jnp.uint32), axes)
    if n_gid:
        # refinement callers need the old run ids aligned to the new order
        return out_pos, out_is_pad, tuple(merged[1 : 1 + n_gid]), ov
    # sorted word (+cap) lanes ride along so downstream statistics can skip
    # the per-shard key re-gather (same trick as the single-chip
    # ops/sort.boundaries_from_sorted_lanes path)
    out_lanes = tuple(merged[1 : len(merged) - n_pos_lanes])
    return out_pos, out_is_pad, out_lanes, ov


@partial(jax.jit, static_argnames=("n_words", "two_bit", "n_samples", "capacity",
                                   "uniform_cap", "strided", "mesh", "canonical_k"))
def _sample_sort_jit(genome, pos_lanes, cap_len, is_pad, n_words, two_bit,
                     n_samples, capacity, uniform_cap, strided, mesh,
                     canonical_k=None):
    n_dev = mesh_size(mesh)
    sp = mesh_pspec(mesh)
    fn = shard_map(
        partial(
            _sample_sort_local,
            n_words=n_words,
            n_dev=n_dev,
            two_bit=two_bit,
            n_samples=n_samples,
            capacity=capacity,
            uniform_cap=uniform_cap,
            strided=strided,
            canonical_k=canonical_k,
            axes=mesh_axes(mesh),
            hier_shape=_hier_shape(mesh),
        ),
        mesh=mesh,
        # sharded/P() specs are pytree prefixes: one covers every position lane
        in_specs=(P(), sp, sp, sp),
        out_specs=(sp, sp, sp, P()),
    )
    return fn(genome, pos_lanes, cap_len, is_pad)


@partial(jax.jit, static_argnames=("n_words", "two_bit", "n_samples", "capacity",
                                   "mesh"))
def _sample_sort_gid_jit(genome, positions, cap_len, is_pad, gid, n_words, two_bit,
                         n_samples, capacity, offset, mesh):
    # ``offset`` is TRACED (pass jnp.uint32): every refinement round then
    # shares one compiled executable — offsets 0, 32, 64, ... as static
    # values would each pay a full remote-TPU compile (minutes apiece)
    n_dev = mesh_size(mesh)
    sp = mesh_pspec(mesh)

    def body(genome, positions, cap_len, is_pad, gid):
        pos, pad, g, ov = _sample_sort_local(
            genome, (positions,), cap_len, is_pad, n_words=n_words, n_dev=n_dev,
            two_bit=two_bit, n_samples=n_samples, capacity=capacity,
            uniform_cap=False, gid=gid, offset=offset,
            axes=mesh_axes(mesh), hier_shape=_hier_shape(mesh),
        )
        return pos[0], pad, g[0], ov

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), sp, sp, sp, sp),
        out_specs=(sp, sp, sp, P()),
    )
    return fn(genome, positions, cap_len, is_pad, gid)


@partial(jax.jit, static_argnames=("n_words", "two_bit", "n_samples",
                                   "capacity", "window_bases", "max_cap",
                                   "mesh"))
def _refine_round_jit(genome, positions, cap_len, is_pad, gid, seg_starts,
                      seg_ends, n_words, two_bit, n_samples, capacity, offset,
                      window_bases, max_cap, mesh):
    """One unbounded refinement round as a single program: gid-keyed
    sample-sort exchange + global run structure over the new layout.
    Returns (pos, pad, new_gid, flags) with flags = [overflow, unresolved]
    stacked so the host learns both outcomes in ONE scalar transfer. On
    overflow the run-structure half is wasted work, but overflow is the
    rare retry path and the fused common case saves a full host sync per
    round."""
    pos, pad, g, overflow = _sample_sort_gid_jit(
        genome, positions, cap_len, is_pad, gid, n_words, two_bit,
        n_samples, capacity, offset, mesh,
    )
    new_gid, unresolved = _run_structure_jit(
        genome, pos, pad, g, seg_starts, seg_ends,
        n_words, two_bit, offset, window_bases, False, max_cap, mesh,
    )
    flags = jnp.stack(
        [jnp.asarray(overflow, jnp.uint32), jnp.asarray(unresolved, jnp.uint32)]
    )
    return pos, pad, new_gid, flags


def _halo_adjacent_eq(lanes, valid, axes):
    """Adjacent equality over sharded lane tuples with the cross-shard HALO:
    row 0 compares against the last VALID row of the nearest previous
    non-empty shard (empty shards skipped via a replicated prefix max).
    Shared by both refinement run structures (uint32 and 64-bit pair);
    returns ``(eq, pred_of_mine, last_i)`` so callers can stitch further
    per-row flags with ``_halo_prev_flag``."""
    n_dev = jax.lax.axis_size(axes)
    my = jax.lax.axis_index(axes)
    n_local = lanes[0].shape[0]
    eq = jnp.ones(n_local, dtype=bool)
    for w in lanes:
        prev = jnp.concatenate([w[:1], w[:-1]])
        eq = eq & (w == prev)

    n_valid = jnp.sum(valid.astype(jnp.uint32))
    all_n_valid = jax.lax.all_gather(n_valid, axes)
    has_data = all_n_valid > 0
    last_i = (jnp.maximum(n_valid, jnp.uint32(1)) - jnp.uint32(1)).astype(jnp.int32)
    my_last = jnp.stack([jnp.take(w, last_i) for w in lanes])
    all_last = jax.lax.all_gather(my_last, axes)
    cand = jnp.where(has_data, jnp.arange(n_dev), -1)
    pred_idx = jax.lax.associative_scan(jnp.maximum, cand)
    pred_of_mine = jnp.where(my > 0, jnp.take(pred_idx, jnp.maximum(my - 1, 0)), -1)
    pred_lanes = jnp.take(all_last, jnp.maximum(pred_of_mine, 0), axis=0)
    eq0 = jnp.ones((), dtype=bool)
    for li, w in enumerate(lanes):
        eq0 = eq0 & (w[0] == pred_lanes[li])
    eq0 = jnp.where(pred_of_mine < 0, False, eq0)
    return eq.at[0].set(eq0), pred_of_mine, last_i


def _halo_prev_flag(flag, pred_of_mine, last_i, axes):
    """Previous-row value of a per-row flag under the same halo stitch: row
    0 reads the predecessor shard's last-valid-row flag (False if none)."""
    prev = jnp.concatenate([flag[:1], flag[:-1]])
    all_last = jax.lax.all_gather(jnp.take(flag, last_i), axes)
    pred = jnp.where(
        pred_of_mine < 0, False, jnp.take(all_last, jnp.maximum(pred_of_mine, 0))
    )
    return prev.at[0].set(pred)


def _run_structure_local(genome, positions, is_pad, gid, n_words, two_bit, offset,
                         window_bases, first, seg_starts, seg_ends, max_cap,
                         axes=AXIS):
    """Global run structure after a refinement round: new run ids (global
    cumsum of boundaries in valid-row coordinates, stitched across shards via
    the nearest-previous-non-empty-shard halo) and whether any tied pair can
    still be extended past this window."""
    from ..ops.keys import cap_lengths, compute_valid_len

    n_dev = jax.lax.axis_size(axes)
    my = jax.lax.axis_index(axes)
    valid = is_pad == jnp.uint32(0)

    cap = cap_lengths(compute_valid_len(positions, seg_starts, seg_ends), max_cap)
    cap = jnp.where(valid, cap, jnp.uint32(0))
    words = _words_at(genome, (positions,), cap, n_words, two_bit, offset)
    # "tied so far" compares termination status only WITHIN the window:
    # both-extendable rows must stay in one run even though their full caps
    # differ, so the 2-bit cap lane is clamped to the window end
    cap_eq = jnp.minimum(cap, jnp.uint32(offset + window_bases))
    lanes = words + ((cap_eq,) if two_bit else ())
    if not first:
        lanes = (gid,) + lanes

    eq, pred_of_mine, last_i = _halo_adjacent_eq(lanes, valid, axes)
    boundary = (~eq) & valid
    # unresolved iff a tied pair has a member extending past this window
    beyond = cap > jnp.uint32(offset + window_bases)
    prev_beyond = _halo_prev_flag(beyond, pred_of_mine, last_i, axes)
    unresolved = eq & valid & (beyond | prev_beyond)
    any_unresolved = jax.lax.psum(jnp.sum(unresolved.astype(jnp.uint32)), axes)

    # global run ids: cumsum of boundary with cross-shard offset
    local_b = jnp.cumsum(boundary.astype(jnp.uint32))
    my_count = local_b[-1]
    all_counts = jax.lax.all_gather(my_count, axes)
    before = jnp.sum(jnp.where(jnp.arange(n_dev) < my, all_counts, 0)).astype(jnp.uint32)
    new_gid = jnp.where(valid, before + local_b - jnp.uint32(1), jnp.uint32(0xFFFFFFFF))
    return new_gid, any_unresolved


@partial(jax.jit, static_argnames=("n_words", "two_bit", "window_bases",
                                   "first", "max_cap", "mesh"))
def _run_structure_jit(genome, positions, is_pad, gid, seg_starts, seg_ends,
                       n_words, two_bit, offset, window_bases, first, max_cap, mesh):
    # ``offset`` is TRACED (pass jnp.uint32) so every window round shares
    # one executable; it rides into the shard_map body as a replicated
    # closure capture exactly like seg_starts/seg_ends
    sp = mesh_pspec(mesh)
    fn = shard_map(
        partial(
            _run_structure_local,
            n_words=n_words,
            two_bit=two_bit,
            offset=offset,
            window_bases=window_bases,
            first=first,
            seg_starts=seg_starts,
            seg_ends=seg_ends,
            max_cap=max_cap,
            axes=mesh_axes(mesh),
        ),
        mesh=mesh,
        in_specs=(P(), sp, sp, sp),
        out_specs=(sp, P()),
    )
    return fn(genome, positions, is_pad, gid)


def sample_sort_positions_unbounded(
    packed: jax.Array,
    positions: jax.Array,
    seg_starts: jax.Array,
    seg_ends: jax.Array,
    mesh: Mesh,
    packed2: jax.Array | None = None,
    n_samples: int = 256,
    capacity_factor: float = 1.5,
    max_kmer_len: int | None = None,
    return_ragged: bool = False,
):
    """Distributed iterative-refinement sort — the mesh analog of the
    single-chip refinement (ops/sort.py): sample-sort by a 32-base window,
    then re-sort runs that are still tied AND extendable, keyed by (global
    run id, next window, cap, position), until no such run remains. Handles
    ``max_kmer_len=None`` (suffix mode: compare to each segment's end) and
    any bounded k beyond the one-window limits. Returns the sorted
    positions, pads removed — or, with ``return_ragged=True``, the
    device-resident ragged layout ``(rag_pos, rag_pad, gid)`` where ``gid``
    is each row's CONVERGED global run id: rows share a gid iff their
    k-mers are equal under the sort's full (max_kmer_len / suffix)
    comparison — the group identity the distributed statistics need at
    ``kmer_len=None`` (pad rows carry gid 0xFFFFFFFF)."""
    two_bit = packed2 is not None
    genome = packed2 if two_bit else packed
    window_bases = 32
    n_words = window_bases // (16 if two_bit else 8)
    n = positions.shape[0]

    # round 0: plain distributed sample sort capped at the first window
    rag_pos, rag_pad = sample_sort_positions_ragged(
        packed, positions, seg_starts, seg_ends, window_bases, mesh,
        packed2=packed2, n_samples=n_samples, capacity_factor=capacity_factor,
    )

    seg_starts = put_global(seg_starts, NamedSharding(mesh, P()))
    seg_ends = put_global(seg_ends, NamedSharding(mesh, P()))
    genome_g = put_global(genome, NamedSharding(mesh, P()))
    max_cap = 0xFFFFFFF0 if max_kmer_len is None else int(max_kmer_len)

    offset = 0
    gid, unresolved = _run_structure_jit(
        genome_g, rag_pos, rag_pad, rag_pad, seg_starts, seg_ends,
        n_words, two_bit, jnp.uint32(offset), window_bases, True, max_cap, mesh,
    )
    n_dev = mesh_size(mesh)
    m = rag_pos.shape[0] // n_dev
    while int(unresolved) > 0:
        offset += window_bases
        from ..ops.keys import cap_lengths, compute_valid_len

        cap = cap_lengths(compute_valid_len(rag_pos, seg_starts, seg_ends),
                          max_cap)
        factor = capacity_factor
        while True:
            capacity = min(m, int(np.ceil(m / n_dev * factor)) + n_dev)
            # exchange + run-structure fused: ONE dispatch and ONE scalar
            # transfer per round (the split form paid a host sync on the
            # overflow check and another on the unresolved check)
            out_pos, out_pad, out_gid, flags = _refine_round_jit(
                genome_g, rag_pos, cap, rag_pad, gid, seg_starts, seg_ends,
                n_words, two_bit, min(n_samples, m), capacity,
                jnp.uint32(offset), window_bases, max_cap, mesh,
            )
            flags = np.asarray(flags)
            if int(flags[0]) == 0:
                break
            if capacity >= m:
                raise AssertionError("unbounded sample sort overflow at full capacity")
            factor *= 2.0
        rag_pos, rag_pad, gid = out_pos, out_pad, out_gid
        m = rag_pos.shape[0] // n_dev
        unresolved = int(flags[1])

    if return_ragged:
        return rag_pos, rag_pad, gid
    pos_np = np.asarray(rag_pos)
    pad_np = np.asarray(rag_pad)
    out = pos_np[pad_np == 0]
    assert out.shape[0] == n
    return jnp.asarray(out)


def distributed_adjacent_gids(
    packed: jax.Array,
    rag_pos: jax.Array,
    rag_pad: jax.Array,
    seg_starts: jax.Array,
    seg_ends: jax.Array,
    kmer_len: int | None,
    mesh: Mesh,
    packed2: jax.Array | None = None,
) -> jax.Array:
    """Global group ids at ``kmer_len``-base identity (None = compare to
    each segment's end) over an ALREADY globally sorted ragged layout — the
    mesh analog of ops/sort.adjacent_boundaries' beyond-window loop: 32-base
    windows refine the run structure (no re-sorting; the layout's order is a
    refinement of every window prefix) until no tied pair can extend.
    Returns sharded uint32 run ids; rows share an id iff their k-mers are
    equal under the reference comparator at max_kmer_len=kmer_len
    (reference kmers.py:306-397). Pad rows carry 0xFFFFFFFF."""
    two_bit = packed2 is not None
    genome = packed2 if two_bit else packed
    window_bases = 32
    n_words = window_bases // (16 if two_bit else 8)
    seg_starts = put_global(seg_starts, NamedSharding(mesh, P()))
    seg_ends = put_global(seg_ends, NamedSharding(mesh, P()))
    genome_g = put_global(genome, NamedSharding(mesh, P()))
    max_cap = 0xFFFFFFF0 if kmer_len is None else int(kmer_len)

    offset = 0
    gid, unresolved = _run_structure_jit(
        genome_g, rag_pos, rag_pad, rag_pad, seg_starts, seg_ends,
        n_words, two_bit, jnp.uint32(offset), window_bases, True, max_cap, mesh,
    )
    while int(unresolved) > 0:
        offset += window_bases
        gid, unresolved = _run_structure_jit(
            genome_g, rag_pos, rag_pad, gid, seg_starts, seg_ends,
            n_words, two_bit, jnp.uint32(offset), window_bases, False, max_cap, mesh,
        )
    return gid


def sample_sort_positions(
    packed: jax.Array,
    positions: jax.Array,
    seg_starts: jax.Array,
    seg_ends: jax.Array,
    max_kmer_len: int,
    mesh: Mesh,
    packed2: jax.Array | None = None,
    n_samples: int = 256,
    capacity_factor: float = 1.5,
    uniform_cap: bool = False,
) -> jax.Array:
    """Globally sort k-mer start positions via splitter-based sample sort.

    Returns the sorted uint32 positions (compacted on host — the device-side
    result is ragged-per-shard; use ``sample_sort_positions_ragged`` to keep
    it on device for distributed statistics). Falls back to a larger exchange
    capacity automatically if the splitter sample under-estimated a bucket.
    ``uniform_cap=True`` asserts every position has >= max_kmer_len valid
    bases (min_kmer_len == max_kmer_len), dropping the cap key lane.
    """
    limit = 64 if packed2 is not None else 32
    if max_kmer_len is None or max_kmer_len > limit:
        # suffix mode / long k: iterative refinement rounds over the mesh
        return sample_sort_positions_unbounded(
            packed, positions, seg_starts, seg_ends, mesh, packed2=packed2,
            n_samples=n_samples, capacity_factor=capacity_factor,
            max_kmer_len=max_kmer_len,
        )
    out_pos, out_is_pad = sample_sort_positions_ragged(
        packed, positions, seg_starts, seg_ends, max_kmer_len, mesh,
        packed2=packed2, n_samples=n_samples, capacity_factor=capacity_factor,
        uniform_cap=uniform_cap,
    )
    pos_np = np.asarray(out_pos)
    pad_np = np.asarray(out_is_pad)
    return jnp.asarray(pos_np[pad_np == 0])


def sample_sort_positions_ragged(
    packed,
    positions,
    seg_starts,
    seg_ends,
    max_kmer_len,
    mesh,
    packed2=None,
    n_samples: int = 256,
    capacity_factor: float = 1.5,
    uniform_cap: bool = False,
    return_lanes: bool = False,
):
    """Device-resident variant: returns (positions, is_pad) of length
    n_dev * capacity, globally sorted with per-shard trailing pads.

    ``return_lanes`` additionally returns the sorted word lanes (sharded
    like the positions; pads folded to all-ones) so distributed statistics
    can skip the per-shard key re-gather — the mesh analog of the
    single-chip retained-lane path."""
    limit = 64 if packed2 is not None else 32
    if max_kmer_len is None or max_kmer_len > limit:
        raise NotImplementedError(
            f"sample sort requires max_kmer_len <= {limit} bases"
        )
    cap_len = cap_lengths(
        compute_valid_len(positions, seg_starts, seg_ends), max_kmer_len
    )
    two_bit = packed2 is not None
    genome = packed2 if two_bit else packed
    n = positions.shape[0]
    n_dev = mesh_size(mesh)
    n_words = _cdiv(max_kmer_len, 16 if two_bit else 8)

    positions_p = _pad_to_multiple(positions, n_dev, _PAD_POS)
    cap_p = _pad_to_multiple(cap_len, n_dev, jnp.uint32(0))
    is_pad = _pad_to_multiple(jnp.zeros(n, dtype=jnp.uint32), n_dev, jnp.uint32(1))
    m = positions_p.shape[0] // n_dev
    n_samples = min(n_samples, m)

    sharding = NamedSharding(mesh, mesh_pspec(mesh))
    positions_p = put_global(positions_p, sharding)
    cap_p = put_global(cap_p, sharding)
    is_pad = put_global(is_pad, sharding)
    genome = put_global(genome, NamedSharding(mesh, P()))

    factor = capacity_factor
    while True:
        capacity = min(m, int(np.ceil(m / n_dev * factor)) + n_dev)
        out_pos, out_is_pad, out_lanes, overflow = _sample_sort_jit(
            genome, (positions_p,), cap_p, is_pad, n_words, two_bit, n_samples,
            capacity, uniform_cap, False, mesh,
        )
        if int(overflow) == 0:
            if return_lanes:
                # word lanes only (a trailing cap lane, present when
                # uniform_cap is False, is recomputed by consumers)
                return out_pos[0], out_is_pad, out_lanes[:n_words]
            return out_pos[0], out_is_pad
        if capacity >= m:
            raise AssertionError("sample sort overflow at full capacity (bug)")
        factor *= 2.0


# --------------------------------------------------------------------------- #
# dense fresh path: gather-free key build over ALL SBA positions, sharded.
# The mesh analog of ops/sort.sort_positions_dense — valid only while the
# index is the canonical dense start set (every position with
# valid_len >= min_kmer_len), i.e. a FRESH Kmers sort.
# --------------------------------------------------------------------------- #


def _sample_sort_dense_local(key_lanes, positions, is_pad, n_dev, n_samples,
                             capacity, axes=AXIS, hier_shape=None):
    """Per-shard pipeline body for prebuilt dense lanes: invalid rows are
    already folded to lane values that sort strictly last (see
    ``_dense_key_lanes``), so no further folding is needed — positions stay
    real values (ascending iota) and ride as the final tie-break key."""
    padm = is_pad != jnp.uint32(0)
    lanes = key_lanes + (positions,)
    return _exchange_merge(lanes, 1, padm, n_dev, n_samples, capacity,
                           axes=axes, hier_shape=hier_shape)


def _dense_key_lanes(packed, seg_starts, seg_ends, min_len, n_words, k,
                     two_bit, uniform_cap, mesh):
    """Sharded gather-free key lanes for every position 0..L-1.

    Key words are shifted SLICES of the replicated packed array
    (ops/keys.build_key*_words_dense) and valid_len is a scatter + cummax
    (ops/keys.valid_len_all) — all elementwise/scan ops that XLA partitions
    over the mesh with no per-row gathers (each device slices its window of
    the replicated pack locally). Invalid rows (separators, tails shorter
    than min_len, padding) fold exactly as in ops/sort._sort_dense: all-ones
    words (+ ones cap when the cap lane is kept; a leading invalid lane on
    the 4-bit path, where a real word CAN be all-ones).

    Returns (key_lanes, iota, is_pad), every array sharded P(AXIS).
    """
    from ..ops.keys import (
        build_key2_words_dense,
        build_key_words_dense,
        valid_len_all,
    )

    L = packed.shape[0]
    shd = NamedSharding(mesh, mesh_pspec(mesh))
    csc = jax.lax.with_sharding_constraint
    iota = csc(jax.lax.iota(jnp.uint32, L), shd)
    vl = csc(valid_len_all(seg_starts, seg_ends, iota), shd)
    cap = jnp.minimum(vl, jnp.uint32(k))
    invalid = cap < jnp.uint32(min_len)
    ones = jnp.uint32(_ONES)
    if two_bit:
        words = build_key2_words_dense(packed, cap, n_words)
        words = tuple(csc(jnp.where(invalid, ones, w), shd) for w in words)
        if uniform_cap and k % 16 != 0:
            # a real word never equals all-ones here: the last word keeps
            # < 16 bases, so its low bits are zero (ops/sort._sort_dense)
            key_lanes = words
        else:
            key_lanes = words + (csc(jnp.where(invalid, ones, cap), shd),)
    else:
        words = build_key_words_dense(packed, cap, n_words)
        lead = invalid.astype(jnp.uint32)
        key_lanes = (csc(lead, shd),) + tuple(csc(w, shd) for w in words)
    is_pad = csc(invalid.astype(jnp.uint32), shd)
    return key_lanes, iota, is_pad


@partial(jax.jit, static_argnames=("min_len", "n_words", "k", "two_bit",
                                   "uniform_cap", "n_samples", "capacity",
                                   "mesh"))
def _sample_sort_dense_jit(packed, seg_starts, seg_ends, min_len, n_words, k,
                           two_bit, uniform_cap, n_samples, capacity, mesh):
    key_lanes, iota, is_pad = _dense_key_lanes(
        packed, seg_starts, seg_ends, min_len, n_words, k, two_bit,
        uniform_cap, mesh,
    )
    n_dev = mesh_size(mesh)
    sp = mesh_pspec(mesh)
    fn = shard_map(
        partial(
            _sample_sort_dense_local,
            n_dev=n_dev,
            n_samples=n_samples,
            capacity=capacity,
            axes=mesh_axes(mesh),
            hier_shape=_hier_shape(mesh),
        ),
        mesh=mesh,
        in_specs=(sp, sp, sp),
        out_specs=(sp, sp, sp, P()),
    )
    return fn(key_lanes, iota, is_pad)


def sample_sort_positions_dense_ragged(
    packed,
    seg_starts,
    seg_ends,
    n: int,
    min_kmer_len: int,
    max_kmer_len: int,
    mesh,
    two_bit: bool = False,
    uniform_cap: bool = False,
    return_lanes: bool = False,
    n_samples: int = 256,
    capacity_factor: float = 1.5,
):
    """Distributed FRESH sort of the canonical k-mer start set — the mesh
    analog of ``ops.sort.sort_positions_dense``: no position array is ever
    materialized and no per-row key gathers run (the gathers are ~80% of the
    gather-path fresh build). Output layout matches
    ``sample_sort_positions_ragged`` over the canonical start set exactly
    (same keys, same position tie-break): per-shard real-row prefixes with
    trailing pads, ``n`` real rows total.

    ``packed`` is the per-position 2-bit pack when ``two_bit`` else the 4-bit
    pack; positions are ALL rows 0..L-1 with invalid rows (separators, tails
    shorter than ``min_kmer_len``, padding) marked as pads and sorted last.
    """
    limit = 64 if two_bit else 32
    if max_kmer_len is None or max_kmer_len > limit:
        raise NotImplementedError(
            f"dense sample sort requires max_kmer_len <= {limit} bases"
        )
    n_dev = mesh_size(mesh)
    n_words = _cdiv(max_kmer_len, 16 if two_bit else 8)
    # pad the pack to a shardable length; padding packs as rank 0 => vl 0
    packed_p = _pad_to_multiple(packed, n_dev, jnp.uint32(0))
    m = packed_p.shape[0] // n_dev
    n_samples = min(n_samples, m)

    genome = put_global(packed_p, NamedSharding(mesh, P()))
    seg_starts = put_global(jnp.asarray(seg_starts), NamedSharding(mesh, P()))
    seg_ends = put_global(jnp.asarray(seg_ends), NamedSharding(mesh, P()))

    factor = capacity_factor
    while True:
        capacity = min(m, int(np.ceil(m / n_dev * factor)) + n_dev)
        out_pos, out_is_pad, out_lanes, overflow = _sample_sort_dense_jit(
            genome, seg_starts, seg_ends, int(min_kmer_len), n_words,
            int(max_kmer_len), two_bit, uniform_cap, n_samples, capacity, mesh,
        )
        if int(overflow) == 0:
            if return_lanes:
                # word lanes only: skip the 4-bit leading invalid lane; a
                # trailing cap lane (2-bit, non-uniform) is recomputed by
                # consumers, matching sample_sort_positions_ragged's contract
                words = out_lanes if two_bit else out_lanes[1:]
                return out_pos[0], out_is_pad, words[:n_words]
            return out_pos[0], out_is_pad
        if capacity >= m:
            raise AssertionError("dense sample sort overflow at full capacity (bug)")
        factor *= 2.0


def _canonical_dense_lanes(packed_e, seg_starts, seg_ends, min_len, k, n_words,
                           mesh, two_bit=True):
    """Sharded gather-free CANONICAL key lanes for every position 0..L-1.

    Forward words are shifted slices of the replicated pack
    (ops/keys.build_key*_words_dense); the reverse complement is pure
    bit-arithmetic on those words (ops/canonical.revcomp_key_words /
    revcomp_key_words4 for IUPAC), so the canonical fold min(fwd, rc) never
    touches the genome either. Rows that are not FULL-LENGTH k-mer starts
    (vl < max(k, min_kmer_len): separators, short tails, padding —
    truncated k-mers have no canonical form) carry a leading invalid lane
    and are flagged as pads.
    """
    from ..ops.canonical import revcomp_words_any
    from ..ops.keys import (
        build_key2_words_dense,
        build_key_words_dense,
        valid_len_all,
    )

    L = packed_e.shape[0]
    shd = NamedSharding(mesh, mesh_pspec(mesh))
    csc = jax.lax.with_sharding_constraint
    iota = csc(jax.lax.iota(jnp.uint32, L), shd)
    vl = csc(valid_len_all(seg_starts, seg_ends, iota), shd)
    valid = vl >= jnp.maximum(jnp.uint32(k), jnp.uint32(min_len))
    cap = jnp.where(valid, jnp.uint32(k), jnp.uint32(0))
    build = build_key2_words_dense if two_bit else build_key_words_dense
    fwd = build(packed_e, cap, n_words)
    rc = revcomp_words_any(fwd, k, two_bit)
    lt = jnp.zeros(iota.shape, dtype=bool)
    eq = jnp.ones(iota.shape, dtype=bool)
    for a, b in zip(rc, fwd):
        lt = lt | (eq & (a < b))
        eq = eq & (a == b)
    words = tuple(jnp.where(lt, a, b) for a, b in zip(rc, fwd))
    lead = (~valid).astype(jnp.uint32)
    key_lanes = (csc(lead, shd),) + tuple(csc(w, shd) for w in words)
    is_pad = csc(lead, shd)
    return key_lanes, iota, is_pad


@partial(jax.jit, static_argnames=("min_len", "n_words", "k", "n_samples",
                                   "capacity", "mesh", "two_bit"))
def _canonical_sample_sort_jit(packed_e, seg_starts, seg_ends, min_len, n_words,
                               k, n_samples, capacity, mesh, two_bit=True):
    key_lanes, iota, is_pad = _canonical_dense_lanes(
        packed_e, seg_starts, seg_ends, min_len, k, n_words, mesh,
        two_bit=two_bit,
    )
    n_dev = mesh_size(mesh)
    sp = mesh_pspec(mesh)
    fn = shard_map(
        partial(
            _sample_sort_dense_local,
            n_dev=n_dev,
            n_samples=n_samples,
            capacity=capacity,
            axes=mesh_axes(mesh),
            hier_shape=_hier_shape(mesh),
        ),
        mesh=mesh,
        in_specs=(sp, sp, sp),
        out_specs=(sp, sp, sp, P()),
    )
    return fn(key_lanes, iota, is_pad)


def sample_sort_canonical_dense_ragged(
    packed_e,
    seg_starts,
    seg_ends,
    min_kmer_len: int,
    k: int,
    mesh,
    n_samples: int = 256,
    capacity_factor: float = 1.5,
    two_bit: bool = True,
):
    """Distributed sort of the dense start set by CANONICAL key — the mesh
    analog of the single-chip canonical kernels (ops/canonical.py; an
    EXTENSION, the reference declares both-strand handling but raises —
    reference kmers.py:689-696). Gather-free throughout: dense slice key
    build + bit-arithmetic revcomp + splitter sample sort. ``two_bit=False``
    takes the 4-bit IUPAC lanes (per-nibble rank complement — round 5:
    canonical stats no longer require an ACGT-only genome).

    Returns (positions, is_pad, sorted canonical word lanes), each sharded
    ragged (per-shard real-row prefixes); pads mark every row that is not a
    full-length k-mer start. The lanes feed
    ``distributed_group_size_histogram_ragged(sorted_words=...)`` so the
    histogram needs no key re-gather.
    """
    limit = 64 if two_bit else 32
    if k > limit:
        raise NotImplementedError(f"canonical keys require k <= {limit}")
    n_dev = mesh_size(mesh)
    n_words = _cdiv(k, 16 if two_bit else 8)
    packed_p = _pad_to_multiple(packed_e, n_dev, jnp.uint32(0))
    m = packed_p.shape[0] // n_dev
    n_samples = min(n_samples, m)

    genome = put_global(packed_p, NamedSharding(mesh, P()))
    seg_starts = put_global(jnp.asarray(seg_starts), NamedSharding(mesh, P()))
    seg_ends = put_global(jnp.asarray(seg_ends), NamedSharding(mesh, P()))

    factor = capacity_factor
    while True:
        capacity = min(m, int(np.ceil(m / n_dev * factor)) + n_dev)
        out_pos, out_is_pad, out_lanes, overflow = _canonical_sample_sort_jit(
            genome, seg_starts, seg_ends, int(min_kmer_len), n_words, int(k),
            n_samples, capacity, mesh, two_bit=two_bit,
        )
        if int(overflow) == 0:
            # drop the leading invalid lane; pads carry all word content
            return out_pos[0], out_is_pad, out_lanes[1 : 1 + n_words]
        if capacity >= m:
            raise AssertionError("canonical sample sort overflow at full capacity (bug)")
        factor *= 2.0


# --------------------------------------------------------------------------- #
# large regime: > int32-gather genomes, 64-bit coordinates (ops/large.py)
# --------------------------------------------------------------------------- #


def sample_sort_positions_large_ragged(
    packed_strided,
    positions_u64: np.ndarray,
    seg_starts_u64: np.ndarray,
    seg_ends_u64: np.ndarray,
    max_kmer_len: int,
    mesh,
    two_bit: bool = True,
    n_samples: int = 256,
    capacity_factor: float = 1.5,
    uniform_cap: bool = False,
    return_lanes: bool = False,
    canonical_k: int | None = None,
):
    """Distributed sample sort for genomes past the int32 gather limit.

    Same algorithm as ``sample_sort_positions_ragged`` but over the strided
    genome pack (16 bases/uint32-word when ``two_bit`` else 8 — ops/large.py)
    with positions carried as (hi, lo) uint32 lane pairs: the position pair
    rides as the final two sort lanes, so every lexicographic comparison in
    the pipeline (local sort, splitters, destination search, merge) is the
    exact 64-bit comparison. Per-position caps are derived here on the host
    in uint64 (k <= 64 keeps them uint32-sized). The reference hard-fails on
    these inputs (reference kmers.py:805-808).

    Returns ``((pos_hi, pos_lo), is_pad)`` device arrays of length
    n_dev * capacity, globally sorted with per-shard trailing pads; with
    ``return_lanes=True`` also the sorted key lanes (words, + the cap lane
    unless ``uniform_cap``; pad rows folded to all-ones) so downstream
    statistics/filters can skip the per-shard key re-gather.

    ``canonical_k``: sort by min(key, revcomp(key)) — the strand-collapsed
    order; truncated rows (cap < k) become pads since a truncated k-mer has
    no canonical form.

    ``positions_u64`` may also be a DEVICE ``(hi, lo)`` uint32 pair tuple
    (ops/large.build_dense_positions_pairs): caps then derive on device and
    nothing position-sized crosses the host link — the host-array path
    uploads 24 B/row (hi + lo + cap), which dominates wall-clock on remote
    links (~4-9 MB/s tunnel: ~30 s at 2^24 rows).
    """
    limit = 64 if two_bit else 32
    if max_kmer_len is None or max_kmer_len > limit:
        raise NotImplementedError(
            f"large sample sort requires max_kmer_len <= {limit} bases"
        )
    if canonical_k is not None and not uniform_cap:
        raise ValueError("canonical_k requires uniform_cap=True")
    from ..ops.large import split64_np

    n_dev = mesh_size(mesh)
    n_words = _cdiv(max_kmer_len, 16 if two_bit else 8)

    if isinstance(positions_u64, tuple):
        hi_d, lo_d = positions_u64
        n = int(hi_d.shape[0])
        seg_tables = _seg_tables64(seg_starts_u64, seg_ends_u64, mesh)
        cap_d, pad_d = _device_caps_pads_jit(
            hi_d, lo_d, seg_tables, int(max_kmer_len),
            0 if canonical_k is None else int(canonical_k),
        )
        hi_p = _pad_to_multiple(hi_d, n_dev, jnp.uint32(_ONES))
        lo_p = _pad_to_multiple(lo_d, n_dev, jnp.uint32(_ONES))
        cap_p = _pad_to_multiple(cap_d, n_dev, jnp.uint32(0))
        is_pad = _pad_to_multiple(pad_d, n_dev, jnp.uint32(1))
    else:
        pos = np.asarray(positions_u64, dtype=np.uint64)
        starts = np.asarray(seg_starts_u64, dtype=np.uint64)
        ends = np.asarray(seg_ends_u64, dtype=np.uint64)
        seg = np.maximum(
            np.searchsorted(starts, pos, side="right").astype(np.int64) - 1, 0
        )
        valid = ends[seg] - pos + np.uint64(1)
        cap_np = np.minimum(valid, np.uint64(max_kmer_len)).astype(np.uint32)

        pad_mask_np = np.zeros(pos.shape[0], dtype=np.uint32)
        if canonical_k is not None:
            # truncated rows have no canonical form: fold them to pads
            pad_mask_np = (cap_np < np.uint32(canonical_k)).astype(np.uint32)

        n = pos.shape[0]
        hi_np, lo_np = split64_np(pos)
        hi_p = _pad_to_multiple(jnp.asarray(hi_np), n_dev, jnp.uint32(_ONES))
        lo_p = _pad_to_multiple(jnp.asarray(lo_np), n_dev, jnp.uint32(_ONES))
        cap_p = _pad_to_multiple(jnp.asarray(cap_np), n_dev, jnp.uint32(0))
        is_pad = _pad_to_multiple(jnp.asarray(pad_mask_np), n_dev, jnp.uint32(1))
    m = hi_p.shape[0] // n_dev
    n_samples = min(n_samples, m)

    sharding = NamedSharding(mesh, mesh_pspec(mesh))
    hi_p = put_global(hi_p, sharding)
    lo_p = put_global(lo_p, sharding)
    cap_p = put_global(cap_p, sharding)
    is_pad = put_global(is_pad, sharding)
    genome = put_global(packed_strided, NamedSharding(mesh, P()))

    factor = capacity_factor
    while True:
        capacity = min(m, int(np.ceil(m / n_dev * factor)) + n_dev)
        out_pos, out_is_pad, lanes, overflow = _sample_sort_jit(
            genome, (hi_p, lo_p), cap_p, is_pad, n_words, two_bit, n_samples,
            capacity, uniform_cap, True, mesh, canonical_k=canonical_k,
        )
        if int(overflow) == 0:
            if return_lanes:
                return out_pos, out_is_pad, lanes
            return out_pos, out_is_pad
        if capacity >= m:
            raise AssertionError("large sample sort overflow at full capacity (bug)")
        factor *= 2.0


# --------------------------------------------------------------------------- #
# large regime, UNBOUNDED: suffix-mode / beyond-one-window refinement with
# 64-bit coordinates AND 64-bit run ids. The uint32 machinery above
# (_run_structure_local / _refine_round_jit) is the template; here positions
# ride as (hi, lo) uint32 pairs and — because a > 2^32-row index can hold
# > 2^32 distinct runs — the refinement run ids are (hi, lo) pairs too.
# The reference supports suffix mode for any index it can hold (reference
# kmers.py:315-316, 391-393) but hard-fails past 2^32 k-mers; this is the
# configuration that genuinely needs BOTH the 64-bit regime and unbounded k
# (both-strand human-genome suffix index, SURVEY.md §7.3-1/6).
# --------------------------------------------------------------------------- #


@partial(jax.jit, static_argnames=("max_k", "canonical_k"))
def _device_caps_pads_jit(pos_hi, pos_lo, seg_tables, max_k, canonical_k):
    """Per-row compare caps + canonical pad mask for DEVICE pair positions
    (no host round trip)."""
    from ..ops.large import compute_valid_len64

    sh, sl, eh, el = seg_tables
    vl = compute_valid_len64(pos_hi, pos_lo, sh, sl, eh, el)
    cap = jnp.minimum(vl, jnp.uint32(max_k))
    if canonical_k:
        pad = (cap < jnp.uint32(canonical_k)).astype(jnp.uint32)
    else:
        pad = jnp.zeros(cap.shape, dtype=jnp.uint32)
    return cap, pad


def _seg_tables64(seg_starts_u64, seg_ends_u64, mesh):
    """Replicated (starts_hi, starts_lo, ends_hi, ends_lo) device tables."""
    from ..ops.large import split64_np

    sh, sl = split64_np(np.asarray(seg_starts_u64, dtype=np.uint64))
    eh, el = split64_np(np.asarray(seg_ends_u64, dtype=np.uint64))
    rep = NamedSharding(mesh, P())
    return tuple(put_global(jnp.asarray(a), rep) for a in (sh, sl, eh, el))


def _caps_large(pos_hi, pos_lo, is_pad, seg_tables, max_cap):
    """Per-row compare caps for large refinement rounds: uint32-saturated
    bases-to-segment-end, clipped to ``max_cap``; pad rows (all-ones
    position pairs would index garbage segments) forced to 0. Saturation at
    ops/keys.NO_CAP is lossless for resolve decisions up to ~4G tied bases —
    two suffixes identical beyond that would stop refining early (documented
    out of scope; no real genome has 4-Gbp exact repeats)."""
    from ..ops.large import compute_valid_len64

    sh, sl, eh, el = seg_tables
    vl = compute_valid_len64(pos_hi, pos_lo, sh, sl, eh, el)
    cap = jnp.minimum(vl, jnp.uint32(max_cap))
    return jnp.where(is_pad == jnp.uint32(0), cap, jnp.uint32(0))


def _run_structure_large_local(genome, pos_hi, pos_lo, is_pad, ghi, glo,
                               seg_tables, n_words, two_bit, offset,
                               window_bases, first, max_cap, axes=AXIS):
    """Global run structure over the large pair-lane layout: pair run ids
    (cross-shard pair cumsum of boundaries) and whether any tied pair can
    still extend past this window — the 64-bit analog of
    ``_run_structure_local`` (halo stitch shared via ``_halo_adjacent_eq``
    / ``_halo_prev_flag``; only the lane build and the run-id arithmetic
    differ)."""
    from ..ops.large import add64_u32, pairsum_small, sub64

    n_dev = jax.lax.axis_size(axes)
    my = jax.lax.axis_index(axes)
    valid = is_pad == jnp.uint32(0)
    ones = jnp.uint32(_ONES)

    cap = _caps_large(pos_hi, pos_lo, is_pad, seg_tables, max_cap)
    words = _words_at(genome, (pos_hi, pos_lo), cap, n_words, two_bit,
                      offset, strided=True)
    # "tied so far" compares termination status only WITHIN the window (see
    # _run_structure_local); the 2-bit cap lane is clamped to the window end
    cap_eq = jnp.minimum(cap, offset + jnp.uint32(window_bases))
    lanes = words + ((cap_eq,) if two_bit else ())
    if not first:
        lanes = (ghi, glo) + lanes

    eq, pred_of_mine, last_i = _halo_adjacent_eq(lanes, valid, axes)
    boundary = (~eq) & valid
    # unresolved iff a tied pair has a member extending past this window
    beyond = cap > offset + jnp.uint32(window_bases)
    prev_beyond = _halo_prev_flag(beyond, pred_of_mine, last_i, axes)
    unresolved = eq & valid & (beyond | prev_beyond)
    any_unresolved = jax.lax.psum(jnp.sum(unresolved.astype(jnp.uint32)), axes)

    # global PAIR run ids: local uint32 cumsum (a shard holds < 2^31 rows)
    # plus an exact pair prefix offset across shards, minus one. The first
    # valid row overall is always a boundary, so (before + local_b) >= 1 on
    # every valid row and the subtraction never borrows into the sign.
    local_b = jnp.cumsum(boundary.astype(jnp.uint32))
    my_count = local_b[-1]
    all_counts = jax.lax.all_gather(my_count, axes)
    mask_before = (jnp.arange(n_dev) < my).astype(jnp.uint32)
    b_hi, b_lo = pairsum_small(all_counts * mask_before)
    g_hi, g_lo = add64_u32(b_hi, b_lo, local_b)
    g_hi, g_lo = sub64(g_hi, g_lo, jnp.uint32(0), jnp.uint32(1))
    new_ghi = jnp.where(valid, g_hi, ones)
    new_glo = jnp.where(valid, g_lo, ones)
    return new_ghi, new_glo, any_unresolved


@partial(jax.jit, static_argnames=("n_words", "two_bit", "window_bases",
                                   "first", "max_cap", "mesh"))
def _run_structure_large_jit(genome, pos_hi, pos_lo, is_pad, ghi, glo,
                             seg_tables, n_words, two_bit, offset,
                             window_bases, first, max_cap, mesh):
    # ``offset`` is TRACED (pass jnp.uint32): every window round shares one
    # executable, exactly like the uint32 _run_structure_jit
    sp = mesh_pspec(mesh)
    fn = shard_map(
        partial(
            _run_structure_large_local,
            n_words=n_words,
            two_bit=two_bit,
            offset=offset,
            window_bases=window_bases,
            first=first,
            max_cap=max_cap,
            axes=mesh_axes(mesh),
        ),
        mesh=mesh,
        in_specs=(P(), sp, sp, sp, sp, sp, (P(),) * 4),
        out_specs=(sp, sp, P()),
    )
    return fn(genome, pos_hi, pos_lo, is_pad, ghi, glo, seg_tables)


@partial(jax.jit, static_argnames=("n_words", "two_bit", "n_samples",
                                   "capacity", "window_bases", "max_cap",
                                   "mesh"))
def _refine_round_large_jit(genome, pos_hi, pos_lo, is_pad, ghi, glo,
                            seg_tables, n_words, two_bit, n_samples, capacity,
                            offset, window_bases, max_cap, mesh):
    """One large unbounded refinement round as a single program: pair-gid-
    keyed sample-sort exchange + pair run structure over the new layout.
    Returns ((hi, lo), pad, (ghi, glo), flags) with
    flags = [overflow, unresolved] — ONE dispatch, ONE scalar transfer per
    round (the 64-bit analog of ``_refine_round_jit``)."""
    cap = _caps_large(pos_hi, pos_lo, is_pad, seg_tables, max_cap)
    n_dev = mesh_size(mesh)
    sp = mesh_pspec(mesh)

    def body(genome, pos_hi, pos_lo, cap, is_pad, ghi, glo):
        pos, pad, g, ov = _sample_sort_local(
            genome, (pos_hi, pos_lo), cap, is_pad, n_words=n_words,
            n_dev=n_dev, two_bit=two_bit, n_samples=n_samples,
            capacity=capacity, uniform_cap=False, gid=(ghi, glo),
            offset=offset, strided=True,
            axes=mesh_axes(mesh), hier_shape=_hier_shape(mesh),
        )
        return pos[0], pos[1], pad, g[0], g[1], ov

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), sp, sp, sp, sp, sp, sp),
        out_specs=(sp, sp, sp, sp, sp, P()),
    )
    n_hi, n_lo, n_pad, o_ghi, o_glo, overflow = fn(
        genome, pos_hi, pos_lo, cap, is_pad, ghi, glo
    )
    new_ghi, new_glo, unresolved = _run_structure_large_jit(
        genome, n_hi, n_lo, n_pad, o_ghi, o_glo, seg_tables,
        n_words, two_bit, offset, window_bases, False, max_cap, mesh,
    )
    flags = jnp.stack(
        [jnp.asarray(overflow, jnp.uint32), jnp.asarray(unresolved, jnp.uint32)]
    )
    return (n_hi, n_lo), n_pad, (new_ghi, new_glo), flags


def sample_sort_positions_large_unbounded(
    packed_strided,
    positions_u64: np.ndarray,
    seg_starts_u64: np.ndarray,
    seg_ends_u64: np.ndarray,
    mesh,
    two_bit: bool = True,
    max_kmer_len: int | None = None,
    n_samples: int = 256,
    capacity_factor: float = 1.5,
):
    """Distributed iterative-refinement sort in the 64-bit regime — suffix
    mode (``max_kmer_len=None``: compare to each segment's end) or any
    bounded k beyond the one-window limits, over a strided pack with (hi, lo)
    position pairs. The uint32 analog is ``sample_sort_positions_unbounded``;
    the reference cannot reach this configuration at all (hard-fails past
    2^32 k-mers, reference kmers.py:805-808, while its suffix semantics are
    kmers.py:315-316).

    Returns ``((pos_hi, pos_lo), is_pad, (gid_hi, gid_lo))`` — the globally
    sorted ragged pair-lane layout plus each row's CONVERGED run id PAIR:
    rows share a (hi, lo) id iff their k-mers are equal under the full
    (max_kmer_len / suffix) comparison — the group identity the large
    distributed statistics need at ``kmer_len=None`` (pad rows carry
    all-ones ids).
    """
    window_bases = 64 if two_bit else 32
    n_words = 4  # 64 bases / 16 per word (2-bit) or 32 / 8 (4-bit)

    # round 0: plain large sample sort capped at the first window
    (hi, lo), is_pad = sample_sort_positions_large_ragged(
        packed_strided, positions_u64, seg_starts_u64, seg_ends_u64,
        window_bases, mesh, two_bit=two_bit, n_samples=n_samples,
        capacity_factor=capacity_factor,
    )

    seg_tables = _seg_tables64(seg_starts_u64, seg_ends_u64, mesh)
    genome_g = put_global(packed_strided, NamedSharding(mesh, P()))
    max_cap = 0xFFFFFFF0 if max_kmer_len is None else int(max_kmer_len)

    offset = 0
    ghi, glo, unresolved = _run_structure_large_jit(
        genome_g, hi, lo, is_pad, is_pad, is_pad, seg_tables,
        n_words, two_bit, jnp.uint32(offset), window_bases, True, max_cap,
        mesh,
    )
    n_dev = mesh_size(mesh)
    m = hi.shape[0] // n_dev
    while int(unresolved) > 0:
        offset += window_bases
        factor = capacity_factor
        while True:
            capacity = min(m, int(np.ceil(m / n_dev * factor)) + n_dev)
            out_pos, out_pad, out_gid, flags = _refine_round_large_jit(
                genome_g, hi, lo, is_pad, ghi, glo, seg_tables,
                n_words, two_bit, min(n_samples, m), capacity,
                jnp.uint32(offset), window_bases, max_cap, mesh,
            )
            flags = np.asarray(flags)
            if int(flags[0]) == 0:
                break
            if capacity >= m:
                raise AssertionError(
                    "large unbounded sample sort overflow at full capacity"
                )
            factor *= 2.0
        (hi, lo), is_pad, (ghi, glo) = out_pos, out_pad, out_gid
        m = hi.shape[0] // n_dev
        unresolved = int(flags[1])

    return (hi, lo), is_pad, (ghi, glo)


def distributed_adjacent_gids_large(
    packed_strided,
    pos_hi: jax.Array,
    pos_lo: jax.Array,
    is_pad: jax.Array,
    seg_starts_u64: np.ndarray,
    seg_ends_u64: np.ndarray,
    kmer_len: int | None,
    mesh,
    two_bit: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Pair run ids at ``kmer_len``-base identity (None = compare to each
    segment's end) over an ALREADY globally sorted large ragged layout — the
    64-bit analog of ``distributed_adjacent_gids``: 64/32-base windows
    refine the run structure (no re-sorting; the layout's order refines
    every window prefix) until no tied pair can extend. Rows share a
    (hi, lo) id iff their k-mers are equal under the reference comparator at
    max_kmer_len=kmer_len (reference kmers.py:306-397); pads carry all-ones.
    """
    window_bases = 64 if two_bit else 32
    n_words = 4
    seg_tables = _seg_tables64(seg_starts_u64, seg_ends_u64, mesh)
    genome_g = put_global(packed_strided, NamedSharding(mesh, P()))
    max_cap = 0xFFFFFFF0 if kmer_len is None else int(kmer_len)

    offset = 0
    ghi, glo, unresolved = _run_structure_large_jit(
        genome_g, pos_hi, pos_lo, is_pad, is_pad, is_pad, seg_tables,
        n_words, two_bit, jnp.uint32(offset), window_bases, True, max_cap,
        mesh,
    )
    while int(unresolved) > 0:
        offset += window_bases
        ghi, glo, unresolved = _run_structure_large_jit(
            genome_g, pos_hi, pos_lo, is_pad, ghi, glo, seg_tables,
            n_words, two_bit, jnp.uint32(offset), window_bases, False,
            max_cap, mesh,
        )
    return ghi, glo


def sample_sort_canonical_ragged(
    packed_e,
    positions,
    seg_starts,
    seg_ends,
    kmer_len: int,
    mesh,
    n_samples: int = 256,
    capacity_factor: float = 1.5,
    two_bit: bool = True,
):
    """Canonical (strand-collapsed) sample sort over an ARBITRARY uint32
    position set: rows ordered by min(key, revcomp(key)) with position
    tie-break; truncated rows (valid_len < kmer_len — no canonical form)
    ride as pads. Returns ``(positions, is_pad, canonical_lanes)``; the
    retained canonical word lanes are the group identity for the ragged
    histogram (``sorted_words=``). The dense-index variant is
    ``sample_sort_canonical_dense_ragged``; this one serves customized /
    filtered position sets. ``two_bit=False``: 4-bit IUPAC lanes."""
    from ..ops.keys import compute_valid_len

    limit = 64 if two_bit else 32
    if kmer_len is None or kmer_len < 1 or kmer_len > limit:
        raise ValueError(f"kmer_len ({kmer_len}) must be in [1, {limit}]")
    n = positions.shape[0]
    n_dev = mesh_size(mesh)
    n_words = _cdiv(kmer_len, 16 if two_bit else 8)

    vl = compute_valid_len(positions, seg_starts, seg_ends)
    full = vl >= jnp.uint32(kmer_len)
    cap = jnp.full(positions.shape, jnp.uint32(kmer_len))
    pad_mask = (~full).astype(jnp.uint32)

    positions_p = _pad_to_multiple(positions, n_dev, _PAD_POS)
    cap_p = _pad_to_multiple(cap, n_dev, jnp.uint32(kmer_len))
    is_pad = _pad_to_multiple(pad_mask, n_dev, jnp.uint32(1))
    m = positions_p.shape[0] // n_dev
    n_samples = min(n_samples, m)

    sharding = NamedSharding(mesh, mesh_pspec(mesh))
    positions_p = put_global(positions_p, sharding)
    cap_p = put_global(cap_p, sharding)
    is_pad = put_global(is_pad, sharding)
    genome = put_global(packed_e, NamedSharding(mesh, P()))

    factor = capacity_factor
    while True:
        capacity = min(m, int(np.ceil(m / n_dev * factor)) + n_dev)
        out_pos, out_is_pad, lanes, overflow = _sample_sort_jit(
            genome, (positions_p,), cap_p, is_pad, n_words, two_bit, n_samples,
            capacity, True, False, mesh, canonical_k=kmer_len,
        )
        if int(overflow) == 0:
            return out_pos[0], out_is_pad, lanes
        if capacity >= m:
            raise AssertionError("canonical sample sort overflow at full capacity")
        factor *= 2.0


def sample_sort_canonical_large_ragged(
    packed_strided,
    positions_u64: np.ndarray,
    seg_starts_u64: np.ndarray,
    seg_ends_u64: np.ndarray,
    kmer_len: int,
    mesh,
    n_samples: int = 256,
    capacity_factor: float = 1.5,
    two_bit: bool = True,
):
    """Canonical (strand-collapsed) large sample sort: rows ordered by
    min(key, revcomp(key)) with the position pair as tie-break; truncated
    rows ride as pads. Returns ``((hi, lo), is_pad, canonical_lanes)`` — the
    retained canonical word lanes are the group identity for
    ``distributed_canonical_histogram_large`` (no re-gather, no cap lane:
    every real row is full-length). ``two_bit=False``: 4-bit IUPAC lanes."""
    limit = 64 if two_bit else 32
    if kmer_len is None or kmer_len < 1 or kmer_len > limit:
        raise ValueError(f"kmer_len ({kmer_len}) must be in [1, {limit}]")
    return sample_sort_positions_large_ragged(
        packed_strided, positions_u64, seg_starts_u64, seg_ends_u64,
        kmer_len, mesh, two_bit=two_bit, n_samples=n_samples,
        capacity_factor=capacity_factor, uniform_cap=True,
        return_lanes=True, canonical_k=kmer_len,
    )


def sample_sort_positions_large(
    packed_strided,
    positions_u64: np.ndarray,
    seg_starts_u64: np.ndarray,
    seg_ends_u64: np.ndarray,
    max_kmer_len: int,
    mesh,
    two_bit: bool = True,
    n_samples: int = 256,
    capacity_factor: float = 1.5,
    uniform_cap: bool = False,
) -> np.ndarray:
    """Compacted variant of ``sample_sort_positions_large_ragged``: returns
    the globally sorted positions as a host uint64 array, pads removed."""
    from ..ops.large import fuse64_np

    (hi, lo), is_pad = sample_sort_positions_large_ragged(
        packed_strided, positions_u64, seg_starts_u64, seg_ends_u64,
        max_kmer_len, mesh, two_bit=two_bit, n_samples=n_samples,
        capacity_factor=capacity_factor, uniform_cap=uniform_cap,
    )
    pad_np = np.asarray(is_pad)
    keep = pad_np == 0
    out = fuse64_np(np.asarray(hi)[keep], np.asarray(lo)[keep])
    assert out.shape[0] == np.asarray(positions_u64).shape[0]
    return out
