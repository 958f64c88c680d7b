"""Distributed group statistics in the large (64-bit coordinate) regime.

The standard distributed stats (`distributed.py`) index rows and accumulate
counts in uint32 — exact because the flat path's int32 gather bound keeps
every quantity below 2^31. Past that bound (both-strand human genome ≈ 6.2G
k-mers, SURVEY.md §7.3-6; the reference hard-fails there, reference
kmers.py:805-808) three quantities can exceed 32 bits:

  * **global valid-row indices** (vidx) — carried as (hi, lo) uint32 lane
    pairs; the cross-shard scans (reverse cummin of next-boundary vidx,
    prefix offsets) run on the pair monoids from ops/large.py
    (``lexmin2`` / 64-bit carry adds), so every intermediate is exact
    without 64-bit integers, which TPUs don't have natively.
  * **per-group sizes and the qualifying total** — sizes are pair-valued;
    the total is an exact pair cumsum (``associative_scan`` over the carry
    add monoid), per shard, fused and summed on host in uint64.
  * **per-bin group counts** — uint32 per shard (a shard holds < 2^31
    rows), summed across shards on host in uint64 instead of a device
    ``psum`` that could wrap.

Genome access uses the strided packs + funnel-shift key builders from
ops/large.py; positions arrive in the ragged pair-lane layout that
``sample_sort.sample_sort_positions_large_ragged`` produces. Compare caps
are derived *inside* the kernel from the segment extents (pair-lane binary
search), never passed alongside the positions — the same alignment
invariant the uint32 path enforces.
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

from ..ops.groups import adaptive_bin_count, clipped_counts
from ..ops.large import (
    add64,
    add64_u32,
    build_key2_words_strided,
    build_key_words_strided,
    compute_valid_len64,
    lexmin2,
    min64,
    split64_np,
    sub64,
)
from ..ops.sort import _cdiv
from .distributed import AXIS, mesh_axes, mesh_pspec, mesh_size, put_global

_ONES = jnp.uint32(0xFFFFFFFF)


def _pair_add(a, b):
    """associative_scan monoid: exact 64-bit add over (hi, lo) uint32 pairs."""
    return add64(a[0], a[1], b[0], b[1])


def _pairsum_small(vals):
    """Shared exact pair sum (ops/large.pairsum_small)."""
    from ..ops.large import pairsum_small

    return pairsum_small(vals)


def _large_stats_local(
    pos_hi, pos_lo, is_pad, genome, starts_hi, starts_lo, ends_hi, ends_lo,
    min_gs, max_gs_hi, max_gs_lo, sorted_words, mask, ext_gid,
    *, kmer_len, n_words, two_bit, n_dev, keep_bits, strand_split,
    axes=AXIS,
):
    """shard_map body: boundary mask via strided key words + halo compare,
    pair-lane valid-row geometry, per-shard qualifying sizes + pair total
    (adaptive-histogram stage 1; stage 2 is ``_large_hist_local``).

    ``sorted_words``: optional retained sorted lanes from the large sample
    sort — group identity comes from them (last word masked to ``keep_bits``
    for kmer_len below the built length) with no strided re-gather; None
    rebuilds the words in-kernel. ``mask``: optional filter-survivor mask —
    boundaries stay in ALL-valid-row identity while sizes count only
    survivors (the reference's previous-survivor walk partitions survivors
    exactly as the unfiltered groups do; see
    ops/groups.survivor_sizes_at_boundaries). ``ext_gid``: optional
    (gid_hi, gid_lo) pair of CONVERGED refinement run ids — the group
    identity for unbounded (kmer_len=None) / beyond-window stats, replacing
    the key words entirely. ``strand_split``: optional (hi, lo) uint64
    threshold — positions >= it are "-"-strand rows that never share a
    group with "+" rows (track_strands_separately; one extra identity
    lane, the large analog of the uint32 engine's strand term).
    """
    from ..ops.large import lesseq64

    n_local = pos_hi.shape[0]
    my = jax.lax.axis_index(axes)
    valid = is_pad == jnp.uint32(0)

    if ext_gid is not None:
        # converged run ids ARE the group identity (pads carry all-ones)
        lanes = tuple(ext_gid)
    elif sorted_words is None:
        # caps from segment extents, derived in-kernel (pads masked to 0)
        valid_len = compute_valid_len64(
            pos_hi, pos_lo, starts_hi, starts_lo, ends_hi, ends_lo
        )
        cap = jnp.minimum(valid_len, jnp.uint32(kmer_len))
        cap = jnp.where(valid, cap, jnp.uint32(0))
        build = build_key2_words_strided if two_bit else build_key_words_strided
        words = build(genome, pos_hi, pos_lo, cap, n_words, 0)
        lanes = words + ((cap,) if two_bit else ())
    else:
        # retained lanes (words_tuple, cap_lane_or_None) with pads folded to
        # all-ones. Word content past each row's cap is already zero, so
        # masking the last needed word recovers the kmer_len-base identity
        # gather-free; the retained cap lane is clipped to kmer_len.
        # Canonical lanes carry no cap (full-length rows only).
        words_only, cap_lane = sorted_words
        use = list(words_only[:n_words])
        if keep_bits < 32:
            use[-1] = use[-1] & jnp.uint32((0xFFFFFFFF << (32 - keep_bits)) & 0xFFFFFFFF)
        lanes = tuple(use)
        if two_bit and cap_lane is not None:
            lanes = lanes + (jnp.minimum(cap_lane, jnp.uint32(kmer_len)),)

    if strand_split is not None:
        sp_hi = jnp.uint32(strand_split >> 32)
        sp_lo = jnp.uint32(strand_split & 0xFFFFFFFF)
        is_rc = lesseq64(sp_hi, sp_lo, pos_hi, pos_lo)  # split <= pos
        lanes = lanes + (is_rc.astype(jnp.uint32),)

    # global valid-row coordinates as pairs; with a filter mask the
    # coordinates count SURVIVORS, so boundary-to-boundary differences are
    # survivor group sizes (zero-survivor groups size 0, excluded below)
    counted = valid if mask is None else (valid & mask)
    counted_u = counted.astype(jnp.uint32)
    n_valid = jnp.sum(valid.astype(jnp.uint32))
    all_n_valid = jax.lax.all_gather(n_valid, axes)  # (n_dev,)
    n_counted = jnp.sum(counted_u)
    all_n_counted = jax.lax.all_gather(n_counted, axes)
    mask_before = (jnp.arange(n_dev) < my).astype(jnp.uint32)
    off_hi, off_lo = _pairsum_small(all_n_counted * mask_before)
    tot_hi, tot_lo = _pairsum_small(all_n_counted)
    local_excl = jnp.cumsum(counted_u) - counted_u
    vhi_idx, vlo_idx = add64_u32(off_hi, off_lo, local_excl)

    # intra-shard adjacency (valid rows form a prefix per shard)
    eq = jnp.ones(n_local, dtype=bool)
    for w in lanes:
        prev = jnp.concatenate([w[:1], w[:-1]])
        eq = eq & (w == prev)

    # halo: row 0 vs the last valid row of the nearest previous non-empty shard
    last_i = (jnp.maximum(n_valid, jnp.uint32(1)) - jnp.uint32(1)).astype(jnp.int32)
    my_last = jnp.stack([jnp.take(w, last_i) for w in lanes])
    all_last = jax.lax.all_gather(my_last, axes)
    has_data = all_n_valid > 0
    cand = jnp.where(has_data, jnp.arange(n_dev), -1)
    pred_idx = jax.lax.associative_scan(jnp.maximum, cand)
    pred_of_mine = jnp.where(my > 0, jnp.take(pred_idx, jnp.maximum(my - 1, 0)), -1)
    pred_lanes = jnp.take(all_last, jnp.maximum(pred_of_mine, 0), axis=0)
    eq0 = jnp.ones((), dtype=bool)
    for li, w in enumerate(lanes):
        eq0 = eq0 & (w[0] == pred_lanes[li])
    eq0 = jnp.where(pred_of_mine < 0, False, eq0)
    eq = eq.at[0].set(eq0)

    boundary = (~eq) & valid

    # pair-lane reverse cummin of next-boundary vidx, stitched across shards
    mh = jnp.where(boundary, vhi_idx, _ONES)
    ml = jnp.where(boundary, vlo_idx, _ONES)
    nb_hi, nb_lo = jax.lax.associative_scan(lexmin2, (mh, ml), reverse=True)
    first_hi = jax.lax.all_gather(nb_hi[0], axes)
    first_lo = jax.lax.all_gather(nb_lo[0], axes)
    suf_hi, suf_lo = jax.lax.associative_scan(
        lexmin2, (first_hi[::-1], first_lo[::-1])
    )
    suf_hi, suf_lo = suf_hi[::-1], suf_lo[::-1]
    nxt = jnp.minimum(my + 1, n_dev - 1)
    after_hi = jnp.where(my + 1 < n_dev, jnp.take(suf_hi, nxt), _ONES)
    after_lo = jnp.where(my + 1 < n_dev, jnp.take(suf_lo, nxt), _ONES)
    sh_hi = jnp.concatenate([nb_hi[1:], jnp.full((1,), _ONES)])
    sh_lo = jnp.concatenate([nb_lo[1:], jnp.full((1,), _ONES)])
    na_hi, na_lo = min64(sh_hi, sh_lo, after_hi, after_lo)
    na_hi, na_lo = min64(na_hi, na_lo, tot_hi, tot_lo)

    s_hi, s_lo = sub64(na_hi, na_lo, vhi_idx, vlo_idx)
    s_hi = jnp.where(boundary, s_hi, jnp.uint32(0))
    s_lo = jnp.where(boundary, s_lo, jnp.uint32(0))

    ge_min = (s_hi > 0) | (s_lo >= min_gs)
    le_max = (s_hi < max_gs_hi) | ((s_hi == max_gs_hi) & (s_lo <= max_gs_lo))
    qualifies = boundary & ge_min & le_max

    # exact pair total of qualifying sizes (scan; last element = shard sum).
    # Everything returns per-shard (P(AXIS)) — the cross-shard reduction
    # happens on host in uint64, where a device psum could wrap uint32.
    q_hi = jnp.where(qualifies, s_hi, jnp.uint32(0))
    q_lo = jnp.where(qualifies, s_lo, jnp.uint32(0))
    th, tl = jax.lax.associative_scan(_pair_add, (q_hi, q_lo))
    # adaptive-histogram stage-1 digest: largest qualifying size across all
    # shards, saturated to uint32 (sizes >= 2^32 report 0xFFFFFFFF and will
    # clip into whatever top bin the host picks) — the host sizes the
    # stage-2 bin count by it
    hi_sat = jnp.where(s_hi > jnp.uint32(0), _ONES, s_lo)
    hib = jax.lax.pmax(jnp.max(jnp.where(qualifies, hi_sat, jnp.uint32(0))), axes)
    return s_hi, s_lo, qualifies, th[-1:], tl[-1:], hib, boundary


@partial(jax.jit, static_argnames=("flags_fn", "base", "built_k"))
def large_lanes_filter_flags(words, cap_lane, pos_hi, pos_lo, is_pad, params,
                             flags_fn, base, built_k):
    """Filter survivor mask + error digest over the retained sorted lanes of
    a LARGE (64-bit coordinate) index — the pair-lane analog of
    parallel.distributed.mesh_lanes_filter_flags.

    The lanes flags kernels (ops/filters) take uint32 positions only to
    compare against overflow thresholds of the form (sba_len - offset), so
    64-bit positions enter as a saturating PROXY ``max(pos - base, 0)``
    with ``base = max(0, sba_len - 2^31)``: positions below base can never
    overflow (every threshold is >= sba_len - 64 > base), and positions at
    or above base sit within 2^31 of it, so the uint32 compare against the
    rebased threshold (the caller computes params with
    ``lanes_spec(..., sba_len - base, ...)``) is exact. The err digest's
    first-bad-position is in proxy coordinates — add ``base`` back on host.

    ``cap_lane`` is the retained sort cap (min(valid_len, built_k)), which
    is exactly the cap the flags contract expects; pad rows carry all-ones
    caps/lanes and are excluded from mask and errors.
    """
    from ..ops.groups import fold_err_conditions

    del built_k  # part of the cache key: lanes layouts differ per built_k
    valid = is_pad == jnp.uint32(0)
    b_hi = jnp.uint32(base >> 32)
    b_lo = jnp.uint32(base & 0xFFFFFFFF)
    ge = (pos_hi > b_hi) | ((pos_hi == b_hi) & (pos_lo >= b_lo))
    d_hi, d_lo = sub64(pos_hi, pos_lo, b_hi, b_lo)
    proxy = jnp.where(ge, d_lo, jnp.uint32(0))
    # pad rows: all-ones position pairs would proxy to huge values; fold to
    # 0 so no error condition can fire on them even before the valid mask
    proxy = jnp.where(valid, proxy, jnp.uint32(0))
    mask, errs = flags_fn(words, cap_lane, proxy, params)
    mask = mask & valid
    terms = fold_err_conditions(errs, proxy, valid=valid)
    if terms:
        return mask, jnp.stack(terms)
    return mask, jnp.zeros(0, dtype=jnp.uint32)


@partial(jax.jit, static_argnames=("max_kmer_len", "two_bit"))
def _rebuild_lanes_jit(packed, pos_hi, pos_lo, is_pad, seg_tables,
                       max_kmer_len, two_bit):
    starts_hi, starts_lo, ends_hi, ends_lo = seg_tables
    vl = compute_valid_len64(pos_hi, pos_lo, starts_hi, starts_lo, ends_hi, ends_lo)
    cap = jnp.minimum(vl, jnp.uint32(max_kmer_len))
    n_words = _cdiv(max_kmer_len, 16 if two_bit else 8)
    build = build_key2_words_strided if two_bit else build_key_words_strided
    words = build(packed, pos_hi, pos_lo, cap, n_words, 0)
    padm = is_pad != jnp.uint32(0)
    # match the sample sort's retained-lane convention: pad rows all-ones
    words = tuple(jnp.where(padm, _ONES, w) for w in words)
    cap = jnp.where(padm, _ONES, cap)
    return words + (cap,)


def rebuild_large_lanes(packed_strided, pos_hi, pos_lo, is_pad,
                        seg_starts_u64, seg_ends_u64, max_kmer_len, mesh,
                        two_bit):
    """Re-derive the sorted key lanes (words + cap, pad rows all-ones) for a
    restored layout that has no in-process sort to retain them from — one
    strided gather pass; every later stats/filter call is gather-free again."""
    sh, sl = split64_np(np.asarray(seg_starts_u64, dtype=np.uint64))
    eh, el = split64_np(np.asarray(seg_ends_u64, dtype=np.uint64))
    rep = NamedSharding(mesh, P())
    seg_tables = tuple(put_global(jnp.asarray(a), rep) for a in (sh, sl, eh, el))
    genome = put_global(packed_strided, rep)
    return _rebuild_lanes_jit(
        genome, pos_hi, pos_lo, is_pad, seg_tables, max_kmer_len, two_bit
    )


def _large_hist_local(s_hi, s_lo, qualifies, *, max_counts_bin):
    """Stage 2: per-shard clipped histogram at the host-chosen bin count
    (sizes past the top bin clip into it, reference kmers.py:514-518)."""
    clipped = jnp.where(
        s_hi > 0, jnp.uint32(max_counts_bin), jnp.minimum(s_lo, jnp.uint32(max_counts_bin))
    )
    return clipped_counts(qualifies, clipped, max_counts_bin)


@partial(jax.jit, static_argnames=("max_counts_bin", "mesh"))
def _large_hist_jit(s_hi, s_lo, qualifies, max_counts_bin, mesh):
    sp = mesh_pspec(mesh)
    fn = shard_map(
        partial(_large_hist_local, max_counts_bin=max_counts_bin),
        mesh=mesh,
        in_specs=(sp, sp, sp),
        out_specs=sp,
    )
    return fn(s_hi, s_lo, qualifies)


@partial(jax.jit, static_argnames=("kmer_len", "n_words", "two_bit", "mesh",
                                   "keep_bits", "strand_split"))
def _large_stats_jit(pos_hi, pos_lo, is_pad, genome, seg_tables, min_gs,
                     max_gs_hi, max_gs_lo, sorted_words, mask, ext_gid,
                     kmer_len, n_words, two_bit, mesh, keep_bits=32,
                     strand_split=None):
    n_dev = mesh_size(mesh)
    sp = mesh_pspec(mesh)
    starts_hi, starts_lo, ends_hi, ends_lo = seg_tables

    def body(pos_hi, pos_lo, is_pad, genome, sh, sl, eh, el, mn, mh, ml,
             sw, msk, eg):
        return _large_stats_local(
            pos_hi, pos_lo, is_pad, genome, sh, sl, eh, el, mn, mh, ml,
            sw, msk, eg,
            kmer_len=kmer_len, n_words=n_words, two_bit=two_bit, n_dev=n_dev,
            keep_bits=keep_bits, strand_split=strand_split,
            axes=mesh_axes(mesh),
        )

    fn = shard_map(
        body,
        mesh=mesh,
        # trailing sharded specs are pytree prefixes over the optional
        # sorted_words / mask / ext_gid (None contributes no leaves)
        in_specs=(sp, sp, sp) + (P(),) * 8 + (sp, sp, sp),
        out_specs=(sp, sp, sp, sp, sp, P(), sp),
    )
    return fn(pos_hi, pos_lo, is_pad, genome, starts_hi, starts_lo, ends_hi,
              ends_lo, min_gs, max_gs_hi, max_gs_lo, sorted_words, mask,
              ext_gid)


def distributed_group_size_histogram_large_ragged(
    packed_strided,
    pos_hi: jax.Array,
    pos_lo: jax.Array,
    is_pad: jax.Array,
    seg_starts_u64: np.ndarray,
    seg_ends_u64: np.ndarray,
    kmer_len: int,
    mesh,
    min_group_size: int = 1,
    max_group_size: int | None = None,
    max_counts_bin: int = 1000000,
    two_bit: bool = True,
    sorted_words=None,
    built_k: int | None = None,
    mask=None,
    return_rows: bool = False,
    ext_gid=None,
    strand_split: int | None = None,
):
    """Group-size histogram + total over a globally sorted, sharded,
    pair-lane position array (the layout
    ``sample_sort_positions_large_ragged`` returns).

    ``sorted_words``: optional retained sorted lanes from the large sample
    sort (words + cap, built at ``built_k``) — skips the strided key
    re-gather for any ``kmer_len <= built_k``. ``mask``: optional sharded
    filter-survivor mask (see ``_large_stats_local``); zero-survivor groups
    never qualify, matching the reference walk. ``ext_gid``: optional
    (gid_hi, gid_lo) converged run-id pair — group identity for unbounded
    (``kmer_len=None``) / beyond-window stats
    (sample_sort.sample_sort_positions_large_unbounded /
    distributed_adjacent_gids_large). ``strand_split``: optional uint64
    position threshold — rows at or past it form strand-separate groups
    (track_strands_separately).

    Returns ``(counts, total)`` with counts a host uint64 array of length
    ``max_counts_bin + 1`` and total a Python int — exact for any number of
    k-mers (the uint32 engine's output is the uint32 cast of this one's).
    With ``return_rows=True``, also a dict of the per-row sharded device
    arrays {boundary, s_hi, s_lo, qualifies} (aligned with the input
    layout, pads included) for the bulk-array extraction APIs.
    """
    limit = 64 if two_bit else 32
    if ext_gid is None and (kmer_len is None or kmer_len > limit):
        raise NotImplementedError(
            f"large stats require kmer_len <= {limit} "
            "(pass ext_gid for unbounded/beyond-window group identity)"
        )
    bpw = 16 if two_bit else 8
    n_words = 0 if ext_gid is not None else _cdiv(kmer_len, bpw)

    keep_bits = 32
    sw_arg = None
    if ext_gid is not None:
        ext_gid = tuple(ext_gid)
        sorted_words = None
    if sorted_words is not None and built_k is not None and kmer_len <= built_k:
        # lanes layout from the large sample sort: words(built) + cap lane
        nwb = _cdiv(built_k, bpw)
        words_only = tuple(sorted_words[:nwb])
        cap_lane = sorted_words[nwb] if len(sorted_words) > nwb else None
        rem = kmer_len - (n_words - 1) * bpw
        keep_bits = rem * (32 // bpw)
        sw_arg = (words_only, cap_lane)

    sh, sl = split64_np(np.asarray(seg_starts_u64, dtype=np.uint64))
    eh, el = split64_np(np.asarray(seg_ends_u64, dtype=np.uint64))
    rep = NamedSharding(mesh, P())
    seg_tables = tuple(
        put_global(jnp.asarray(a), rep) for a in (sh, sl, eh, el)
    )
    genome = (
        put_global(packed_strided, rep)
        if (sw_arg is None and ext_gid is None)
        else put_global(jnp.zeros(1, dtype=jnp.uint32), rep)
    )

    if max_group_size is None:
        mgs_hi, mgs_lo = np.uint32(0xFFFFFFFF), np.uint32(0xFFFFFFFF)
    else:
        mgs_hi = np.uint32(int(max_group_size) >> 32)
        mgs_lo = np.uint32(int(max_group_size) & 0xFFFFFFFF)

    s_hi_a, s_lo_a, qualifies, tot_hi, tot_lo, hi_digest, boundary = _large_stats_jit(
        pos_hi, pos_lo, is_pad, genome, seg_tables,
        np.uint32(max(min_group_size, 1)), mgs_hi, mgs_lo, sw_arg, mask,
        ext_gid,
        0 if ext_gid is not None else kmer_len, n_words, two_bit, mesh,
        keep_bits=keep_bits,
        strand_split=None if strand_split is None else int(strand_split),
    )
    n_dev = mesh_size(mesh)
    # adaptive stage 2: the digest's hi (largest qualifying size, saturated
    # to uint32) sizes the device bin count — broadcast-compare bins when
    # the range fits, scatter at the pow2-bucketed user bin count otherwise
    # (shared policy: ops/groups.adaptive_bin_count)
    bins = adaptive_bin_count(int(hi_digest), max_counts_bin)
    all_counts = _large_hist_jit(s_hi_a, s_lo_a, qualifies, bins, mesh)
    # trimmed download: per-shard uint32 counts stay on device (a psum could
    # wrap uint32 in this regime); only the counts[:, :b] prefix crosses the
    # link, b = next-pow2(hi+1) — every higher bin is zero on every shard
    b = bins + 1
    hi_t = min(int(hi_digest), bins)
    if hi_t < bins:
        b = 8
        while b < hi_t + 1:
            b *= 2
        b = min(b, bins + 1)
    prefix = np.asarray(
        all_counts.reshape(n_dev, bins + 1)[:, :b]
    ).astype(np.uint64).sum(axis=0)
    counts = np.zeros(max_counts_bin + 1, dtype=np.uint64)
    if b > max_counts_bin + 1:
        # device bins past the user's top bin fold into it (exact clipping)
        counts[:] = prefix[: max_counts_bin + 1]
        counts[max_counts_bin] += prefix[max_counts_bin + 1 :].sum()
    else:
        counts[:b] = prefix
    hi = np.asarray(tot_hi).astype(np.uint64)
    lo = np.asarray(tot_lo).astype(np.uint64)
    total = int(((hi << np.uint64(32)) | lo).sum())
    if return_rows:
        rows = {
            "boundary": boundary,
            "s_hi": s_hi_a,
            "s_lo": s_lo_a,
            "qualifies": qualifies,
        }
        return counts, total, rows
    return counts, total
