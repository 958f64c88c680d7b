"""Multi-chip k-mer index construction over a ``jax.sharding.Mesh``.

The reference is strictly single-process (SURVEY.md §2: no distributed code
anywhere), so this module is new TPU-native design, constrained only by output
parity with the single-chip engine:

  * the packed-rank genome is **replicated** per device (a packed human genome
    is ~1.7 GB of uint32 at 4 bits/base — fits HBM), and the k-mer position
    array is **sharded** along one mesh axis — the distributed analog of the
    reference's per-record ``np.arange`` fill (kmers.py:813-826).
  * the global sort runs as a ``shard_map``: each device key-builds + locally
    sorts its shard, then ``n_devices`` rounds of odd-even block merge-split
    (pairwise ppermute exchange + local 2m merge, keep lower/upper half)
    produce a globally sorted, evenly sharded position array. Odd-even
    transposition on sorted blocks is deterministic, static-shape, and rides
    the ICI; it replaces the reference's Numba quicksort
    (kmers.py:1624-1652) at multi-chip scale.
  * group statistics stitch across shard boundaries by exchanging per-shard
    edge runs (first/last key + run length) via all_gather — the distributed
    replacement for the sequential group-walk carry (kmers.py:592-601).

Everything here also runs on a CPU ``Mesh`` built from
``xla_force_host_platform_device_count`` virtual devices, which is how the
test suite exercises it without TPU hardware.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.groups import clipped_counts
from ..ops.keys import build_key2_words, build_key_words, cap_lengths, compute_valid_len
from ..ops.sort import _PAD_POS, _cdiv


def _words_for(packed, positions, cap_len, n_words, two_bit):
    """Key words at offset 0: 2-bit (16 bases/word, needs cap as an extra key
    lane) or 4-bit (8 bases/word, truncation encoded in the words)."""
    if two_bit:
        return build_key2_words(packed, positions, cap_len, n_words, jnp.uint32(0))
    return build_key_words(packed, positions, cap_len, n_words, jnp.uint32(0))

AXIS = "kmers"  # mesh axis name: position-sharded data parallelism


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D device mesh over the position-sharding axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def mesh_axes(mesh: Mesh):
    """Collective axis spec for a mesh: the single axis name on a 1-D mesh,
    or the full axis-name tuple on a hierarchical 2-D ``(node, local)``
    mesh (parallel.hier.make_mesh2). jax linearizes tuple axes row-major,
    so ``axis_index(axes)`` IS the global shard id and every
    all_gather/psum sees shards in global order — the shard-level math is
    identical on both mesh shapes; only the sample sort's exchange step
    branches (two-stage node-aggregated all_to_all on 2-D)."""
    names = tuple(mesh.axis_names)
    return names[0] if len(names) == 1 else names


def hier_shape(mesh: Mesh):
    """(n_nodes, n_local) on a 2-D hierarchical mesh, None on a flat 1-D
    mesh; >2-D meshes are rejected HERE, the single home of mesh-shape
    policy (mesh_axes above happily names any mesh)."""
    names = tuple(mesh.axis_names)
    if len(names) == 1:
        return None
    if len(names) != 2:
        raise NotImplementedError(
            f"meshes must be 1-D (flat) or 2-D (node, local); got {names}"
        )
    return (mesh.shape[names[0]], mesh.shape[names[1]])


def mesh_size(mesh: Mesh) -> int:
    """Total device count across every mesh axis."""
    out = 1
    for a in mesh.axis_names:
        out *= mesh.shape[a]
    return int(out)


def mesh_pspec(mesh: Mesh) -> P:
    """PartitionSpec sharding the leading dim over ALL mesh axes."""
    names = tuple(mesh.axis_names)
    return P(names[0] if len(names) == 1 else names)


def _pad_to_multiple(arr: jax.Array, multiple: int, fill) -> jax.Array:
    n = arr.shape[0]
    n_pad = _cdiv(max(n, 1), multiple) * multiple
    if n_pad == n:
        return arr
    return jnp.concatenate([arr, jnp.full((n_pad - n,), fill, dtype=arr.dtype)])


def put_global(arr, sharding) -> jax.Array:
    """Place a host-replicated array onto a (possibly multi-host) sharding.

    Single-process: plain device_put. Multi-host (``jax.distributed``
    initialized, mesh spanning processes): ``jax.device_put`` cannot target
    non-addressable devices, so build the global array from per-shard
    callbacks — every process holds the full host array and contributes the
    slices it owns.
    """
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    host = np.asarray(arr)
    return jax.make_array_from_callback(host.shape, sharding, lambda idx: host[idx])


@partial(jax.jit, static_argnames=("mesh",))
def compact_ragged(positions, is_pad, mesh):
    """Stable per-shard compaction: move pad rows to each shard's tail while
    preserving the relative order of valid rows.

    The distributed group statistics assume every shard's valid rows form a
    prefix (the layout the sample sort produces). Applying a filter mask to
    an already-sorted ragged index intersperses new pad rows; one local
    (is_pad, original-row) sort restores the invariant without touching the
    global order of survivors.
    """

    def local(pos, pad):
        # stable by the pad flag alone: valid rows keep their relative order
        # with no iota tie-break lane (2 lanes instead of 3)
        s_pad, s_pos = jax.lax.sort((pad, pos), num_keys=1, is_stable=True)
        return s_pos, s_pad

    sp = mesh_pspec(mesh)
    fn = shard_map(
        local, mesh=mesh, in_specs=(sp, sp), out_specs=(sp, sp)
    )
    return fn(positions, is_pad)


def _oddeven_phase(ops, n_keys, n_dev, phase):
    """One block odd-even transposition phase inside shard_map.

    Even phases pair shards (0,1),(2,3),…; odd phases pair (1,2),(3,4),….
    Each pair exchanges full blocks via ppermute, merges the 2m rows with one
    lax.sort, and the lower-indexed shard keeps the lower half. Unpaired
    shards (ends of the chain) keep their rows. n_dev phases guarantee a
    globally sorted sequence of blocks (odd-even transposition invariant).
    """
    my = jax.lax.axis_index(AXIS).astype(jnp.int32)
    perm = []
    for i in range(n_dev):
        j = (i ^ 1) if phase % 2 == 0 else (i + 1 if i % 2 == 1 else i - 1)
        if 0 <= j < n_dev:
            perm.append((i, j))
    if phase % 2 == 0:
        partner = my ^ 1
        is_low = (my % 2) == 0
    else:
        partner = jnp.where(my % 2 == 1, my + 1, my - 1)
        is_low = (my % 2) == 1
    paired = (partner >= 0) & (partner < n_dev)

    received = [jax.lax.ppermute(x, AXIS, perm) for x in ops]
    m = ops[0].shape[0]
    merged = jax.lax.sort(
        tuple(jnp.concatenate([a, b]) for a, b in zip(ops, received)), num_keys=n_keys
    )
    lo = tuple(x[:m] for x in merged)
    hi = tuple(x[m:] for x in merged)
    picked = tuple(jnp.where(is_low, l, h) for l, h in zip(lo, hi))
    return tuple(jnp.where(paired, p, o) for p, o in zip(picked, ops))


def _dist_sort_local(packed, positions, cap_len, is_pad, n_words, n_dev, two_bit):
    """shard_map body: local key build + sort, then n_dev odd-even phases.

    Key lane order: (is_pad, words..., cap, position) — all lanes are keys.
    The cap lane implements shorter-prefix-equal => smaller on the 2-bit path
    and is redundant-but-harmless on the 4-bit path (equal 4-bit words imply
    equal caps).
    """
    words = _words_for(packed, positions, cap_len, n_words, two_bit)
    ops = (is_pad,) + words + (cap_len, positions)
    n_keys = len(ops)
    ops = jax.lax.sort(ops, num_keys=n_keys)
    for phase in range(n_dev):
        ops = _oddeven_phase(ops, n_keys, n_dev, phase)
    return ops


@partial(jax.jit, static_argnames=("n_words", "two_bit", "mesh"))
def _distributed_sort_jit(packed, positions, cap_len, is_pad, n_words, two_bit, mesh):
    n_dev = mesh.shape[AXIS]
    fn = shard_map(
        partial(_dist_sort_local, n_words=n_words, n_dev=n_dev, two_bit=two_bit),
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=tuple([P(AXIS)] * (n_words + 3)),
    )
    return fn(packed, positions, cap_len, is_pad)


def distributed_sort_positions(
    packed: jax.Array,
    positions: jax.Array,
    seg_starts: jax.Array,
    seg_ends: jax.Array,
    max_kmer_len: int,
    mesh: Mesh,
    packed2: jax.Array | None = None,
) -> jax.Array:
    """Globally sort k-mer start positions over the mesh.

    Per-position compare caps are derived internally from the segment extents
    (caps must always be aligned with the position array they accompany — an
    easy footgun if passed separately). Requires a bounded ``max_kmer_len``:
    <= 32 bases on the 4-bit path, <= 64 with ``packed2``
    (keys.pack_rank2_words, ACGT-only genomes, half the key lanes) — covering
    the BASELINE.json k in {21, 31, 55}; unbounded k falls back to the
    single-chip iterative-refinement sort. Returns the sorted uint32
    positions, pads removed.
    """
    limit = 64 if packed2 is not None else 32
    if max_kmer_len is None or max_kmer_len > limit:
        raise NotImplementedError(
            f"distributed sort requires max_kmer_len <= {limit} bases"
            " (64 with the 2-bit ACGT fast path)"
        )
    if len(mesh.axis_names) != 1:
        raise NotImplementedError(
            "the odd-even merge sort is 1-D-mesh only (its ppermute ring "
            "has no hierarchical form); use the sample sort for 2-D meshes"
        )
    cap_len = cap_lengths(
        compute_valid_len(positions, seg_starts, seg_ends), max_kmer_len
    )
    two_bit = packed2 is not None
    genome = packed2 if two_bit else packed
    n = positions.shape[0]
    n_dev = mesh.shape[AXIS]
    n_words = _cdiv(max_kmer_len, 16 if two_bit else 8)

    positions_p = _pad_to_multiple(positions, n_dev, _PAD_POS)
    cap_p = _pad_to_multiple(cap_len, n_dev, jnp.uint32(0))
    is_pad = jnp.zeros(n, dtype=jnp.uint32)
    is_pad = _pad_to_multiple(is_pad, n_dev, jnp.uint32(1))

    sharding = NamedSharding(mesh, P(AXIS))
    positions_p = put_global(positions_p, sharding)
    cap_p = put_global(cap_p, sharding)
    is_pad = put_global(is_pad, sharding)
    genome = put_global(genome, NamedSharding(mesh, P()))

    res = _distributed_sort_jit(genome, positions_p, cap_p, is_pad, n_words, two_bit, mesh)
    sorted_pos = res[-1]
    return sorted_pos[:n]


# --------------------------------------------------------------------------- #
# distributed group statistics
# --------------------------------------------------------------------------- #


def _dist_sizes_digest_local(
    packed, positions, cap_len, is_pad, min_gs, max_gs, strand_split,
    sorted_words, mask, ext_gid, n_words, two_bit, keep_bits, axes=AXIS,
):
    """shard_map body for distributed group sizes (adaptive-histogram
    stage 1; stage 2 is ``_dist_hist_local``).

    Strategy (SURVEY.md §5.7 boundary stitching): compute the boundary mask
    with a halo compare, then derive *global* run lengths for every group in
    SURVIVOR coordinates — vidx[i] = number of counted rows before i across
    all shards — so padding may sit at the tail of EVERY shard (the ragged
    layout the sample sort produces), not just globally last. Each group's
    size is (vidx of next boundary, or total counted) - (vidx of this
    boundary); next-boundary vidx propagates backward across shards via a
    reverse cummin + all_gather of each shard's first-boundary vidx.

    ``mask``: optional per-row filter-survivor mask. With it the group
    boundaries stay in ALL-valid-row identity (the reference's
    previous-survivor walk partitions survivors exactly as the unfiltered
    groups do, see ops/groups.survivor_sizes_at_boundaries) while sizes
    count only survivors — the mesh analog of the single-chip
    lanes-filtered path, with no survivor compaction or re-layout. Without
    it every valid row counts (the unfiltered histogram, bit-identical to
    the pre-mask behavior).

    The halo compare at shard edges uses the LAST VALID row of the nearest
    previous non-empty shard (empty shards are skipped via a replicated
    prefix max over all_gather'd lane values).
    """
    n_local = positions.shape[0]
    n_dev = jax.lax.axis_size(axes)
    my = jax.lax.axis_index(axes)

    valid = is_pad == jnp.uint32(0)
    cap_len = jnp.where(valid, cap_len, jnp.uint32(0))
    n_valid = jnp.sum(valid.astype(jnp.uint32))
    all_n_valid = jax.lax.all_gather(n_valid, axes)  # (n_dev,)
    BIG = jnp.uint32(0xFFFFFFF0)

    # counted-row coordinates: vidx[i] = offset + (# counted rows before i
    # locally); counted = valid rows (unfiltered) or filter survivors
    counted = valid if mask is None else (mask & valid)
    counted_u = counted.astype(jnp.uint32)
    n_counted = jnp.sum(counted_u)
    all_n_counted = jax.lax.all_gather(n_counted, axes)
    offset = jnp.sum(jnp.where(jnp.arange(n_dev) < my, all_n_counted, 0)).astype(jnp.uint32)
    total_valid = jnp.sum(all_n_counted).astype(jnp.uint32)
    local_excl = jnp.cumsum(counted_u) - counted_u
    vidx = offset + local_excl

    # intra-shard adjacency (valid rows form a prefix, so row i-1 of a valid
    # row i>0 is its true predecessor)
    if ext_gid is not None:
        # precomputed group identity (unbounded/beyond-window kmer_len:
        # converged refinement run ids from sample_sort.
        # distributed_adjacent_gids) — one identity lane, no key words
        words = (ext_gid,)
    elif sorted_words is None:
        words = _words_for(packed, positions, cap_len, n_words, two_bit)
    else:
        # lanes retained by the sample sort (built at its max_kmer_len):
        # word content beyond each row's cap is already zero, so masking the
        # last needed word recovers the kmer_len-base identity without any
        # genome gather (the mesh analog of boundaries_from_sorted_lanes)
        use = list(sorted_words[:n_words])
        if keep_bits < 32:
            use[-1] = use[-1] & jnp.uint32((0xFFFFFFFF << (32 - keep_bits)) & 0xFFFFFFFF)
        words = tuple(use)
    # the 2-bit cap lane joins identity only for real key words — a
    # precomputed gid already encodes termination
    lanes = words + ((cap_len,) if (two_bit and ext_gid is None) else ())
    # track_strands_separately (both-strand extension): positions at or past
    # strand_split are "-"-strand k-mers and never share a group with "+"
    # entries — one extra identity lane. Disabled when strand_split exceeds
    # every position (all rows then carry lane value 0).
    lanes = lanes + ((positions >= strand_split).astype(jnp.uint32),)
    eq = jnp.ones(n_local, dtype=bool)
    for w in lanes:
        prev = jnp.concatenate([w[:1], w[:-1]])
        eq = eq & (w == prev)

    # halo: compare row 0 against the last valid row of the nearest previous
    # non-empty shard
    last_i = jnp.maximum(n_valid, jnp.uint32(1)) - jnp.uint32(1)
    my_last = jnp.stack([jnp.take(w, last_i.astype(jnp.int32)) for w in lanes])
    all_last = jax.lax.all_gather(my_last, axes)  # (n_dev, n_lanes)
    has_data = all_n_valid > 0
    # pred[p] = nearest q < p with data (replicated prefix max); -1 if none
    cand = jnp.where(has_data, jnp.arange(n_dev), -1)
    pred_idx = jax.lax.associative_scan(jnp.maximum, cand)  # inclusive
    pred_of_mine = jnp.where(my > 0, jnp.take(pred_idx, jnp.maximum(my - 1, 0)), -1)
    pred_lanes = jnp.take(all_last, jnp.maximum(pred_of_mine, 0), axis=0)
    eq0 = jnp.ones((), dtype=bool)
    for li, w in enumerate(lanes):
        eq0 = eq0 & (w[0] == pred_lanes[li])
    eq0 = jnp.where(pred_of_mine < 0, False, eq0)
    eq = eq.at[0].set(eq0)

    boundary = (~eq) & valid

    # vidx of the next boundary at or after each row, propagated across shards
    marked = jnp.where(boundary, vidx, BIG)
    next_b_local = jax.lax.cummin(marked, reverse=True)
    my_first = next_b_local[0]
    all_firsts = jax.lax.all_gather(my_first, axes)
    suffix = jax.lax.associative_scan(jnp.minimum, all_firsts[::-1])[::-1]
    after_mine = jnp.where(
        my + 1 < n_dev, jnp.take(suffix, jnp.minimum(my + 1, n_dev - 1)), BIG
    )
    next_b_shifted = jnp.concatenate([next_b_local[1:], jnp.array([BIG], dtype=jnp.uint32)])
    next_after = jnp.minimum(next_b_shifted, after_mine)

    size = jnp.where(boundary, jnp.minimum(next_after, total_valid) - vidx, jnp.uint32(0))

    # groups with zero counted rows never existed for the reference's walk
    # (matters only under a filter mask; unfiltered sizes are always >= 1)
    qualifies = boundary & (size >= jnp.maximum(min_gs, jnp.uint32(1))) & (size <= max_gs)
    total = jax.lax.psum(
        jnp.sum(jnp.where(qualifies, size, jnp.uint32(0)), dtype=jnp.uint32), axes
    )
    # UNclipped largest qualifying size — stage 1 of the adaptive histogram:
    # the host sizes the stage-2 bin count by it (see ops/groups.sizes_digest)
    hi = jax.lax.pmax(jnp.max(jnp.where(qualifies, size, jnp.uint32(0))), axes)
    # speculative stage-2 counts ride the digest (~1 KB psum) so the common
    # case never dispatches stage 2 (see ops/groups._SPEC_HIST_BINS)
    from ..ops.groups import _SPEC_HIST_BINS

    spec = jax.lax.psum(
        clipped_counts(
            qualifies, jnp.minimum(size, jnp.uint32(_SPEC_HIST_BINS)),
            _SPEC_HIST_BINS,
        ),
        axes,
    )
    return size, qualifies, jnp.concatenate([jnp.stack([total, hi]), spec])


def _dist_hist_local(size, qualifies, max_counts_bin, axes=AXIS):
    """Stage 2: per-shard clipped histogram + psum — dispatched at a bin
    count the stage-1 digest sized, so the reference's 1e6-bin default
    psums a few KB instead of 4 MB over the ICI."""
    clipped = jnp.minimum(size, jnp.uint32(max_counts_bin))
    counts = clipped_counts(qualifies, clipped, max_counts_bin)
    return jax.lax.psum(counts, axes)


@partial(jax.jit, static_argnames=("max_counts_bin", "mesh"))
def distributed_hist_from_sizes(size, qualifies, max_counts_bin, mesh):
    """Histogram of sharded qualifying (survivor) group sizes, replicated."""
    sp = mesh_pspec(mesh)
    fn = shard_map(
        partial(_dist_hist_local, max_counts_bin=max_counts_bin,
                axes=mesh_axes(mesh)),
        mesh=mesh,
        in_specs=(sp, sp),
        out_specs=P(),
    )
    return fn(size, qualifies)


@partial(jax.jit, static_argnames=("flags_fn", "built_k"))
def mesh_lanes_filter_flags(words, positions, is_pad, params, flags_fn,
                            seg_starts, seg_ends, built_k):
    """Filter survivor mask + error digest evaluated DIRECTLY on the mesh's
    retained sorted lanes (ops/filters lanes flags) — sharded elementwise
    ops, no replicated-plane gather, no host allgather for error checks.

    Per-row compare caps are recomputed here from the segment extents (the
    ragged sample sort strips its cap lane), inside the one compiled
    program — pad rows get garbage caps but are masked out below.

    Ragged pad rows (folded to all-ones lanes / sentinel positions by the
    sample sort) are excluded from both the mask and the error conditions.
    Returns (sharded bool mask, replicated uint32 digest triple
    [any, cond_id, first-bad-position] — array order equals global sorted
    order over valid rows, so 'first' matches the single-chip walk;
    ops/groups.fold_err_conditions).
    """
    from ..ops.groups import fold_err_conditions
    from ..ops.keys import cap_lengths, compute_valid_len

    cap = cap_lengths(compute_valid_len(positions, seg_starts, seg_ends), built_k)
    valid = is_pad == jnp.uint32(0)
    mask, errs = flags_fn(words, cap, positions, params)
    mask = mask & valid
    terms = fold_err_conditions(errs, positions, valid=valid)
    if terms:
        return mask, jnp.stack(terms)
    return mask, jnp.zeros(0, dtype=jnp.uint32)


@partial(jax.jit, static_argnames=("n_words", "two_bit", "keep_bits", "mesh"))
def _dist_sizes_digest_jit(
    packed, positions, cap_len, is_pad, min_gs, max_gs, strand_split,
    sorted_words, mask, ext_gid, n_words, two_bit, keep_bits, mesh,
):
    sp = mesh_pspec(mesh)
    fn = shard_map(
        partial(
            _dist_sizes_digest_local,
            n_words=n_words,
            two_bit=two_bit,
            keep_bits=keep_bits,
            axes=mesh_axes(mesh),
        ),
        mesh=mesh,
        # sharded-spec prefixes cover the optional pytrees (sorted_words,
        # mask, ext_gid); None contributes no leaves
        in_specs=(P(), sp, sp, sp, P(), P(), P(), sp, sp, sp),
        out_specs=(sp, sp, P()),
    )
    return fn(packed, positions, cap_len, is_pad, min_gs, max_gs, strand_split,
              sorted_words, mask, ext_gid)


def distributed_group_size_histogram(
    packed: jax.Array,
    sorted_positions: jax.Array,
    seg_starts: jax.Array,
    seg_ends: jax.Array,
    kmer_len: int,
    mesh: Mesh,
    min_group_size: int = 1,
    max_group_size: int | None = None,
    max_counts_bin: int = 1000000,
    packed2: jax.Array | None = None,
    strand_split: int | None = None,
):
    """Group-size histogram + total count over a globally sorted, sharded
    position array. Per-position caps are derived internally from the segment
    extents so they are always aligned with the (sorted) position order.
    Output matches the single-chip ``ops.groups.group_size_histogram``
    exactly. ``strand_split`` (both-strand extension): positions >= it form
    their own groups per strand (track_strands_separately)."""
    limit = 64 if packed2 is not None else 32
    if kmer_len is None or kmer_len > limit:
        raise NotImplementedError(f"distributed stats require kmer_len <= {limit}")
    cap_len = cap_lengths(
        compute_valid_len(sorted_positions, seg_starts, seg_ends), kmer_len
    )
    two_bit = packed2 is not None
    genome = packed2 if two_bit else packed
    n = sorted_positions.shape[0]
    n_dev = mesh_size(mesh)
    n_words = _cdiv(kmer_len, 16 if two_bit else 8)

    positions_p = _pad_to_multiple(sorted_positions, n_dev, _PAD_POS)
    cap_p = _pad_to_multiple(cap_len, n_dev, jnp.uint32(0))
    is_pad = _pad_to_multiple(jnp.zeros(n, dtype=jnp.uint32), n_dev, jnp.uint32(1))

    sharding = NamedSharding(mesh, mesh_pspec(mesh))
    positions_p = put_global(positions_p, sharding)
    cap_p = put_global(cap_p, sharding)
    is_pad = put_global(is_pad, sharding)
    genome = put_global(genome, NamedSharding(mesh, P()))

    # numpy scalars (not device-committed jax arrays): in a multi-process run
    # jit treats them as replicated host constants on every process
    max_gs = np.uint32(max_group_size) if max_group_size is not None else np.uint32(0xFFFFFFF0)
    split = np.uint32(strand_split) if strand_split is not None else np.uint32(0xFFFFFFFF)
    size, qualifies, digest = _dist_sizes_digest_jit(
        genome,
        positions_p,
        cap_p,
        is_pad,
        np.uint32(min_group_size),
        max_gs,
        split,
        None,
        None,
        None,
        n_words,
        two_bit,
        32,
        mesh,
    )
    counts = distributed_hist_from_sizes(size, qualifies, max_counts_bin, mesh)
    return counts, digest[0]


def distributed_group_size_histogram_ragged(
    packed: jax.Array,
    sorted_positions: jax.Array,
    is_pad: jax.Array,
    seg_starts: jax.Array,
    seg_ends: jax.Array,
    kmer_len: int,
    mesh: Mesh,
    min_group_size: int = 1,
    max_group_size: int | None = None,
    max_counts_bin: int = 1000000,
    packed2: jax.Array | None = None,
    strand_split: int | None = None,
    sorted_words=None,
    mask=None,
    return_digest: bool = False,
    return_sizes: bool = False,
    ext_gid=None,
):
    """Device-resident variant of ``distributed_group_size_histogram`` for
    the ragged per-shard-padded layout that
    ``sample_sort_positions_ragged`` returns — the full distributed pipeline
    (sort -> stats) then never leaves the mesh. Group sizes are computed in
    valid-row coordinates, so padding rows may sit at the tail of every
    shard. ``strand_split``: see ``distributed_group_size_histogram``.
    ``sorted_words``: lanes retained by ``sample_sort_positions_ragged(...,
    return_lanes=True)`` on the SAME encoding — the per-shard key re-gather
    is then skipped entirely (kmer_len may be <= the lanes' built length).
    ``mask``: optional sharded filter-survivor mask — group sizes then count
    survivors only, with unfiltered group identity (the mesh analog of the
    single-chip lanes-filtered stats; no compaction, no re-layout).
    ``ext_gid``: precomputed sharded group ids (sample_sort.
    distributed_adjacent_gids / the unbounded sort's converged run ids) —
    the unbounded/beyond-window path: group identity is then the id lane
    alone and ``kmer_len`` may be None."""
    limit = 64 if packed2 is not None else 32
    if ext_gid is None and (kmer_len is None or kmer_len > limit):
        raise NotImplementedError(
            f"distributed stats require kmer_len <= {limit} "
            "(pass ext_gid for unbounded/beyond-window group identity)"
        )
    cap_len = cap_lengths(
        compute_valid_len(sorted_positions, seg_starts, seg_ends), kmer_len
    )
    two_bit = packed2 is not None
    genome = packed2 if two_bit else packed
    bases_per_word = 16 if two_bit else 8
    n_words = 0 if ext_gid is not None else _cdiv(kmer_len, bases_per_word)
    keep_bits = 32
    if sorted_words is not None and ext_gid is None:
        if len(sorted_words) < n_words:
            raise ValueError("sorted_words shorter than kmer_len requires")
        bits = 2 if two_bit else 4
        keep_bits = bits * kmer_len - 32 * (n_words - 1)

    if ext_gid is not None:
        genome = jnp.zeros(1, dtype=jnp.uint32)  # identity never reads it
        sorted_words = None
    genome = put_global(genome, NamedSharding(mesh, P()))
    max_gs = np.uint32(max_group_size) if max_group_size is not None else np.uint32(0xFFFFFFF0)
    split = np.uint32(strand_split) if strand_split is not None else np.uint32(0xFFFFFFFF)
    size, qualifies, digest = _dist_sizes_digest_jit(
        genome,
        sorted_positions,
        cap_len,
        is_pad,
        np.uint32(min_group_size),
        max_gs,
        split,
        sorted_words,
        mask,
        ext_gid,
        n_words,
        two_bit,
        keep_bits,
        mesh,
    )
    if return_sizes:
        # adaptive-histogram stage 1: the caller reads the [total, hi]
        # digest and dispatches distributed_hist_from_sizes at a bin count
        # sized by hi (see kmers._adaptive_hist_to_host)
        return size, qualifies, digest
    counts = distributed_hist_from_sizes(size, qualifies, max_counts_bin, mesh)
    if return_digest:
        # hi = largest clipped bin any qualifying group lands in; hosts can
        # transfer counts[:hi+1] and zero-fill the rest
        return counts, digest[0], jnp.minimum(digest[1], jnp.uint32(max_counts_bin))
    return counts, digest[0]
