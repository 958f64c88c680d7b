"""Segmented group statistics over a sorted k-mer index.

The reference walks the sorted array with a Numba-JIT'd generator, carrying
"previous survivor" state and yielding per completed group
(kmers.py:523-648). On TPU the walk becomes static-shape segmented ops:

    boundary mask  ->  per-element group start (cummax)
                   ->  per-element group end   (reverse cummin of next boundary)
                   ->  size / rank-in-group    (pure arithmetic)
                   ->  histogram               (scatter-add at boundary elements)

Everything is fixed-shape and fully jittable — no data-dependent shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def group_geometry(boundary: jax.Array):
    """Per-element group geometry from a boundary mask (boundary[0] must be True).

    Returns (start, end, size, rank):
        start[i] = index of first element of i's group
        end[i]   = index one past the last element of i's group
        size[i]  = group size (replaces group_size_total, kmers.py:616-625)
        rank[i]  = i's 0-based position within its group
    """
    n = boundary.shape[0]
    idx = jnp.arange(n, dtype=jnp.uint32)
    start = jax.lax.cummax(jnp.where(boundary, idx, jnp.uint32(0)))
    nxt = jnp.where(boundary, idx, jnp.uint32(n))
    nxt_after = jnp.concatenate([nxt[1:], jnp.array([n], dtype=jnp.uint32)])
    end = jax.lax.cummin(nxt_after, reverse=True)
    size = end - start
    rank = idx - start
    return start, end, size, rank


@jax.jit
def group_sizes_at_boundaries(boundary: jax.Array) -> jax.Array:
    """size[i] = group size where boundary[i] is True, else 0 — one reverse
    cummin instead of group_geometry's two scans; the lean input for
    count/histogram queries that never need per-element rank."""
    n = boundary.shape[0]
    idx = jnp.arange(n, dtype=jnp.uint32)
    marked = jnp.where(boundary, idx, jnp.uint32(n))
    nxt = jnp.concatenate([marked[1:], jnp.array([n], dtype=jnp.uint32)])
    next_b = jax.lax.cummin(nxt, reverse=True)
    return jnp.where(boundary, jnp.minimum(next_b, jnp.uint32(n)) - idx, jnp.uint32(0))


# v5e measured (16.7M rows): the scatter-add histogram costs ~177 ms
# regardless of bin count (TPU scatters serialize), while a broadcast-compare
# reduction costs 31/41/103 ms at 32/1024/4096 bins (VPU compares fused into
# the reduce, nothing materialized) — 4-5.7x faster at typical bin counts.
# At 16384 bins the compare loses (559 ms: the N*B sweep stops fusing well),
# so the reference's default max_counts_bin=1e6 stays on the scatter.
_COMPARE_HIST_MAX_BINS = 4096


def clipped_counts(qualifies: jax.Array, clipped: jax.Array, max_counts_bin: int):
    """counts[s] = number of rows with ``qualifies`` and clipped size s.

    ``clipped`` must be uint32 and <= max_counts_bin wherever qualifies is
    True. Picks broadcast-compare or scatter-add by the (static) bin count.
    """
    if max_counts_bin + 1 <= _COMPARE_HIST_MAX_BINS:
        # sentinel never equals a bin id, so non-qualifying rows drop out
        masked = jnp.where(qualifies, clipped, jnp.uint32(0xFFFFFFFF))
        ids = jnp.arange(max_counts_bin + 1, dtype=jnp.uint32)
        return jnp.sum(masked[None, :] == ids[:, None], axis=1, dtype=jnp.uint32)
    counts = jnp.zeros(max_counts_bin + 1, dtype=jnp.uint32)
    return counts.at[clipped.astype(jnp.int32)].add(qualifies.astype(jnp.uint32))


@partial(jax.jit, static_argnames=("max_counts_bin",))
def group_size_histogram(
    boundary: jax.Array,
    size: jax.Array,
    min_group_size,
    max_group_size,
    max_counts_bin: int,
):
    """Histogram of group sizes + total k-mer count over qualifying groups.

    counts[s] = number of groups of size s (sizes > max_counts_bin clip into
    the top bin, reference kmers.py:514-518); only groups with
    min_group_size <= size <= max_group_size contribute (kmers.py:612-614).
    max_group_size is passed as a huge sentinel when None.
    """
    qualifies = boundary & (size >= min_group_size) & (size <= max_group_size)
    clipped = jnp.minimum(size, jnp.uint32(max_counts_bin))
    counts = clipped_counts(qualifies, clipped, max_counts_bin)
    # uint32 accumulation is exact here by construction: this single-chip
    # engine only ever sees < 2^31 rows (int32 gather bound in ops/keys.py),
    # so total <= num_kmers < 2^31. Workloads past that bound go through the
    # 64-bit pair-lane engine (parallel/large.py), never through this sum.
    total = jnp.sum(jnp.where(qualifies, size, jnp.uint32(0)), dtype=jnp.uint32)
    return counts, total


# --------------------------------------------------------------------------- #
# adaptive histogram (two-stage): at large max_counts_bin (the reference's
# 1e6 default) the scatter-add histogram costs ~150-190 ms/16.7M rows on
# v5e regardless of how many bins are actually hit, while the broadcast-
# compare form costs ~30-100 ms up to 4096 bins. Stage 1 computes the
# qualifying mask and a [total, hi] digest (hi = largest qualifying group
# size); the host reads the 8-byte digest and dispatches stage 2 at a
# pow2-bucketed bin count: broadcast-compare when hi fits (the common case
# — most genomes' largest k-mer group is far below 4096), scatter-add
# otherwise. Net: one extra dispatch, same number of transfers (the digest
# transfer replaces the stats transfer the trimmed download already paid).
# --------------------------------------------------------------------------- #


# speculative stage-2 bin count: stage 1 appends a histogram clipped at this
# many bins to its digest (~1 KB — rides the same transfer). The speculative
# result is EXACT whenever max_counts_bin <= _SPEC_HIST_BINS (folding bins
# above the user clip into the top bin is clip-order-independent) OR no
# qualifying group exceeds it (hi <= _SPEC_HIST_BINS); only then-rare cases
# pay a second dispatch. This makes the common histogram query ONE dispatch
# + ONE small transfer — on a remote-tunnel backend (~31 ms/transfer) the
# two-transfer adaptive form was transfer-bound.
_SPEC_HIST_BINS = 256


def _qualify_digest(boundary, size, min_group_size, max_group_size):
    qualifies = (
        boundary & (size >= min_group_size) & (size <= max_group_size)
    )
    total = jnp.sum(jnp.where(qualifies, size, jnp.uint32(0)), dtype=jnp.uint32)
    hi = jnp.max(jnp.where(qualifies, size, jnp.uint32(0)))
    spec = clipped_counts(
        qualifies, jnp.minimum(size, jnp.uint32(_SPEC_HIST_BINS)), _SPEC_HIST_BINS
    )
    return qualifies, jnp.concatenate([jnp.stack([total, hi]), spec])


@jax.jit
def sizes_digest(boundary, size, min_group_size, max_group_size):
    """Stage 1 over a precomputed (boundary, size) pair."""
    return _qualify_digest(boundary, size, min_group_size, max_group_size)


@partial(jax.jit, static_argnames=("two_bit",))
def lanes_sizes_digest(words, cap, kmer_len, min_group_size, max_group_size, two_bit):
    """Stage 1 fused over retained sorted key lanes: boundary + sizes +
    qualifying mask + digest in one program; sizes/qualifies stay device-
    resident for stage 2."""
    from .sort import boundaries_from_sorted_lanes

    boundary = boundaries_from_sorted_lanes(words, cap, kmer_len, two_bit)
    size = group_sizes_at_boundaries(boundary)
    qualifies, digest = _qualify_digest(boundary, size, min_group_size, max_group_size)
    return size, qualifies, digest


def adaptive_bin_count(hi: int, max_counts_bin: int) -> int:
    """Stage-2 device bin count: pow2-bucketed by the histogram's true
    nonzero range min(hi, user clip) — the broadcast-compare form — falling
    back to the pow2-bucketed user bin count (the scatter form) past the
    compare range. ONE policy for the uint32, canonical, mesh, and 64-bit
    engines, so a re-measured compare-vs-scatter crossover changes all of
    them together."""
    bins = 32
    target = min(hi, max_counts_bin) + 1
    while bins < target:
        bins *= 2
    if bins > _COMPARE_HIST_MAX_BINS:
        bins = 1024
        while bins < max_counts_bin + 1:
            bins *= 2
    return bins - 1


@partial(jax.jit, static_argnames=("max_counts_bin",))
def hist_from_sizes(size, qualifies, max_counts_bin: int):
    """Stage 2: histogram of qualifying sizes clipped at ``max_counts_bin``
    (compare-vs-scatter picked by the static bin count, see clipped_counts)."""
    clipped = jnp.minimum(size, jnp.uint32(max_counts_bin))
    return clipped_counts(qualifies, clipped, max_counts_bin)


@jax.jit
def group_total_count(boundary: jax.Array, size: jax.Array, min_group_size, max_group_size):
    """Total k-mers in qualifying groups — the reduce-only sibling of
    ``group_size_histogram`` for count queries that never read the
    histogram (the scatter-add is ~147 ms/16.7M rows on v5e regardless of
    bin count; a sum is essentially free)."""
    qualifies = boundary & (size >= min_group_size) & (size <= max_group_size)
    return jnp.sum(jnp.where(qualifies, size, jnp.uint32(0)), dtype=jnp.uint32)


@partial(jax.jit, static_argnames=("two_bit",))
def lanes_group_total(words, cap, min_group_size, max_group_size, kmer_len, two_bit):
    """Reduce-only sibling of ``lanes_sizes_digest`` for count queries."""
    from .sort import boundaries_from_sorted_lanes

    boundary = boundaries_from_sorted_lanes(words, cap, kmer_len, two_bit)
    size = group_sizes_at_boundaries(boundary)
    return group_total_count(boundary, size, min_group_size, max_group_size)


@jax.jit
def survivor_sizes_at_boundaries(boundary: jax.Array, mask: jax.Array) -> jax.Array:
    """surv[i] = number of filter survivors in i's group where boundary[i] is
    True, else 0 — the filtered analog of ``group_sizes_at_boundaries``.

    In a sorted index equal k-mers are contiguous, so the reference's
    "compare each survivor to the previous survivor" walk (kmers.py:597-601)
    partitions survivors exactly as the all-rows groups do; a group's
    survivor count is then a cumsum difference over its extent. This keeps
    filtered statistics fully on device — no survivor compaction, no mask
    download, no index upload (measured ~5 N bytes of round-trip saved per
    filtered query). Groups with zero survivors never existed for the walk:
    callers must require surv >= 1 to qualify.
    """
    # gather-free: survivors-before-row (exclusive cumsum) is non-decreasing,
    # so its value at each group's END (= the next boundary row, or n)
    # propagates backward with one reverse cummin — TPU gathers cost
    # ~150 ms/16.7M rows, scans are ~10x cheaper
    m = mask.astype(jnp.uint32)
    ci = jnp.cumsum(m)
    ce_excl = ci - m  # survivors strictly before each row
    total = ci[-1:]
    marked = jnp.where(boundary, ce_excl, jnp.uint32(0xFFFFFFFF))
    nxt = jnp.concatenate([marked[1:], total])
    end_c = jax.lax.cummin(nxt, reverse=True)
    return jnp.where(boundary, end_c - ce_excl, jnp.uint32(0))


def fold_err_conditions(errs, positions, valid=None):
    """Fold the filter's error conditions to a fixed 3-term digest
    ``[any, cond_id, first_bad_position]`` naming the single EARLIEST
    offending row in array (sorted) order — the row the reference's
    sequential walk would raise at — with ties at one row broken by
    condition-list order (= the scalar filter's per-row check order).
    Empty ``errs`` folds to an empty list. ``valid`` optionally excludes
    rows (ragged pads) from every condition."""
    if not errs:
        return []
    sentinel = jnp.uint32(0xFFFFFFFF)
    best_row = sentinel
    best_cond = jnp.zeros((), jnp.uint32)
    best_pos = jnp.zeros((), jnp.uint32)
    any_err = jnp.zeros((), jnp.uint32)
    for idx, cond in enumerate(errs):
        cond = jnp.broadcast_to(cond, positions.shape)
        if valid is not None:
            cond = cond & valid
        has = jnp.any(cond)
        first = jnp.argmax(cond)
        row = jnp.where(has, first.astype(jnp.uint32), sentinel)
        take = row < best_row  # strict: the earlier-checked condition wins ties
        best_cond = jnp.where(take, jnp.uint32(idx), best_cond)
        best_pos = jnp.where(take, jnp.take(positions, first), best_pos)
        best_row = jnp.where(take, row, best_row)
        any_err = any_err | has.astype(jnp.uint32)
    return [any_err, best_cond, best_pos]


def _lanes_filtered_core(
    words, cap, positions, params, flags_fn, kmer_len, two_bit, strand_split
):
    """(boundary, survivor sizes, err digest terms) shared by the fused
    lanes-filtered kernels. ``flags_fn`` evaluates the filter directly on the
    retained sorted key lanes (ops/filters lanes flags — zero genome
    gathers); err conditions fold to the [any, cond_id, first-bad-position]
    triple (``fold_err_conditions``) that rides home inside the stats
    digest, replacing the plane path's 1-2 extra host syncs per query.
    ``strand_split`` is a traced position threshold
    (track_strands_separately) — the 0xFFFFFFF0 sentinel disables it
    branchlessly."""
    from .sort import boundaries_from_sorted_lanes

    mask, errs = flags_fn(words, cap, positions, params)
    boundary = boundaries_from_sorted_lanes(words, cap, kmer_len, two_bit)
    is_rc = positions >= strand_split
    prev_rc = jnp.concatenate([is_rc[:1], is_rc[:-1]])
    boundary = boundary | (is_rc != prev_rc)
    surv = survivor_sizes_at_boundaries(boundary, mask)
    return boundary, surv, fold_err_conditions(errs, positions)


@partial(jax.jit, static_argnames=("two_bit", "flags_fn"))
def lanes_filtered_sizes_digest(
    words, cap, positions, params, kmer_len, min_group_size, max_group_size,
    strand_split, two_bit, flags_fn,
):
    """Stage 1 of the adaptive histogram for the lanes-filtered path:
    survivor sizes + qualifying mask + digest [total, hi,
    speculative counts (_SPEC_HIST_BINS + 1), err triple
    (any, cond_id, first_bad_pos)] in one fused program."""
    boundary, surv, err_terms = _lanes_filtered_core(
        words, cap, positions, params, flags_fn, kmer_len, two_bit, strand_split
    )
    qualifies, digest = _qualify_digest(
        boundary, surv, jnp.maximum(min_group_size, jnp.uint32(1)), max_group_size
    )
    if err_terms:
        digest = jnp.concatenate([digest, jnp.stack(err_terms)])
    return surv, qualifies, digest


@partial(jax.jit, static_argnames=("two_bit", "flags_fn"))
def lanes_filtered_total(
    words, cap, positions, params, kmer_len, min_group_size, max_group_size,
    strand_split, two_bit, flags_fn,
):
    """Reduce-only sibling of ``lanes_filtered_sizes_digest`` for count
    queries. Digest: [total, err triple (any, cond_id, first_bad_pos)]."""
    boundary, surv, err_terms = _lanes_filtered_core(
        words, cap, positions, params, flags_fn, kmer_len, two_bit, strand_split
    )
    qualifies = (
        boundary
        & (surv >= jnp.maximum(min_group_size, jnp.uint32(1)))
        & (surv <= max_group_size)
    )
    total = jnp.sum(jnp.where(qualifies, surv, jnp.uint32(0)), dtype=jnp.uint32)
    return jnp.stack([total] + err_terms)


@jax.jit
def filtered_sizes_digest(boundary, mask, min_group_size, max_group_size):
    """Stage 1 of the adaptive histogram for the plane/window filtered path:
    survivor sizes + qualifying mask + [total, hi] digest."""
    surv = survivor_sizes_at_boundaries(boundary, mask)
    qualifies, digest = _qualify_digest(
        boundary, surv, jnp.maximum(min_group_size, jnp.uint32(1)), max_group_size
    )
    return surv, qualifies, digest


@jax.jit
def filtered_group_total(boundary: jax.Array, mask: jax.Array, min_group_size, max_group_size):
    """Total survivors in qualifying groups — reduce-only filtered sibling."""
    surv = survivor_sizes_at_boundaries(boundary, mask)
    qualifies = (
        boundary
        & (surv >= jnp.maximum(min_group_size, jnp.uint32(1)))
        & (surv <= max_group_size)
    )
    return jnp.sum(jnp.where(qualifies, surv, jnp.uint32(0)), dtype=jnp.uint32)


@jax.jit
def selection_masks(
    boundary: jax.Array,
    size: jax.Array,
    rank: jax.Array,
    min_group_size,
    max_group_size,
    yield_first_n,
):
    """Which elements the reference generator would yield, plus per-element
    (group_size_yielded, group_size_total).

    yield_first_n is passed as a huge sentinel when None. Matches
    kmers.py:604-625: yield the first n group members (in sorted order) of
    every group whose total size is within bounds.
    """
    in_bounds = (size >= min_group_size) & (size <= max_group_size)
    yielded = in_bounds & (rank < yield_first_n)
    group_size_yielded = jnp.minimum(size, yield_first_n.astype(jnp.uint32))
    return yielded, group_size_yielded
