"""Kmers: the L3 k-mer analysis engine (TPU-native re-design).

API- and output-compatible with the reference class (reference:
kmers.py:651-1737), with the compute path re-architected for TPU:

  * ``sort()`` — the reference instantiates a Numba quicksort around a
    byte-compare closure (kmers.py:1624-1652). Here the whole stack collapses
    into: packed 4-bit rank keys -> ``jax.lax.sort`` over key words + position
    (ops/sort.py). Output order equals the reference's ``break_ties=True``
    mode (deterministic) and is string-identical to its default mode.
  * group statistics — the reference's sequential JIT'd generator walk
    (kmers.py:523-648) becomes vectorized segmented ops (ops/groups.py).
  * filters — vectorized masks (ops/filters.py) with scalar parity fallbacks.

Free functions below (`compare_sba_kmers_lexicographically`,
`kmer_info_by_group_generator`, `get_kmer_group_size_hist`, ...) mirror the
reference's module-level kernel API exactly; they are host-side parity
implementations used by tests and as a fully general fallback when a caller
supplies custom comparison/filter/info callables the vectorized engine does
not recognize.
"""

from __future__ import annotations

import shelve
from pathlib import Path
from typing import Callable, Generator, Union

import numpy as np

from .ops.filters import (  # noqa: F401  (re-exported reference API)
    FilterContext,
    KmerFilter,
    crispr_ngg_pam_filter,
    gen_kmer_gc_content_filter_func,
    gen_kmer_homopolymer_filter_func,
    gen_kmer_length_filter_func,
    gen_no_ambiguous_bases_filter,
    kmer_filter_keep_all,
    kmer_has_required_len,
)
from .sequence_collection import SequenceCollection

_DOLLAR = ord("$")

# index size at which the arbitrary-callable filter path (a per-position
# Python loop) warns and points at VectorizedFilter; module-level so tests
# can lower it without walking a million positions
_CALLABLE_WARN_THRESHOLD = 1_000_000


# --------------------------------------------------------------------------- #
# comparison kernels (host parity versions of reference kmers.py:262-397)
# --------------------------------------------------------------------------- #


_CMP_CHUNK = 64


def _terminator_offset(chunk: np.ndarray, want: int) -> Union[int, None]:
    """Offset of the first k-mer terminator within ``chunk`` (a '$' byte, or
    the array end if the slice came back short of ``want``); None if the
    chunk is clean."""
    hits = np.flatnonzero(chunk == _DOLLAR)
    if hits.size:
        return int(hits[0])
    if chunk.shape[0] < want:
        return chunk.shape[0]
    return None


def compare_sba_kmers_lexicographically(
    sba_a,
    sba_b,
    kmer_sba_start_idx_a: int,
    kmer_sba_start_idx_b: int,
    max_kmer_len: Union[int, None] = None,
) -> tuple[int, int]:
    """Host-side lexicographic k-mer compare with the '$'/array-end => smaller
    rule; behavior (including the no-valid-bases AssertionError) matches the
    reference comparator (reference kmers.py:306-397).

    Returns (comparison in {-1, 0, 1}, last_kmer_index_compared). The
    decision is derived from two scan results rather than a byte-at-a-time
    walk: t = offset of the nearest terminator on either side, d = offset of
    the first byte difference. A terminator at t decides whenever
    t <= min(d, max_kmer_len - 1); otherwise a difference at d < max_kmer_len
    decides; otherwise the compare cap does. Bytes are scanned a numpy chunk
    at a time, so the common early-mismatch case touches one small slice.

    The TPU compute path never calls this — packed keys reproduce it
    wholesale (ops/encoding.py) — but tests and the generic fallback walk do.
    """
    arr_a = np.asarray(sba_a)
    arr_b = np.asarray(sba_b)
    # None = compare to the segment end; a non-positive cap never trips the
    # reference's `kmer_idx == max_kmer_len - 1` break, i.e. it is unbounded
    cap = max_kmer_len if (max_kmer_len is None or max_kmer_len >= 1) else None

    scanned = 0
    term_at = None  # (offset, a_terminated, b_terminated)
    diff_at = None  # (offset, sign)
    while term_at is None and diff_at is None:
        if cap is not None and scanned >= cap:
            break
        want = _CMP_CHUNK if cap is None else min(_CMP_CHUNK, cap - scanned)
        lo_a = kmer_sba_start_idx_a + scanned
        lo_b = kmer_sba_start_idx_b + scanned
        chunk_a = arr_a[lo_a : lo_a + want]
        chunk_b = arr_b[lo_b : lo_b + want]
        t_a = _terminator_offset(chunk_a, want)
        t_b = _terminator_offset(chunk_b, want)
        if t_a is not None or t_b is not None:
            t = min(x for x in (t_a, t_b) if x is not None)
            term_at = (scanned + t, t_a == t, t_b == t)
        span = min(chunk_a.shape[0], chunk_b.shape[0])
        unequal = np.flatnonzero(chunk_a[:span] != chunk_b[:span])
        if unequal.size:
            d = int(unequal[0])
            sign = -1 if chunk_a[d] < chunk_b[d] else 1
            diff_at = (scanned + d, sign)
        scanned += want

    horizon = cap - 1 if cap is not None else None
    if term_at is not None and (diff_at is None or term_at[0] <= diff_at[0]):
        t, a_ends, b_ends = term_at
        if horizon is None or t <= horizon:
            if t == 0:
                raise AssertionError("There were no valid kmer bases to compare")
            return (0 if a_ends == b_ends else (-1 if a_ends else 1)), t - 1
        return 0, horizon
    if diff_at is not None and (horizon is None or diff_at[0] <= horizon):
        return diff_at[1], diff_at[0]
    return 0, horizon


class _AlwaysLessThanComparator:
    """Unsorted-path comparator: every k-mer its own group (reference
    kmers.py:295-303)."""

    def __call__(self, sba_a, sba_b, idx_a, idx_b, max_kmer_len=None):
        return -1, 0


compare_sba_kmers_always_less_than = _AlwaysLessThanComparator()


class _FixedLenComparator:
    """Comparator with max_kmer_len bound (reference kmers.py:285-292). The
    vectorized engine recognizes instances by their ``kmer_len`` attribute."""

    def __init__(self, kmer_len):
        self.kmer_len = kmer_len

    def __call__(self, sba_a, sba_b, idx_a, idx_b):
        return compare_sba_kmers_lexicographically(
            sba_a, sba_b, idx_a, idx_b, max_kmer_len=self.kmer_len
        )


def get_compare_sba_kmers_func(kmer_len) -> _FixedLenComparator:
    """Reference kmers.py:285-292."""
    return _FixedLenComparator(kmer_len)


def get_kmer_info_minimal(
    kmer_num, kmer_sba_start_indices, sba, kmer_len, group_size_yielded, group_size_total
):
    """Reference kmers.py:400-425."""
    return kmer_num, group_size_yielded, group_size_total


def get_kmer_info_group_size_only(
    kmer_num, kmer_sba_start_indices, sba, kmer_len, group_size_yielded, group_size_total
):
    """Reference kmers.py:428-451."""
    return group_size_total


# --------------------------------------------------------------------------- #
# generic group walk (host fallback; exact reference semantics)
# --------------------------------------------------------------------------- #


def _check_group_bounds(min_group_size, max_group_size, yield_first_n) -> None:
    """Shared validation for the group-walk APIs (error strings are part of
    the public contract — reference kmers.py:552-562)."""
    if min_group_size < 1:
        raise ValueError(f"min_group_size ({min_group_size}) must be >= 1")
    if max_group_size is not None and max_group_size < min_group_size:
        raise ValueError(
            f"if max_group_size ({max_group_size}) is specified, it must be >= min_group_size ({min_group_size})"
        )
    if yield_first_n is not None and yield_first_n < 1:
        raise ValueError(f"if yield_first_n ({yield_first_n}) is specified, it must be > 0")


def _group_qualifies(size: int, min_group_size, max_group_size) -> bool:
    return size >= min_group_size and (max_group_size is None or size <= max_group_size)


def _iter_filter_survivors(sba, sba_strand, kmer_start_indices, keep):
    """Stream of (kmer_num, sba_start_idx) for every k-mer passing ``keep``
    — the lazy equivalent of the vectorized engine's survivor mask."""
    for kmer_num in range(len(kmer_start_indices)):
        sba_idx = int(kmer_start_indices[kmer_num])
        if keep(sba, sba_strand, sba_idx):
            yield kmer_num, sba_idx


def _iter_equal_runs(survivors, sba, same_key, head_limit):
    """Collapse a survivor stream into (head_members, run_size) tuples.

    A run is a maximal stretch of adjacent survivors whose pairwise
    comparison (``same_key``, previous survivor vs current) returns equal —
    the streaming mirror of ops/sort.adjacent_boundaries. Only the first
    ``head_limit`` member kmer_nums are retained per run (None = all);
    ``run_size`` always counts every member.
    """
    head: list[int] = []
    run_size = 0
    anchor_idx = None
    for kmer_num, sba_idx in survivors:
        if run_size and same_key(sba, sba, anchor_idx, sba_idx)[0] != 0:
            yield head, run_size
            head, run_size = [], 0
        if head_limit is None or len(head) < head_limit:
            head.append(kmer_num)
        run_size += 1
        anchor_idx = sba_idx
    if run_size:
        yield head, run_size


def kmer_info_by_group_generator(
    sba,
    sba_strand,
    kmer_len,
    kmer_start_indices,
    kmer_comparison_func,
    kmer_filter_func,
    kmer_info_func,
    min_group_size: int = 1,
    max_group_size: Union[int, None] = None,
    yield_first_n: Union[int, None] = None,
) -> Generator[tuple, None, None]:
    """Host generator over k-mer groups, output-identical to the reference's
    JIT'd group walk (reference kmers.py:523-648) but built as a two-stage
    stream: filter survivors -> collapse into equal-key runs -> emit
    ``kmer_info_func`` for (up to yield_first_n) members of each run whose
    size is within [min_group_size, max_group_size].

    The Kmers methods use the vectorized segmented-op engine instead whenever
    the supplied callables are the library's own; this stream is the fully
    general escape hatch for arbitrary user callables. It stays lazy: a run
    is emitted as soon as the first survivor beyond it is seen, and filter/
    comparator exceptions surface at the same iteration point they would in
    the reference.
    """
    _check_group_bounds(min_group_size, max_group_size, yield_first_n)

    runs = _iter_equal_runs(
        _iter_filter_survivors(sba, sba_strand, kmer_start_indices, kmer_filter_func),
        sba,
        kmer_comparison_func,
        yield_first_n,
    )
    for head, run_size in runs:
        if not _group_qualifies(run_size, min_group_size, max_group_size):
            continue
        for member in head:
            yield kmer_info_func(
                member, kmer_start_indices, sba, kmer_len, len(head), run_size
            )


def get_kmer_group_size_hist(
    sba,
    sba_strand,
    kmer_len,
    kmer_start_indices,
    kmer_comparison_func,
    kmer_filter_func,
    min_group_size: int = 1,
    max_group_size: Union[int, None] = None,
    max_counts_bin: int = 1000000,
) -> tuple[np.ndarray, int]:
    """Histogram of group sizes + total k-mer count over the host group walk
    (same outputs as reference kmers.py:454-520). Consumes the run stream
    directly — a histogram needs sizes, not member yields.
    Kmers.get_kmer_group_counts uses the device engine instead; this free
    function keeps the reference kernel API."""
    if max_counts_bin <= 0:
        raise ValueError(f"max_counts_bin ({max_counts_bin}) must be >= 1")
    _check_group_bounds(min_group_size, max_group_size, None)

    counts_by_group_size = np.zeros((max_counts_bin + 1,), dtype=np.int64)
    total_kmer_count = 0
    runs = _iter_equal_runs(
        _iter_filter_survivors(sba, sba_strand, kmer_start_indices, kmer_filter_func),
        sba,
        kmer_comparison_func,
        head_limit=1,
    )
    for _head, run_size in runs:
        if _group_qualifies(run_size, min_group_size, max_group_size):
            counts_by_group_size[min(run_size, max_counts_bin)] += 1
            total_kmer_count += run_size
    return counts_by_group_size, total_kmer_count


# --------------------------------------------------------------------------- #
# Kmers
# --------------------------------------------------------------------------- #

_UINT32_SENTINEL = np.uint32(0xFFFFFFF0)


def _pow2_bucket(n: int) -> int:
    """Round up to a power of two (min 8) — bounds the number of distinct
    slice shapes (=> compiled executables) the trimmed download can create."""
    b = 8
    while b < n:
        b *= 2
    return b


def _trimmed_hist_to_host(counts_dev, stats_dev, max_counts_bin: int, device_bin=None):
    """Materialize a device histogram on host, transferring only the prefix
    that can be nonzero.

    ``stats_dev`` is the uint32 ``[total, hi]`` digest (see
    ``ops.groups.sizes_digest``): every bin above ``hi`` is
    zero by construction, so only ``counts[:hi+1]`` (power-of-two bucketed)
    crosses the device->host link. At the reference's default
    ``max_counts_bin=1e6`` this replaces a ~4 MB transfer with a few KB —
    ~1 s saved per call on a remote-tunnel backend (~4 MB/s measured).

    ``device_bin``: the bucketed bin count the device actually clipped at
    (ops/groups.adaptive_bin_count); transferred bins past the user's
    ``max_counts_bin`` fold into the top bin, reproducing the reference's
    clipping exactly (reference kmers.py:514-518).
    """
    dev_mcb = max_counts_bin if device_bin is None else device_bin
    st = np.asarray(stats_dev)
    total = int(st[0])
    hi = int(st[1])
    b = min(_pow2_bucket(hi + 1), dev_mcb + 1)
    buf = np.asarray(counts_dev[:b]).astype(np.int64)
    out = np.zeros(max_counts_bin + 1, dtype=np.int64)
    if b > max_counts_bin + 1:
        out[:] = buf[: max_counts_bin + 1]
        out[max_counts_bin] += buf[max_counts_bin + 1 :].sum()
    else:
        out[:b] = buf
    return out, total


class _DistIndexCache:
    """Device-resident distributed index retained by ``sort(mesh=...)``:
    the globally sorted positions in the ragged per-shard-padded layout
    (``sample_sort_positions_ragged``), so a following mesh statistics or
    query call composes on-device — one sort + one stats pass across the
    pipeline, no host round trip and no re-sort. ``lanes``/``lanes_two_bit``
    optionally hold the sorted word lanes + their encoding so statistics
    skip the per-shard key re-gather (mesh analog of the single-chip
    retained-lane path)."""

    def __init__(self, mesh, positions, is_pad, n_real: int,
                 lanes=None, lanes_two_bit=None, built_k=None,
                 gid_full=None, gid_full_k=None):
        self.mesh = mesh
        self.positions = positions
        self.is_pad = is_pad
        self.n_real = n_real
        self.lanes = lanes
        self.lanes_two_bit = lanes_two_bit
        self.built_k = built_k
        # converged refinement run ids at gid_full_k-base identity (None =
        # suffix) — retained by the unbounded mesh sort so kmer_len-matching
        # stats reuse them with zero refinement rounds
        self.gid_full = gid_full
        self.gid_full_k = gid_full_k


class Kmers:
    """Memory-efficient k-mer calculations on a genome, TPU-accelerated.

    Constructor arguments, validation, and error behavior match the reference
    (kmers.py:656-760), including the v1.0.1 restrictions
    (track_strands_separately / non-forward source_strand / init-time
    kmer_filters / double_pass raise NotImplementedError).
    """

    def __init__(
        self,
        seq_coll: Union[SequenceCollection, None] = None,
        min_kmer_len: int = 1,
        max_kmer_len: Union[int, None] = None,
        source_strand: str = "forward",
        track_strands_separately: bool = False,
        method: str = "single_pass",
    ) -> None:
        if track_strands_separately:
            raise NotImplementedError(
                f"This function has not been implemented for track_strands_separately = '{track_strands_separately}'"
            )
        if source_strand != "forward":
            raise NotImplementedError(
                f"This function has not been implemented for source_strand = '{source_strand}'"
            )
        self._construct(
            seq_coll, min_kmer_len, max_kmer_len, source_strand,
            track_strands_separately, method,
        )

    @classmethod
    def from_strand(
        cls,
        seq_coll: Union[SequenceCollection, None] = None,
        min_kmer_len: int = 1,
        max_kmer_len: Union[int, None] = None,
        source_strand: str = "forward",
        track_strands_separately: bool = False,
        method: str = "single_pass",
        kmer_filters: list = (),
    ) -> "Kmers":
        """EXTENSION: construct a Kmers over a chosen strand for real.

        The reference declares ``source_strand`` / ``track_strands_separately``
        but hard-fails for anything non-forward (reference kmers.py:689-696),
        and the plain constructor here preserves those errors for parity.
        This classmethod implements them:

        - ``source_strand="reverse_complement"``: the k-mer index enumerates,
          sorts, and groups the k-mers of the reverse-complement SBA (which
          the SequenceCollection already maintains) exactly as the forward
          index does for the forward SBA — all query/statistics methods work.
        - ``source_strand="both"``: one index over the k-mers of BOTH
          strands, built on a virtual concatenated SBA
          (``forward + '$' + revcomp`` — SequenceCollection.both_concat_arrays),
          which turns the two-strand problem into an ordinary 2R-segment
          single-SBA problem for the whole sort/group/filter/query engine.
          Positions below ``len(forward_sba)`` are "+" k-mers; positions
          above are "-" k-mers. Equal k-mer strings from the two strands
          share a group by default; with ``track_strands_separately=True``
          group identity additionally includes the strand (within an
          equal-string run the position tie-break already orders all "+"
          entries before all "-" entries, so strand-split groups stay
          contiguous — the split is one extra term in the boundary mask,
          not an extra sort pass).

        It also implements the two init surfaces the reference declares but
        raises on (reference kmers.py:775-781):

        - ``kmer_filters``: filters applied at INIT time — the index holds
          only the surviving positions (the reference's planned
          filter-in-place step, kmers.py:833). Library filters evaluate as
          one vectorized mask; arbitrary reference-signature callables take
          the host loop. The plain constructor's internal-path errors stay.
        - ``method="double_pass"``: the reference's declared lower-memory
          init — count the surviving k-mers per record first, then fill an
          exactly-sized array — implemented with per-record chunked filter
          evaluation, so the unfiltered index is never materialized whole.
          Output is identical to ``single_pass``.
        """
        self = cls.__new__(cls)
        self._construct(
            seq_coll, min_kmer_len, max_kmer_len, source_strand,
            track_strands_separately, method, kmer_filters=kmer_filters,
            init_extension=True,
        )
        self._strand_extension = source_strand != "forward"
        return self

    def _construct(
        self,
        seq_coll,
        min_kmer_len,
        max_kmer_len,
        source_strand,
        track_strands_separately,
        method,
        kmer_filters=(),
        init_extension=False,
    ) -> None:
        self._strand_extension = False
        if source_strand not in ("forward", "reverse_complement", "both"):
            raise ValueError(f"source_strand ({source_strand}) not recognized")
        if source_strand != "both" and track_strands_separately:
            raise ValueError(
                f"track_strands_separately can only be true if source_strand is 'both', but it is '{source_strand}'"
            )
        if min_kmer_len < 1:
            raise ValueError(f"min_kmer_len ({min_kmer_len}) must be greater than zero")
        if max_kmer_len is not None:
            if max_kmer_len < 1:
                raise ValueError(f"max_kmer_len ({max_kmer_len}) must be greater than zero")
            if min_kmer_len is not None and max_kmer_len < min_kmer_len:
                raise ValueError(
                    f"max_kmer_len ({max_kmer_len}) is less than min_kmer_len ({min_kmer_len})"
                )

        self.min_kmer_len = min_kmer_len
        self.max_kmer_len = max_kmer_len
        self.kmer_source_strand = source_strand
        self.track_strands_separately = track_strands_separately

        self._is_initialized = False
        self._is_set = False
        self._is_sorted = False
        # The index lives in two synchronized homes: a host uint32 array and
        # a device array. Either may be materialized lazily from the other,
        # so a sort -> device-stats pipeline never round-trips through host
        # memory (kmer_sba_start_indices stays API-compatible via property).
        self._pos_host = None
        self._pos_dev = None
        self._init_geometry = None
        self._dist_cache = None
        self._lanes_cache = None
        self._suffix_gid_cache = None
        # canonical construction guarantees valid_len >= min_kmer_len for
        # every index position; a user-assigned position set may not — the
        # setter marks it unknown (None) and _cap_covers_min_k verifies
        # against the data once, on demand (the CRISPR PAM lanes fast path
        # depends on the invariant; see ops/filters.CrisprNggPamFilter)
        self._cap_cover_ok = True

        if seq_coll is None:
            return

        seq_lengths = []
        min_seq_len = None
        num_records = 0
        # "both": record lengths are strand-symmetric, so validate on the
        # forward segments (iter_records needs an explicit strand then).
        # For extension construction the strand-match check moves ahead of
        # the iteration so ANY mismatched collection fails with the
        # reference's message instead of iter_records' internal error; the
        # plain constructor keeps the reference's exact error order.
        if (source_strand == "both" or init_extension) and (
            seq_coll.strands_loaded() != source_strand
        ):
            raise ValueError(
                f"source_strand ({source_strand}) does not match sequence_collection loaded strand ({seq_coll.strands_loaded()})"
            )
        records_it = (
            seq_coll.iter_records("forward")
            if source_strand == "both"
            else seq_coll.iter_records()
        )
        for _, s, e in records_it:
            seq_length = e - s + 1
            seq_lengths.append(seq_length)
            if min_seq_len is None or seq_length < min_seq_len:
                min_seq_len = seq_length
            num_records += 1

        if num_records == 0:
            raise ValueError("sequence_collection is empty")
        if min_kmer_len is not None and min_kmer_len > min_seq_len:
            raise ValueError(
                f"min_kmer_len ({min_kmer_len}) must be <= the shortest sequence length ({min_seq_len})"
            )
        if seq_coll.strands_loaded() != source_strand:
            raise ValueError(
                f"source_strand ({source_strand}) does not match sequence_collection loaded strand ({seq_coll.strands_loaded()})"
            )

        self.seq_coll = seq_coll
        self._initialize(
            kmer_filters=list(kmer_filters), method=method, extension=init_extension
        )

    # ------------------------------------------------------------------ #
    # initialization
    # ------------------------------------------------------------------ #

    def _initialize(self, kmer_filters=[], method: str = "single_pass", extension=False):
        # the reference's internal-path errors stay for plain construction
        # (reference kmers.py:775-781); from_strand() passes extension=True
        # and gets both surfaces for real
        if kmer_filters != [] and not extension:
            raise NotImplementedError("kmer_filters have not been implemented")
        if method == "double_pass":
            if not extension:
                raise NotImplementedError(f"method '{method}' has not been implemented")
            self._initialize_double_pass(kmer_filters=kmer_filters)
        elif method == "single_pass":
            self._initialize_single_pass(kmer_filters=kmer_filters, extension=extension)
        else:
            raise ValueError(f"method '{method}' not recognized")
        self._is_initialized = True

    def _initialize_single_pass(self, kmer_filters=[], extension=False):
        """Equivalent of the reference's per-record np.arange fill
        (kmers.py:789-835): every k-mer start position in
        [seg_start, seg_end - min_kmer_len + 1] per record.

        Only the O(records) geometry is stored here; the index array itself
        is built lazily — directly ON DEVICE for the compute path (a
        searchsorted + two gathers, no multi-GB host->device upload), or on
        host when ``kmer_sba_start_indices`` is read.

        With init-time ``kmer_filters`` (from_strand extension) this is the
        reference's declared single-pass strategy (kmers.py:789-793):
        materialize every unfiltered position, mask once, compact — faster
        than double_pass but with the full-size temporary."""
        if kmer_filters != [] and not extension:
            raise NotImplementedError("kmer_filters have not been implemented")

        num_kmers = self._get_unfiltered_kmer_count()
        if num_kmers > 2**32 - 1:
            # Parity: the reference's hard ceiling (reference kmers.py:805-808).
            # Beyond it, use the 64-bit regime: genome_kmers_tpu.LargeKmers
            # (strided packs + (hi, lo) position pairs, exact past 2^32
            # coordinates; ops/large.py + parallel/large.py underneath).
            msg = "the size of the required kmers array exceeds the limit set by a uint32"
            raise NotImplementedError(msg)

        seg_starts = []
        counts = []
        for s, e in self._iter_segments():
            seg_starts.append(s)
            counts.append((e - s + 1) - self.min_kmer_len + 1)
        self._init_geometry = (
            np.asarray(seg_starts, dtype=np.uint32),
            np.asarray(counts, dtype=np.int64),
            int(num_kmers),
        )
        self._pos_host = None
        self._pos_dev = None

        if kmer_filters:
            positions = self._build_positions_host()
            mask = self._init_filter_mask(positions, kmer_filters)
            # the setter clears the (now stale) geometry
            self.kmer_sba_start_indices = positions[mask]
            # a subset of canonical positions keeps the cap-coverage invariant
            self._cap_cover_ok = True

    def _initialize_double_pass(self, kmer_filters=[]):
        """EXTENSION: the reference's declared double-pass init
        (kmers.py:776-779 — "counts the number of kmers first, initializes
        an array of the correct size, and then populates it on-the-fly.
        Requires less memory"). Filters evaluate per record chunk, so the
        whole-genome unfiltered index never materializes; pass 1 counts
        survivors, pass 2 fills an exactly-sized array. Identical output to
        single_pass."""
        if self._get_unfiltered_kmer_count() > 2**32 - 1:
            msg = "the size of the required kmers array exceeds the limit set by a uint32"
            raise NotImplementedError(msg)

        chunks = []
        total = 0
        scan_cache = {}
        for s, e in self._iter_segments():
            pos = np.arange(s, e - self.min_kmer_len + 2, dtype=np.uint32)
            if kmer_filters:
                valid_len = (np.int64(e) - pos.astype(np.int64) + 1).astype(np.uint32)
                mask = self._init_filter_mask(
                    pos, kmer_filters, valid_len=valid_len, scan_cache=scan_cache
                )
                count = int(mask.sum())
            else:
                mask = None
                count = len(pos)
            chunks.append((s, len(pos), mask))
            total += count

        out = np.empty(total, dtype=np.uint32)
        write = 0
        for s, n_pos, mask in chunks:
            pos = np.arange(s, s + n_pos, dtype=np.uint32)
            if mask is not None:
                pos = pos[mask]
            out[write : write + len(pos)] = pos
            write += len(pos)
        if write != total:
            raise AssertionError("logic error filling kmer_sba_start_indices")
        self.kmer_sba_start_indices = out
        # canonical per-record fill (possibly filtered): invariant holds
        self._cap_cover_ok = True

    def _callable_mask(self, f: Callable, positions) -> np.ndarray:
        """Host bool mask from an arbitrary reference-signature callable
        (the documented slow path). In both mode each position is presented
        in ITS strand's own SBA coordinates, preserving the reference's
        single-strand filter contract."""
        import warnings

        n = len(positions)
        if n >= _CALLABLE_WARN_THRESHOLD:
            # a plain callable walks every position in Python — minutes at
            # index scale; surface the fast path instead of silently crawling
            warnings.warn(
                f"kmer filter {getattr(f, '__name__', type(f).__name__)} is an "
                f"arbitrary callable, so it runs as a per-position Python loop "
                f"over {n} positions (the reference's walk semantics). For a "
                f"vectorized device evaluation wrap it as "
                f"genome_kmers_tpu.VectorizedFilter, or use the library "
                f"KmerFilter classes.",
                RuntimeWarning,
                stacklevel=3,
            )
        if self.kmer_source_strand == "both":
            off = self._revcomp_offset()
            fwd, rc = self.seq_coll.forward_sba, self.seq_coll.revcomp_sba
            return np.fromiter(
                (
                    bool(
                        f(fwd, "forward", int(p))
                        if int(p) < off
                        else f(rc, "reverse_complement", int(p) - off)
                    )
                    for p in positions
                ),
                dtype=bool,
                count=n,
            )
        sba = self._host_sba()
        strand = self._strand_to_use()
        return np.fromiter(
            (bool(f(sba, strand, int(p))) for p in positions),
            dtype=bool,
            count=n,
        )

    def _init_filter_mask(
        self, positions: np.ndarray, kmer_filters, valid_len=None, scan_cache=None
    ) -> np.ndarray:
        """AND of every init-time filter over the given positions (host bool
        mask). Library filters share ONE FilterContext (so the genome-wide
        scans compute once per call, and — via ``scan_cache`` — once across
        double_pass's per-record chunks); arbitrary reference-signature
        callables take the host loop (``_callable_mask``)."""
        import jax.numpy as jnp

        sba = self._host_sba()
        if valid_len is None:
            seg_starts = self._host_seg_starts().astype(np.int64)
            seg_ids = np.searchsorted(seg_starts, positions, side="right") - 1
            seg_e = np.where(
                seg_ids == len(seg_starts) - 1,
                len(sba) - 1,
                seg_starts[np.minimum(seg_ids + 1, len(seg_starts) - 1)] - 2,
            )
            valid_len = (seg_e - positions.astype(np.int64) + 1).astype(np.uint32)

        mask = np.ones(len(positions), dtype=bool)
        ctx = None
        _CACHED = ("_sba_dev", "_gc_cumsum", "_run_len", "_next_amb")
        for f in kmer_filters:
            if isinstance(f, KmerFilter):
                if ctx is None:
                    ctx = FilterContext(sba, jnp.asarray(positions), jnp.asarray(valid_len))
                    if scan_cache:
                        for field in _CACHED:
                            setattr(ctx, field, scan_cache.get(field))
                mask &= np.asarray(f.batch_mask(ctx))
            else:
                mask &= self._callable_mask(f, positions)
        if ctx is not None and scan_cache is not None:
            for field in _CACHED:
                scan_cache[field] = getattr(ctx, field)
        return mask

    def _build_positions_host(self) -> np.ndarray:
        seg_starts, counts, num_kmers = self._init_geometry
        out = np.empty(num_kmers, dtype=np.uint32)
        write = 0
        for s, count in zip(seg_starts, counts):
            out[write : write + count] = np.arange(s, s + count, dtype=np.uint32)
            write += int(count)
        if write != num_kmers:
            raise AssertionError("logic error filling kmer_sba_start_indices")
        return out

    def _build_positions_device(self):
        """Initial position array computed on device: record id per index via
        searchsorted over cumulative counts, then start + offset gathers."""
        import jax.numpy as jnp

        seg_starts, counts, num_kmers = self._init_geometry
        # cumulative counts fit uint32 exactly (num_kmers < 2^32)
        cum_excl_dev = jnp.asarray(
            np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.uint32)
        )
        starts_dev = jnp.asarray(seg_starts)
        idx = jnp.arange(num_kmers, dtype=jnp.uint32)
        rec = (
            jnp.searchsorted(cum_excl_dev, idx, side="right").astype(jnp.int32) - 1
        )
        return jnp.take(starts_dev, rec) + (idx - jnp.take(cum_excl_dev, rec))

    def _iter_segments(self):
        """(sba_start, sba_end) spans of every segment of the ACTIVE SBA in
        SBA order — the forward or revcomp records, or, for the both-strand
        extension, all 2R segments of the concatenated view (k-mer numbering
        then runs forward positions first, then revcomp positions)."""
        if self.kmer_source_strand == "both":
            sba, starts = self.seq_coll.both_concat_arrays()
            starts64 = starts.astype(np.int64)
            ends64 = np.concatenate([starts64[1:] - 2, [len(sba) - 1]])
            for s, e in zip(starts64, ends64):
                yield int(s), int(e)
        else:
            for _, s, e in self.seq_coll.iter_records():
                yield s, e

    def _get_unfiltered_kmer_count(self) -> int:
        """Reference kmers.py:837-861."""
        num_kmers = 0
        num_records = 0
        for s, e in self._iter_segments():
            num_kmers += (e - s + 1) - self.min_kmer_len + 1
            num_records += 1
        if num_records == 0:
            raise ValueError("SequenceCollection does not have any records")
        return num_kmers

    def _ragged_to_host(self) -> np.ndarray:
        """Compact the retained distributed layout to a host uint32 array
        (global sorted order, pads removed)."""
        import jax

        cache = self._dist_cache
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            pos = np.asarray(multihost_utils.process_allgather(cache.positions, tiled=True))
            pad = np.asarray(multihost_utils.process_allgather(cache.is_pad, tiled=True))
        else:
            pos = np.asarray(cache.positions)
            pad = np.asarray(cache.is_pad)
        out = pos[pad == 0]
        assert out.shape[0] == cache.n_real
        return out

    @property
    def kmer_sba_start_indices(self):
        """Host uint32 view of the k-mer index (reference member kmers.py:811),
        materialized lazily from the device array, distributed layout, or
        init geometry."""
        if self._pos_host is None:
            if self._pos_dev is not None:
                self._pos_host = np.asarray(self._pos_dev)
            elif self._dist_cache is not None:
                self._pos_host = self._ragged_to_host()
            elif self._init_geometry is not None:
                self._pos_host = self._build_positions_host()
        return self._pos_host

    @kmer_sba_start_indices.setter
    def kmer_sba_start_indices(self, value):
        self._pos_host = value
        self._pos_dev = None
        self._init_geometry = None
        self._dist_cache = None
        self._lanes_cache = None
        self._suffix_gid_cache = None
        # unknown until verified: an assigned set may include positions with
        # valid_len < min_kmer_len (the canonical build never does)
        self._cap_cover_ok = None

    def __len__(self):
        if self._pos_host is not None:
            return len(self._pos_host)
        if self._pos_dev is not None:
            return int(self._pos_dev.shape[0])
        if self._dist_cache is not None:
            return self._dist_cache.n_real
        if self._init_geometry is not None:
            return self._init_geometry[2]
        raise TypeError("Kmers index is not initialized")

    def __getitem__(self):
        """Stub, matching the reference (kmers.py:866-867)."""
        pass

    # ------------------------------------------------------------------ #
    # device helpers
    # ------------------------------------------------------------------ #

    def _device_positions(self):
        import jax.numpy as jnp

        if self._pos_dev is None:
            if (
                self._pos_host is None
                and self._init_geometry is not None
                and self._dist_cache is None
            ):
                self._pos_dev = self._build_positions_device()
            else:
                self._pos_dev = jnp.asarray(self.kmer_sba_start_indices)
        return self._pos_dev

    def _check_forward_only(self):
        if self._strand_extension and self.kmer_source_strand in (
            "reverse_complement",
            "both",
        ):
            # from_strand() extension instances operate on the revcomp or
            # concatenated both-strand SBA for real; the reference's
            # forward-only error stays for every plain-constructed Kmers
            # (reference kmers.py:921-933)
            return
        condition1 = self.kmer_source_strand != "forward"
        condition2 = self.seq_coll.strands_loaded() != "forward"
        if condition1 or condition2:
            raise NotImplementedError(
                f"both kmer_source_strand ({self.kmer_source_strand}) and "
                "sequence_collection.strands_loaded() must be 'forward'"
            )

    # strand-aware data accessors: every compute/query path goes through
    # these, so the from_strand() extension switches the whole class to the
    # reverse-complement (or concatenated both-strand) SBA by flipping one
    # selector
    def _strand_to_use(self) -> str:
        if self.kmer_source_strand == "both":
            return "both_concat"
        return (
            "reverse_complement"
            if self.kmer_source_strand == "reverse_complement"
            else "forward"
        )

    def _host_sba(self) -> np.ndarray:
        sc = self.seq_coll
        strand = self._strand_to_use()
        if strand == "both_concat":
            return sc.both_concat_arrays()[0]
        if strand == "reverse_complement":
            return sc.revcomp_sba
        return sc.forward_sba

    def _host_seg_starts(self) -> np.ndarray:
        sc = self.seq_coll
        strand = self._strand_to_use()
        if strand == "both_concat":
            return sc.both_concat_arrays()[1]
        if strand == "reverse_complement":
            return sc._revcomp_sba_seg_starts
        return sc._forward_sba_seg_starts

    def _revcomp_offset(self) -> int:
        """First concatenated-SBA index of the revcomp half (both mode):
        positions >= this offset are "-"-strand k-mers. The byte at
        ``offset - 1`` is the joining '$', never a k-mer position."""
        return len(self.seq_coll.forward_sba) + 1

    def _dc(self):
        return self.seq_coll.device_cache(self._strand_to_use())

    def _check_group_params_unsorted(self, min_group_size, max_group_size, yield_first_n=None):
        """Reference kmers.py:939-954: group params require a sorted index."""
        if not self._is_sorted:
            if min_group_size != 1:
                msg = "Returning group parameters is not supported when kmers has not been"
                msg += f" sorted. min_group_size ({min_group_size}) cannot be specified. Did you"
                msg += " mean to run sort() before getting kmers?"
                raise ValueError(msg)
            if max_group_size is not None:
                msg = "Returning group parameters is not supported when kmers has not been"
                msg += f" sorted. max_group_size ({max_group_size}) cannot be specified. Did you"
                msg += " mean to run sort() before getting kmers?"
                raise ValueError(msg)
            if yield_first_n is not None:
                msg = "Returning group parameters is not supported when kmers has not been"
                msg += f" sorted. yield_first_n ({yield_first_n}) cannot be specified. Did you"
                msg += " mean to run sort() before getting kmers?"
                raise ValueError(msg)

    def _survivors(self, kmer_filter_func):
        """Apply a filter over all k-mer positions.

        Returns (surv_nums or None-if-all, surv_pos dev, surv_vl dev). Library
        filters evaluate as one vectorized device mask; arbitrary callables
        fall back to a per-position host loop (documented slow path)."""
        import jax.numpy as jnp

        from .ops.filters import KeepAllFilter
        from .ops.keys import compute_valid_len

        dc = self._dc()
        positions = self._device_positions()
        valid_len = compute_valid_len(positions, dc.seg_starts, dc.seg_ends)

        if isinstance(kmer_filter_func, KeepAllFilter):
            return None, positions, valid_len

        if isinstance(kmer_filter_func, KmerFilter):
            ctx = FilterContext(
                self._host_sba(), positions, valid_len,
                sba_dev=lambda: dc.sba, scans=dc,
            )
            mask = np.asarray(kmer_filter_func.batch_mask(ctx))
        else:
            mask = self._callable_mask(kmer_filter_func, self.kmer_sba_start_indices)
        surv_nums = np.flatnonzero(mask)
        idx_dev = jnp.asarray(surv_nums.astype(np.int32))
        return surv_nums, jnp.take(positions, idx_dev), jnp.take(valid_len, idx_dev)

    def _boundary_parts(self, kmer_len, kmer_filter_func):
        """Survivor selection + group-boundary mask on device.

        Returns (surv_nums or None, surv_pos, boundary) — the static-shape
        replacement for the reference's sequential walk carry."""
        import jax.numpy as jnp

        from .ops.keys import cap_lengths
        from .ops.sort import adjacent_boundaries

        dc = self._dc()
        surv_nums, surv_pos, surv_vl = self._survivors(kmer_filter_func)
        m = surv_pos.shape[0]
        if m == 0:
            return surv_nums, surv_pos, jnp.zeros(0, dtype=bool)

        if self._is_sorted:
            sg = getattr(self, "_suffix_gid_cache", None)
            if (
                sg is not None
                and surv_nums is None
                and not self.track_strands_separately
                and (
                    (kmer_len is None and sg[1] is None)
                    or (kmer_len is not None and kmer_len == sg[1])
                )
            ):
                # converged run ids retained by the suffix sort: identity at
                # the SORT's comparison (max_kmer_len=None => full suffix),
                # so the boundary is a pure adjacent diff — the window-loop
                # re-compare (adjacent_boundaries' iterative rounds) never
                # runs for the flagship sort-then-stats suffix workflow
                gid = sg[0]
                prev = jnp.concatenate([gid[:1], gid[:-1]])
                return surv_nums, surv_pos, (gid != prev).at[0].set(m > 0)

            lanes = None
            if (
                surv_nums is None
                and kmer_len is not None
                and (self.max_kmer_len is None or kmer_len <= self.max_kmer_len)
            ):
                lanes = self._ensure_lanes()
            if lanes is not None and kmer_len <= lanes["built_k"]:
                # retained sorted key lanes: boundary = adjacent compare,
                # no genome gathers (ops/sort.boundaries_from_sorted_lanes)
                from .ops.sort import boundaries_from_sorted_lanes

                boundary = boundaries_from_sorted_lanes(
                    lanes["words"], lanes["cap"], kmer_len, lanes["two_bit"]
                )
            else:
                cap = cap_lengths(surv_vl, kmer_len)
                use2 = kmer_len is not None and kmer_len <= 64
                packed2 = dc.packed2 if use2 else None
                packed = dc.packed if packed2 is None else None
                uniform = kmer_len is not None and self.min_kmer_len >= kmer_len
                boundary = adjacent_boundaries(
                    packed, surv_pos, cap, kmer_len, packed2=packed2, uniform_cap=uniform
                )
            if self.track_strands_separately:
                # strand joins group identity. Within an equal-string run the
                # position tie-break orders every "+" entry (index < offset)
                # before every "-" entry, so the per-strand sub-groups are
                # contiguous — splitting is one extra boundary term.
                is_rc = surv_pos >= jnp.uint32(self._revcomp_offset())
                prev_rc = jnp.concatenate([is_rc[:1], is_rc[:-1]])
                boundary = boundary | (is_rc != prev_rc)
        else:
            boundary = jnp.ones(m, dtype=bool)
        return surv_nums, surv_pos, boundary

    def _boundary_device(self, kmer_len, kmer_filter_func):
        """Boundary mask only (lean path for count/histogram queries)."""
        _, _, boundary = self._boundary_parts(kmer_len, kmer_filter_func)
        return boundary

    def _cap_covers_min_k(self) -> bool:
        """True when every index position has valid_len >= min_kmer_len.

        Canonical construction guarantees it (positions stop at
        seg_end - min_kmer_len + 1); after a user assignment to
        ``kmer_sba_start_indices`` the flag is unknown and gets verified
        against the data once (one device reduce + scalar transfer). The
        CRISPR PAM lanes fast path consults this before trusting the
        cap-coverage invariant."""
        if getattr(self, "_cap_cover_ok", True) is None:
            import jax.numpy as jnp

            from .ops.keys import compute_valid_len

            positions = self._device_positions()
            if positions.shape[0] == 0:
                self._cap_cover_ok = True
            else:
                dc = self._dc()
                vl = compute_valid_len(positions, dc.seg_starts, dc.seg_ends)
                self._cap_cover_ok = bool(int(jnp.min(vl)) >= self.min_kmer_len)
        return self._cap_cover_ok

    def _ensure_lanes(self):
        """Retained sorted key lanes, rebuilding them ONCE from the sorted
        positions when absent — a freshly ``load()``-ed index (the
        reference's flagship workflow: sort once, save, reload for queries,
        reference docs/overview.rst:99-112) or a host-assigned index has no
        in-process sort to retain lanes from. The one-time key gather makes
        every subsequent stats/filter query gather-free (the lanes paths)."""
        lanes = getattr(self, "_lanes_cache", None)
        if lanes is not None or not self._is_sorted or self.max_kmer_len is None:
            return lanes
        if not getattr(self, "_lanes_rebuild", True):
            return None  # tests force the gather paths through this switch
        import jax.numpy as jnp

        from .ops.keys import (
            build_key2_words,
            build_key_words,
            cap_lengths,
            compute_valid_len,
        )

        dc = self._dc()
        use2 = self.max_kmer_len <= 64 and dc.packed2 is not None
        if not use2 and self.max_kmer_len > 32:
            return None
        positions = self._device_positions()
        n = int(positions.shape[0])
        if n <= 1:
            return None
        valid_len = compute_valid_len(positions, dc.seg_starts, dc.seg_ends)
        cap = cap_lengths(valid_len, self.max_kmer_len)
        if use2:
            n_words = -(-self.max_kmer_len // 16)
            words = build_key2_words(dc.packed2, positions, cap, n_words)
            uniform = self.min_kmer_len == self.max_kmer_len
            self._lanes_cache = {
                "two_bit": True,
                "built_k": self.max_kmer_len,
                "words": words,
                "cap": None if uniform else cap,
                "cap_cover_check": self._cap_covers_min_k,
            }
        else:
            n_words = -(-self.max_kmer_len // 8)
            words = build_key_words(dc.packed, positions, cap, n_words)
            self._lanes_cache = {
                "two_bit": False,
                "built_k": self.max_kmer_len,
                "words": words,
                "cap": None,
                "cap_cover_check": self._cap_covers_min_k,
            }
        return self._lanes_cache

    def _lanes_fast(self, kmer_len, kmer_filter_func):
        """The retained-sorted-lanes dict when the whole stats query can run
        as one fused program over it (unfiltered, bounded kmer_len within
        the built length, no strand-split term), else None."""
        from .ops.filters import KeepAllFilter

        if not (
            self._is_sorted
            and not self.track_strands_separately
            and isinstance(kmer_filter_func, KeepAllFilter)
            and kmer_len is not None
            # rebuilt lanes are always built at max_kmer_len — don't pay the
            # O(N) rebuild for a query they could never serve
            and (self.max_kmer_len is None or kmer_len <= self.max_kmer_len)
        ):
            return None
        lanes = self._ensure_lanes()
        if lanes is not None and kmer_len <= lanes["built_k"]:
            return lanes
        return None

    def _filtered_lanes_stats(self, kmer_len, kmer_filter_func):
        """(lanes, positions, strand_split, (flags_fn, params, msg_makers))
        for the fused lanes-filtered stats path, or None.

        Eligible when the index retains sorted key lanes covering both the
        query ``kmer_len`` and the filter's own window, and the filter can
        evaluate directly on lane words (ops/filters lanes flags). The whole
        filtered query then runs as ONE fused program with no genome gathers
        — the plane path this bypasses pays one serialized uint8 gather
        (~150 ms/16.7M rows on v5e) plus 1-2 host syncs for error checks.
        """
        import jax.numpy as jnp

        from .ops.filters import KeepAllFilter, KmerFilter

        if not isinstance(kmer_filter_func, KmerFilter) or isinstance(
            kmer_filter_func, KeepAllFilter
        ):
            return None
        if not self._is_sorted:
            return None
        if kmer_len is None or len(self.kmer_sba_start_indices) == 0:
            return None
        if self.max_kmer_len is not None and kmer_len > self.max_kmer_len:
            return None  # lanes could never serve it — skip the rebuild too
        lanes = self._ensure_lanes()
        if lanes is None or kmer_len > lanes["built_k"]:
            return None
        spec = kmer_filter_func.lanes_spec(
            lanes, int(len(self._host_sba())), self.min_kmer_len
        )
        if spec is None:
            return None
        positions = self._device_positions()
        split = (
            jnp.uint32(self._revcomp_offset())
            if self.track_strands_separately
            else jnp.asarray(_UINT32_SENTINEL)
        )
        return lanes, positions, split, spec

    def _adaptive_hist_to_host(self, size, qualifies, digest2, max_counts_bin: int,
                               hist_fn=None):
        """Host fold of the adaptive histogram's stage-1 combo digest
        ``[total, hi, speculative counts]`` (see ops/groups sizes_digest).

        Common case: the speculative _SPEC_HIST_BINS-bin counts that rode the
        digest transfer are already exact (the user clip fits inside them, or
        no qualifying group exceeds them) — the whole query was ONE dispatch
        and ONE ~1 KB transfer. Otherwise dispatch stage 2: ``hi`` picks
        broadcast-compare bins when the range fits (~30-100 ms/16.7M rows on
        v5e) over the serialized scatter-add (~150-190 ms) the 1e6-bin
        default otherwise forces. ``hist_fn`` overrides the stage-2 kernel
        (the mesh paths pass the sharded psum variant, so large bin counts
        also stop psumming 4 MB of bins)."""
        from .ops.groups import (
            _SPEC_HIST_BINS,
            adaptive_bin_count,
            hist_from_sizes,
        )

        if hist_fn is None:
            hist_fn = hist_from_sizes

        total = int(digest2[0])
        hi_raw = int(digest2[1])
        spec = digest2[2 : 2 + _SPEC_HIST_BINS + 1]
        if max_counts_bin <= _SPEC_HIST_BINS or hi_raw <= _SPEC_HIST_BINS:
            # fold(min(s, SPEC)) == min(s, mcb) for every qualifying size s
            # in these regimes — the speculative histogram is exact
            out = np.zeros(max_counts_bin + 1, dtype=np.int64)
            b = min(len(spec), max_counts_bin + 1)
            out[:b] = spec[:b].astype(np.int64)
            if len(spec) > max_counts_bin + 1:
                out[max_counts_bin] += int(spec[max_counts_bin + 1 :].sum())
            return out, total
        # device bin count: sized by the histogram's true nonzero range,
        # pow2-bucketed so nearby queries share one executable (shared
        # policy: ops/groups.adaptive_bin_count)
        bins = adaptive_bin_count(hi_raw, max_counts_bin)
        counts = hist_fn(size, qualifies, bins)
        # the device clipped at `bins`, so the largest occupied bin is
        # min(hi_raw, bins) — NOT min(hi_raw, max_counts_bin): when the user
        # clip is below the device bins, oversize groups sit between the two
        # and the host fold gathers them into the user's top bin
        hi_t = min(hi_raw, bins)
        out, _ = _trimmed_hist_to_host(
            counts, np.array([total, hi_t], dtype=np.uint32), max_counts_bin,
            device_bin=bins,
        )
        return out, total

    @staticmethod
    def _raise_lanes_errs(err_tail: np.ndarray, msg_makers) -> None:
        """Raise the filter's reference error from the fused-kernel digest:
        ``err_tail`` is the [any, cond_id, first_bad_position] triple
        (ops/groups.fold_err_conditions) naming the EARLIEST offending row
        in sorted order — the row the reference's sequential walk raises at
        — with its condition id indexing ``msg_makers`` (the filter's
        per-row check order)."""
        if len(err_tail) and int(err_tail[0]):
            raise ValueError(msg_makers[int(err_tail[1])](int(err_tail[2])))

    def _filtered_device_stats(self, kmer_len, kmer_filter_func):
        """(all-rows boundary, device survivor mask) for the device-only
        filtered stats path, or None when it doesn't apply.

        Eligible when the filter is a vectorized ``KmerFilter`` (not
        keep-all) and group identity at ``kmer_len`` is contiguous in the
        current index order: unsorted (every k-mer its own group), sorted
        with ``kmer_len`` within the sorted compare length, or suffix-sorted
        (``max_kmer_len=None``). Contiguity makes survivor groups equal to
        all-rows groups restricted to survivors — the reference's
        previous-survivor walk semantics (kmers.py:597-601) — so filtered
        counts/histograms run with no survivor compaction and no O(N) host
        round-trips (the old path downloaded the mask and re-uploaded
        survivor indices: ~5 N bytes over the device link per query).
        """
        from .ops.filters import FilterContext, KeepAllFilter, KmerFilter
        from .ops.keys import compute_valid_len

        if not isinstance(kmer_filter_func, KmerFilter) or isinstance(
            kmer_filter_func, KeepAllFilter
        ):
            return None
        if self._is_sorted and not (
            self.max_kmer_len is None
            or (kmer_len is not None and kmer_len <= self.max_kmer_len)
        ):
            return None

        # boundary over ALL rows (keep-all view), including the retained-
        # lanes fast path and the strand-split term
        _, _, boundary = self._boundary_parts(kmer_len, kmer_filter_keep_all)
        dc = self._dc()
        positions = self._device_positions()
        valid_len = compute_valid_len(positions, dc.seg_starts, dc.seg_ends)
        ctx = FilterContext(
            self._host_sba(), positions, valid_len, sba_dev=lambda: dc.sba,
            scans=dc,
        )
        kmer_filter_func.check_batch(ctx)  # device-side error checks
        mask = kmer_filter_func.mask_pure(ctx)
        return boundary, mask

    def _group_device(self, kmer_len, kmer_filter_func):
        """Survivor selection + full group geometry on device.

        Returns (surv_nums or None, surv_pos, boundary, size, rank)."""
        import jax.numpy as jnp

        from .ops.groups import group_geometry

        surv_nums, surv_pos, boundary = self._boundary_parts(kmer_len, kmer_filter_func)
        if boundary.shape[0] == 0:
            z = jnp.zeros(0, dtype=jnp.uint32)
            return surv_nums, surv_pos, boundary, z, z
        _, _, size, rank = group_geometry(boundary)
        return surv_nums, surv_pos, boundary, size, rank

    def _group_arrays(self, kmer_len, kmer_filter_func, min_group_size, max_group_size, yield_first_n):
        """Host-side arrays for the yielding APIs: (survivor kmer_nums,
        survivor positions, yielded mask, group_size_yielded,
        group_size_total), over filter survivors in index order."""
        import jax.numpy as jnp

        from .ops.groups import selection_masks

        surv_nums, surv_pos, boundary, size, rank = self._group_device(kmer_len, kmer_filter_func)
        m = surv_pos.shape[0]
        if m == 0:
            empty_u32 = np.zeros(0, dtype=np.uint32)
            return (
                np.zeros(0, dtype=np.int64),
                empty_u32,
                np.zeros(0, dtype=bool),
                empty_u32,
                empty_u32,
            )

        max_gs = jnp.uint32(max_group_size) if max_group_size is not None else jnp.asarray(
            _UINT32_SENTINEL
        )
        yfn = jnp.uint32(yield_first_n) if yield_first_n is not None else jnp.asarray(
            _UINT32_SENTINEL
        )
        yielded, gsy = selection_masks(
            boundary, size, rank, jnp.uint32(min_group_size), max_gs, yfn
        )

        if surv_nums is None:
            surv_nums = np.arange(len(self.kmer_sba_start_indices), dtype=np.int64)
        return (
            surv_nums,
            np.asarray(surv_pos),
            np.asarray(yielded),
            np.asarray(gsy),
            np.asarray(size),
        )

    # ------------------------------------------------------------------ #
    # public queries
    # ------------------------------------------------------------------ #

    def get_kmers(
        self,
        kmer_len: Union[int, None],
        one_based_seq_index: bool = False,
        kmer_filter_func: Callable = kmer_filter_keep_all,
        kmer_info_to_yield: str = "minimum",
        min_group_size: int = 1,
        max_group_size: Union[int, None] = None,
        yield_first_n: Union[int, None] = None,
    ) -> Generator[tuple, None, None]:
        """Customizable generator yielding k-mer info tuples (reference
        kmers.py:869-992). Vectorized engine for library filters; host walk
        for arbitrary user callables."""
        self._check_forward_only()
        if kmer_len is not None and kmer_len < 1:
            raise ValueError(f"kmer_len ({kmer_len}) must be > 0")
        self._check_group_params_unsorted(min_group_size, max_group_size, yield_first_n)
        if kmer_info_to_yield not in ("minimum", "full"):
            raise ValueError(f"kmer_info_to_yield ({kmer_info_to_yield}) not recognized")

        surv_nums, surv_pos, yielded, gsy, gst = self._group_arrays(
            kmer_len, kmer_filter_func, min_group_size, max_group_size, yield_first_n
        )

        full = kmer_info_to_yield == "full"
        if full:
            get_record_info = self._record_info_func(one_based_seq_index)

        yield_idx = np.flatnonzero(yielded)
        for j in yield_idx:
            kmer_num = int(surv_nums[j])
            if not full:
                yield (kmer_num, int(gsy[j]), int(gst[j]))
            else:
                sba_idx = int(surv_pos[j])
                seg_num, s, e, seq_strand, seq_chrom, seq_start_idx = get_record_info(sba_idx)
                if kmer_len is None:
                    out_kmer_len = e - sba_idx + 1
                else:
                    if sba_idx + kmer_len - 1 > e:
                        raise ValueError(
                            f"kmer_len ({kmer_len}) for kmer_num ({kmer_num}) extends beyond the end of the segment"
                        )
                    out_kmer_len = kmer_len
                yield (
                    kmer_num,
                    seq_strand,
                    seq_chrom,
                    seq_start_idx,
                    out_kmer_len,
                    int(gsy[j]),
                    int(gst[j]),
                )

    def get_kmers_arrays(
        self,
        kmer_len: Union[int, None],
        kmer_filter_func: Callable = kmer_filter_keep_all,
        min_group_size: int = 1,
        max_group_size: Union[int, None] = None,
        yield_first_n: Union[int, None] = None,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """EXTENSION: bulk array version of ``get_kmers(kmer_info_to_yield=
        "minimum")`` — returns (kmer_nums, sba_start_indices,
        group_size_yielded, group_size_total) as NumPy arrays in yield order,
        skipping the per-k-mer Python generator (the reference's throughput
        ceiling at scale, kmers.py:989-990).
        """
        self._check_forward_only()
        if kmer_len is not None and kmer_len < 1:
            raise ValueError(f"kmer_len ({kmer_len}) must be > 0")
        self._check_group_params_unsorted(min_group_size, max_group_size, yield_first_n)

        surv_nums, surv_pos, yielded, gsy, gst = self._group_arrays(
            kmer_len, kmer_filter_func, min_group_size, max_group_size, yield_first_n
        )
        sel = np.flatnonzero(yielded)
        return (
            surv_nums[sel].astype(np.int64),
            surv_pos[sel].astype(np.uint32),
            gsy[sel].astype(np.int64),
            gst[sel].astype(np.int64),
        )

    def _record_columns(self, pos: np.ndarray, one_based_seq_index: bool):
        """Vectorized record lookup for int64 positions: (record_num,
        strand U1, seq_start_idx, seg_end) — one searchsorted replaces the
        reference's per-row binary-search closure
        (sequence_collection.py:1147-1187)."""
        seg_starts = self._host_seg_starts().astype(np.int64)
        seg_ids = np.searchsorted(seg_starts, pos, side="right") - 1
        seg_s = seg_starts[seg_ids]
        sba_len = len(self._host_sba())
        seg_e = np.where(
            seg_ids == len(seg_starts) - 1,
            sba_len - 1,
            seg_starts[np.minimum(seg_ids + 1, len(seg_starts) - 1)] - 2,
        )
        base = 1 if one_based_seq_index else 0
        if self.kmer_source_strand == "reverse_complement":
            # forward-sequence coordinate convention (reference
            # sequence_collection.py:141-144): count from the segment's
            # right edge on the revcomp strand
            strand = np.full(len(pos), "-", dtype="U1")
            seq_idx = seg_e - pos + base
            record_num = seg_ids
        elif self.kmer_source_strand == "both":
            n_rec = len(self.seq_coll.forward_record_names)
            rc_row = seg_ids >= n_rec
            strand = np.where(rc_row, "-", "+").astype("U1")
            seq_idx = np.where(rc_row, seg_e - pos, pos - seg_s) + base
            # revcomp segment k is record R-1-k, so concatenated segment
            # R+k maps to forward record 2R-1-(R+k)
            record_num = np.where(rc_row, 2 * n_rec - 1 - seg_ids, seg_ids)
        else:
            strand = np.full(len(pos), "+", dtype="U1")
            seq_idx = pos - seg_s + base
            record_num = seg_ids
        return record_num, strand, seq_idx, seg_e

    def get_kmers_full_arrays(
        self,
        kmer_len: Union[int, None],
        one_based_seq_index: bool = False,
        kmer_filter_func: Callable = kmer_filter_keep_all,
        min_group_size: int = 1,
        max_group_size: Union[int, None] = None,
        yield_first_n: Union[int, None] = None,
    ) -> dict:
        """EXTENSION: bulk array version of ``get_kmers(kmer_info_to_yield=
        "full")``: one vectorized searchsorted replaces the per-row record
        lookup. Returns a dict of aligned arrays — kmer_num, record_num,
        strand ("+"/"-"), seq_start_idx (forward-sequence convention, like
        the generator), kmer_len, group_size_yielded, group_size_total — in
        yield order. record_num indexes ``seq_coll.forward_record_names``
        for forward and both-strand instances, ``revcomp_record_names`` for
        reverse-complement instances.
        """
        self._check_forward_only()
        if kmer_len is not None and kmer_len < 1:
            raise ValueError(f"kmer_len ({kmer_len}) must be > 0")
        self._check_group_params_unsorted(min_group_size, max_group_size, yield_first_n)

        surv_nums, surv_pos, yielded, gsy, gst = self._group_arrays(
            kmer_len, kmer_filter_func, min_group_size, max_group_size, yield_first_n
        )
        sel = np.flatnonzero(yielded)
        pos = surv_pos[sel].astype(np.int64)

        record_num, strand, seq_idx, seg_e = self._record_columns(
            pos, one_based_seq_index
        )
        if kmer_len is None:
            out_len = seg_e - pos + 1
        else:
            if (pos + kmer_len - 1 > seg_e).any():
                bad = int(sel[np.flatnonzero(pos + kmer_len - 1 > seg_e)[0]])
                raise ValueError(
                    f"kmer_len ({kmer_len}) for kmer_num ({int(surv_nums[bad])}) extends beyond the end of the segment"
                )
            out_len = np.full(len(pos), kmer_len, dtype=np.int64)
        return {
            "kmer_num": surv_nums[sel].astype(np.int64),
            "record_num": record_num.astype(np.int64),
            "strand": strand,
            "seq_start_idx": seq_idx,
            "kmer_len": out_len,
            "group_size_yielded": gsy[sel].astype(np.int64),
            "group_size_total": gst[sel].astype(np.int64),
        }

    def get_kmer_count(
        self,
        kmer_len: Union[int, None],
        kmer_filter_func: Callable = kmer_filter_keep_all,
        min_group_size: int = 1,
        max_group_size: Union[int, None] = None,
        mesh=None,
    ) -> int:
        """Total k-mers in qualifying groups (reference kmers.py:994-1083).

        EXTENSION: pass ``mesh`` to count over the mesh — reuses the layout
        retained by ``sort(mesh=...)`` when present, any ``kmer_len``
        including ``None``/beyond-word-limit (see
        ``get_kmer_group_counts``). Requires a sorted index."""
        self._check_forward_only()
        if kmer_len is not None and kmer_len < 1:
            raise ValueError(f"kmer_len ({kmer_len}) must be > 0")
        self._check_group_params_unsorted(min_group_size, max_group_size)

        if mesh is not None:
            if not self._is_sorted:
                raise NotImplementedError(
                    "get_kmer_count(mesh=...) requires a sorted index"
                )
            _, total = self._mesh_group_hist(
                kmer_len, kmer_filter_func, min_group_size, max_group_size,
                max_counts_bin=1, mesh=mesh,
            )
            return total

        import jax.numpy as jnp

        from .ops.groups import group_sizes_at_boundaries, group_total_count

        max_gs = jnp.uint32(max_group_size) if max_group_size is not None else jnp.asarray(
            _UINT32_SENTINEL
        )
        lanes = self._lanes_fast(kmer_len, kmer_filter_func)
        if lanes is not None:
            from .ops.groups import lanes_group_total

            total = lanes_group_total(
                lanes["words"], lanes["cap"], jnp.uint32(min_group_size), max_gs,
                kmer_len, lanes["two_bit"],
            )
            return int(total)

        fl = self._filtered_lanes_stats(kmer_len, kmer_filter_func)
        if fl is not None:
            from .ops.groups import lanes_filtered_total

            lanes, positions, split, (flags_fn, params, msgs) = fl
            digest = np.asarray(
                lanes_filtered_total(
                    lanes["words"], lanes["cap"], positions, jnp.asarray(params),
                    kmer_len, jnp.uint32(min_group_size), max_gs, split,
                    lanes["two_bit"], flags_fn,
                )
            )
            self._raise_lanes_errs(digest[1:], msgs)
            return int(digest[0])

        fd = self._filtered_device_stats(kmer_len, kmer_filter_func)
        if fd is not None:
            from .ops.groups import filtered_group_total

            boundary, mask = fd
            if boundary.shape[0] == 0:
                return 0
            return int(
                filtered_group_total(boundary, mask, jnp.uint32(min_group_size), max_gs)
            )

        boundary = self._boundary_device(kmer_len, kmer_filter_func)
        if boundary.shape[0] == 0:
            return 0
        size = group_sizes_at_boundaries(boundary)
        total = group_total_count(boundary, size, jnp.uint32(min_group_size), max_gs)
        return int(total)

    def get_kmer_group_counts(
        self,
        kmer_len: Union[int, None],
        kmer_filter_func: Callable = kmer_filter_keep_all,
        min_group_size: int = 1,
        max_group_size: Union[int, None] = None,
        max_counts_bin: int = 1000000,
        mesh=None,
    ) -> tuple[np.ndarray, int]:
        """Histogram of group sizes + total count (reference kmers.py:1085-1178).

        EXTENSION: pass ``mesh`` (a jax.sharding.Mesh) to compute the
        histogram fully on the mesh — halo-stitched distributed histogram
        over the sharded sorted index, no host round trip. Reuses the layout
        retained by ``sort(mesh=...)`` when present (no re-sort); library
        filters (KmerFilter) apply as a sharded device mask. Any
        ``kmer_len`` works, including ``None`` (suffix identity) and beyond
        the key-word limits — those take the iterative-refinement group ids
        (parallel.sample_sort.distributed_adjacent_gids; a suffix-mode
        ``sort(mesh=...)`` retains its converged run ids so the matching
        stats call needs zero refinement rounds).
        """
        self._check_forward_only()
        if kmer_len is not None and kmer_len < 1:
            raise ValueError(f"kmer_len ({kmer_len}) must be > 0")
        self._check_group_params_unsorted(min_group_size, max_group_size)
        if not self._is_sorted:
            raise AssertionError("The kmers must be sorted when calling get_kmer_group_counts")
        if max_counts_bin <= 0:
            raise ValueError(f"max_counts_bin ({max_counts_bin}) must be >= 1")

        if mesh is not None:
            counts, total = self._mesh_group_hist(
                kmer_len, kmer_filter_func, min_group_size, max_group_size,
                max_counts_bin, mesh,
            )
            return counts.astype(np.int64), total

        import jax.numpy as jnp

        from .ops.groups import group_sizes_at_boundaries

        max_gs = jnp.uint32(max_group_size) if max_group_size is not None else jnp.asarray(
            _UINT32_SENTINEL
        )
        # Every branch below is the adaptive two-stage histogram: stage 1
        # computes sizes + qualifying mask + a [total, hi] digest; the host
        # reads the 8-byte digest and dispatches stage 2 at a pow2-bucketed
        # bin count sized by hi. Measured on v5e at 16.7M rows this BEATS
        # the single fused dispatch at every max_counts_bin (65 ms vs 76 ms
        # even at 30 bins, 65 vs 224 ms at the 1e6-bin default): the stage-2
        # compare histogram runs at the few bins actually hit instead of the
        # bucketed user bin count.

        lanes = self._lanes_fast(kmer_len, kmer_filter_func)
        if lanes is not None:
            from .ops.groups import lanes_sizes_digest

            size, qualifies, digest = lanes_sizes_digest(
                lanes["words"], lanes["cap"], kmer_len,
                jnp.uint32(min_group_size), max_gs, lanes["two_bit"],
            )
            return self._adaptive_hist_to_host(
                size, qualifies, np.asarray(digest), max_counts_bin
            )

        fl = self._filtered_lanes_stats(kmer_len, kmer_filter_func)
        if fl is not None:
            from .ops.groups import _SPEC_HIST_BINS, lanes_filtered_sizes_digest

            lanes, positions, split, (flags_fn, params, msgs) = fl
            surv, qualifies, digest = lanes_filtered_sizes_digest(
                lanes["words"], lanes["cap"], positions, jnp.asarray(params),
                kmer_len, jnp.uint32(min_group_size), max_gs, split,
                lanes["two_bit"], flags_fn,
            )
            digest = np.asarray(digest)
            # layout: [total, hi, speculative counts, (err_any, err_pos)*]
            self._raise_lanes_errs(digest[2 + _SPEC_HIST_BINS + 1 :], msgs)
            return self._adaptive_hist_to_host(
                surv, qualifies, digest, max_counts_bin
            )

        fd = self._filtered_device_stats(kmer_len, kmer_filter_func)
        if fd is not None:
            boundary, mask = fd
            if boundary.shape[0] == 0:
                return np.zeros(max_counts_bin + 1, dtype=np.int64), 0
            from .ops.groups import filtered_sizes_digest

            surv, qualifies, digest = filtered_sizes_digest(
                boundary, mask, jnp.uint32(min_group_size), max_gs
            )
            return self._adaptive_hist_to_host(
                surv, qualifies, np.asarray(digest), max_counts_bin
            )

        boundary = self._boundary_device(kmer_len, kmer_filter_func)
        if boundary.shape[0] == 0:
            return np.zeros(max_counts_bin + 1, dtype=np.int64), 0
        size = group_sizes_at_boundaries(boundary)
        from .ops.groups import sizes_digest

        qualifies, digest = sizes_digest(
            boundary, size, jnp.uint32(min_group_size), max_gs
        )
        return self._adaptive_hist_to_host(
            size, qualifies, np.asarray(digest), max_counts_bin
        )

    def _mesh_group_hist(
        self, kmer_len, kmer_filter_func, min_group_size, max_group_size,
        max_counts_bin, mesh,
    ) -> tuple[np.ndarray, int]:
        """Group-size histogram + total over the mesh (EXTENSION; exact
        parity with the single-chip engine).

        Fast path: a layout retained by ``sort(mesh=...)`` on the same mesh
        is reused directly — library filters apply as a device mask + stable
        per-shard compaction, so the whole pipeline is ONE sort plus ONE
        stats pass with no host round trip. Otherwise (no retained layout,
        or an arbitrary user callable) the filter survivors are selected on
        the default device and redistributed with a fresh sample sort.
        """
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .ops.filters import KeepAllFilter, KmerFilter
        from .ops.keys import compute_valid_len
        from .parallel import (
            compact_ragged,
            distributed_group_size_histogram_ragged,
            sample_sort_positions_ragged,
        )
        from .parallel.distributed import put_global

        # track_strands_separately rides as one extra identity lane in the
        # distributed kernel (positions >= split are "-"-strand k-mers)
        strand_split = (
            self._revcomp_offset() if self.track_strands_separately else None
        )

        dc = self._dc()
        use2 = kmer_len is not None and kmer_len <= 64 and dc.packed2 is not None
        packed2 = dc.packed2 if use2 else None
        packed = dc.packed if packed2 is None else None
        # unbounded (kmer_len=None, suffix identity) or beyond-word-limit
        # kmer_len: group identity comes from converged refinement run ids
        # (distributed_adjacent_gids) instead of key words — EXTENSION: the
        # reference's kmer_len=None semantics on the mesh
        need_gid = kmer_len is None or kmer_len > (
            64 if dc.packed2 is not None else 32
        )
        ext_gid = None

        cache = self._dist_cache
        sorted_words = None
        if (
            cache is not None
            and cache.mesh == mesh
            and isinstance(kmer_filter_func, KmerFilter)
        ):
            rag_pos, rag_pad = cache.positions, cache.is_pad
            if (
                isinstance(kmer_filter_func, KeepAllFilter)
                and cache.lanes is not None
                and cache.lanes_two_bit == (packed2 is not None)
                and kmer_len is not None
                and cache.built_k is not None
                and kmer_len <= cache.built_k
            ):
                # unfiltered stats over the retained layout: reuse the
                # sorted word lanes too (skips the per-shard key re-gather)
                sorted_words = cache.lanes
            mask_for_stats = None
            if not isinstance(kmer_filter_func, KeepAllFilter):
                # lanes-flags fast path: evaluate the filter directly on the
                # retained sharded lanes (the mesh analog of the single-chip
                # lanes-filtered stats) — no replicated-plane gather, no
                # host allgather for error checks, no survivor compaction
                # (group sizes count survivors in unfiltered group identity,
                # see distributed_group_size_histogram_ragged(mask=...))
                if (
                    cache.lanes is not None
                    and cache.built_k is not None
                    and kmer_len is not None
                    and kmer_len <= cache.built_k
                    and cache.lanes_two_bit == (packed2 is not None)
                ):
                    bpw = 16 if cache.lanes_two_bit else 8
                    nwb = -(-cache.built_k // bpw)
                    lanes_dict = {
                        "two_bit": cache.lanes_two_bit,
                        "built_k": cache.built_k,
                        "words": tuple(cache.lanes[:nwb]),
                        # the ragged sample sort strips its cap lane; the
                        # per-row caps the 2-bit flags need are recomputed
                        # inside mesh_lanes_filter_flags (one fused program)
                        "cap": None,
                        "cap_cover_check": self._cap_covers_min_k,
                    }
                    spec = kmer_filter_func.lanes_spec(
                        lanes_dict, int(len(self._host_sba())), self.min_kmer_len
                    )
                    if spec is not None:
                        from .parallel.distributed import mesh_lanes_filter_flags

                        flags_fn, params, msgs = spec
                        mask_for_stats, err_digest = mesh_lanes_filter_flags(
                            lanes_dict["words"], rag_pos, rag_pad,
                            jnp.asarray(params), flags_fn,
                            dc.seg_starts, dc.seg_ends, cache.built_k,
                        )
                        self._raise_lanes_errs(np.asarray(err_digest), msgs)
                        sorted_words = cache.lanes
            if not isinstance(kmer_filter_func, KeepAllFilter) and mask_for_stats is None:
                from .ops.filters import FilterContext

                valid_len = compute_valid_len(rag_pos, dc.seg_starts, dc.seg_ends)
                # host-side error checks over the valid rows only (ragged
                # padding rows carry sentinel positions)
                if jax.process_count() > 1:
                    from jax.experimental import multihost_utils

                    pos_np = np.asarray(
                        multihost_utils.process_allgather(rag_pos, tiled=True)
                    )
                    pad_np = np.asarray(
                        multihost_utils.process_allgather(rag_pad, tiled=True)
                    )
                    vl_np = np.asarray(
                        multihost_utils.process_allgather(valid_len, tiled=True)
                    )
                else:
                    pos_np = np.asarray(rag_pos)
                    pad_np = np.asarray(rag_pad)
                    vl_np = np.asarray(valid_len)
                ctx_check = FilterContext(
                    self._host_sba(), pos_np, vl_np,
                    valid_rows=(pad_np == 0),
                )
                kmer_filter_func.check_batch(ctx_check)
                # device mask over the sharded rows; survivors of a sorted
                # sequence stay sorted, so no re-sort — just re-compact pads
                # to each shard's tail (the stats' layout invariant).
                # Library filters with a flag-plane form replicate the
                # N-byte plane (built/cached on the single-device cache)
                # and gather bit 0 at the sharded rows — one uint8 gather
                # instead of the window kernels' 2-3 uint32 gathers
                from .ops.filters import flag_plane

                mask = None
                spec = kmer_filter_func._plane_spec()
                if spec is not None:
                    plane = flag_plane(dc, spec[0], spec[1])
                    if plane is not None:
                        plane_rep = put_global(plane, NamedSharding(mesh, P()))
                        rows = jnp.take(
                            plane_rep, rag_pos.astype(jnp.int32), mode="clip"
                        )
                        mask = (rows & jnp.uint8(1)) != 0
                if mask is None:
                    sba_rep = put_global(dc.sba, NamedSharding(mesh, P()))
                    ctx_mask = FilterContext(
                        self._host_sba(), rag_pos, valid_len, sba_dev=sba_rep
                    )
                    mask = kmer_filter_func.mask_pure(ctx_mask)
                new_pad = jnp.where(mask, rag_pad, jnp.uint32(1))
                rag_pos, rag_pad = compact_ragged(rag_pos, new_pad, mesh)
        else:
            mask_for_stats = None
            _, surv_pos, _ = self._survivors(kmer_filter_func)
            if need_gid:
                from .parallel import sample_sort_positions_unbounded

                # the unbounded redistribution's converged run ids ARE the
                # kmer_len identity (it sorts/refines at exactly kmer_len)
                rag_pos, rag_pad, ext_gid = sample_sort_positions_unbounded(
                    dc.packed if dc.packed2 is None else None, surv_pos,
                    dc.seg_starts, dc.seg_ends, mesh, packed2=dc.packed2,
                    max_kmer_len=kmer_len, return_ragged=True,
                )
            else:
                rag_pos, rag_pad, sorted_words = sample_sort_positions_ragged(
                    packed, surv_pos, dc.seg_starts, dc.seg_ends, kmer_len,
                    mesh, packed2=packed2, return_lanes=True,
                )
        if need_gid and ext_gid is None:
            if (
                isinstance(kmer_filter_func, KeepAllFilter)
                and cache is not None
                and cache.mesh == mesh
                and cache.gid_full is not None
                and kmer_len == cache.gid_full_k
            ):
                # stats identity equals the sort identity: the retained
                # converged run ids serve directly, zero refinement rounds
                ext_gid = cache.gid_full
            else:
                from .parallel.sample_sort import distributed_adjacent_gids

                ext_gid = distributed_adjacent_gids(
                    dc.packed if dc.packed2 is None else None, rag_pos,
                    rag_pad, dc.seg_starts, dc.seg_ends, kmer_len, mesh,
                    packed2=dc.packed2,
                )
        if ext_gid is not None:
            sorted_words = None
        from .parallel.distributed import distributed_hist_from_sizes

        size, qualifies, digest = distributed_group_size_histogram_ragged(
            packed, rag_pos, rag_pad, dc.seg_starts, dc.seg_ends, kmer_len,
            mesh, min_group_size=min_group_size, max_group_size=max_group_size,
            packed2=packed2, strand_split=strand_split,
            sorted_words=sorted_words, mask=mask_for_stats, return_sizes=True,
            ext_gid=ext_gid,
        )
        # adaptive stage 2 over the sharded sizes: the psum'd histogram runs
        # at a bin count the [total, hi] digest sized — the 1e6-bin default
        # stops psumming a 4 MB bin array over the ICI (the digest and the
        # counts prefix are replicated, so host reads are valid per process)
        out, total = self._adaptive_hist_to_host(
            size, qualifies, np.asarray(digest), max_counts_bin,
            hist_fn=lambda s, q, b: distributed_hist_from_sizes(s, q, b, mesh),
        )
        return out, total

    # ------------------------------------------------------------------ #
    # full-info closure (reference kmers.py:1180-1264)
    # ------------------------------------------------------------------ #

    def _record_info_func(self, one_based_seq_index: bool) -> Callable:
        """Closure mapping an ACTIVE-SBA index to
        ``(seg_num, sba_start, sba_end, strand, record_name, seq_idx)``.

        Forward / revcomp instances delegate to the SequenceCollection
        closure; both-mode instances dispatch on the concatenated-SBA half
        (segment numbering runs 0..R-1 forward then R..2R-1 revcomp, bounds
        reported in concatenated coordinates, seq_idx in the reference's
        forward-sequence convention for each strand)."""
        if self.kmer_source_strand != "both":
            return self.seq_coll.generate_get_record_info_from_sba_index_func(
                one_based_seq_index
            )

        from .sequence_collection import (
            get_forward_seq_idx,
            get_sba_start_end_indices_for_segment,
            get_segment_num_from_sba_index,
        )

        sc = self.seq_coll
        off = self._revcomp_offset()
        n_fwd_records = len(sc.forward_record_names)
        fwd_starts = sc._forward_sba_seg_starts
        rc_starts = sc._revcomp_sba_seg_starts
        len_fwd, len_rc = len(sc.forward_sba), len(sc.revcomp_sba)

        def get_record_info_from_sba_index(sba_idx: int):
            if sba_idx >= off:
                local = sba_idx - off
                seg = get_segment_num_from_sba_index(
                    local, "reverse_complement", rc_starts
                )
                s, e = get_sba_start_end_indices_for_segment(
                    seg, "reverse_complement", rc_starts, len_rc
                )
                seq_idx = get_forward_seq_idx(
                    local, "reverse_complement", s, e, one_based=one_based_seq_index
                )
                return (
                    n_fwd_records + seg,
                    s + off,
                    e + off,
                    "-",
                    sc.revcomp_record_names[seg],
                    seq_idx,
                )
            seg = get_segment_num_from_sba_index(sba_idx, "forward", fwd_starts)
            s, e = get_sba_start_end_indices_for_segment(
                seg, "forward", fwd_starts, len_fwd
            )
            seq_idx = get_forward_seq_idx(
                sba_idx, "forward", s, e, one_based=one_based_seq_index
            )
            return (seg, s, e, "+", sc.forward_record_names[seg], seq_idx)

        return get_record_info_from_sba_index

    def generate_get_kmer_info_func(self, one_based_seq_index: bool) -> Callable:
        get_record_info_from_sba_index = self._record_info_func(one_based_seq_index)

        def get_kmer_info(
            kmer_num, kmer_sba_start_indices, sba, kmer_len, group_size_yielded, group_size_total
        ):
            if kmer_num < 0:
                raise ValueError(f"kmer_num ({kmer_num}) cannot be less than zero")
            if kmer_num >= len(kmer_sba_start_indices):
                raise ValueError(
                    f"kmer_num ({kmer_num}) is out of bounds (num kmers = {len(kmer_sba_start_indices)})"
                )
            sba_idx = int(kmer_sba_start_indices[kmer_num])
            seg_num, s, e, seq_strand, seq_chrom, seq_start_idx = get_record_info_from_sba_index(
                sba_idx
            )
            if kmer_len is None:
                kmer_len = e - sba_idx + 1
            else:
                if sba_idx + kmer_len - 1 > e:
                    raise ValueError(
                        f"kmer_len ({kmer_len}) for kmer_num ({kmer_num}) extends beyond the end of the segment"
                    )
            return (
                kmer_num,
                seq_strand,
                seq_chrom,
                seq_start_idx,
                kmer_len,
                group_size_yielded,
                group_size_total,
            )

        return get_kmer_info

    # ------------------------------------------------------------------ #
    # equality (reference kmers.py:1266-1304)
    # ------------------------------------------------------------------ #

    def __ne__(self, other):
        return not self.__eq__(other)

    def __eq__(self, other):
        if self.min_kmer_len != other.min_kmer_len:
            return False
        if (self.max_kmer_len is None) != (other.max_kmer_len is None):
            return False
        if self.max_kmer_len is not None and self.max_kmer_len != other.max_kmer_len:
            return False
        if self.kmer_source_strand != other.kmer_source_strand:
            return False
        if self.track_strands_separately != other.track_strands_separately:
            return False
        if self._is_initialized != other._is_initialized:
            return False
        if self._is_set != other._is_set:
            return False
        if self._is_sorted != other._is_sorted:
            return False
        if (self.kmer_sba_start_indices is None) != (other.kmer_sba_start_indices is None):
            return False
        if self.kmer_sba_start_indices is not None and not np.array_equal(
            self.kmer_sba_start_indices, other.kmer_sba_start_indices
        ):
            return False
        if self.seq_coll != other.seq_coll:
            return False
        return True

    # ------------------------------------------------------------------ #
    # persistence (same schema as reference kmers.py:1306-1531)
    # ------------------------------------------------------------------ #

    def save(
        self,
        save_file_path,
        include_sequence_collection: bool = False,
        format: str = "hdf5",
        mode: str = "w",
    ) -> None:
        if format == "hdf5":
            self._save_hdf5(save_file_path, include_sequence_collection, mode=mode)
        elif format == "shelve":
            self._save_shelve(save_file_path, include_sequence_collection)
        else:
            raise ValueError(f"format ({format}) not recognized")

    def load(self, load_file_path, seq_coll=None, format: str = "hdf5") -> None:
        if format == "hdf5":
            self._load_hdf5(load_file_path, seq_coll)
        elif format == "shelve":
            self._load_shelve(load_file_path, seq_coll)
        else:
            raise ValueError(f"format ({format}) not recognized")
        self._pos_dev = None

    @staticmethod
    def _set_for_export(value, value_if_none):
        return value_if_none if value is None else value

    @staticmethod
    def _correct_import(value, value_if_none):
        if isinstance(value, np.ndarray):
            if value.shape == (0,):
                return None
        elif value == value_if_none:
            return None
        return value

    def _save_hdf5(self, save_file_path, include_sequence_collection=False, mode="w") -> None:
        import h5py

        with h5py.File(save_file_path, mode) as file:
            grp = file.create_group("kmers")
            empty_start_indices = np.array([], dtype=np.uint32)
            grp["min_kmer_len"] = self.min_kmer_len
            grp["max_kmer_len"] = self._set_for_export(self.max_kmer_len, 0)
            grp["kmer_source_strand"] = self.kmer_source_strand
            grp["track_strands_separately"] = self.track_strands_separately
            grp["_is_initialized"] = self._is_initialized
            grp["_is_set"] = self._is_set
            grp["_is_sorted"] = self._is_sorted
            grp["kmer_sba_start_indices"] = self._set_for_export(
                self.kmer_sba_start_indices, empty_start_indices
            )
        if include_sequence_collection:
            self.seq_coll.save(save_file_path, mode="a", format="hdf5")

    def _load_hdf5(self, load_file_path, seq_coll=None) -> None:
        import h5py

        with h5py.File(load_file_path, "r") as file:
            grp = file["kmers"]
            empty_start_indices = np.array([], dtype=np.uint32)
            self.min_kmer_len = int(grp["min_kmer_len"][()])
            self.max_kmer_len = self._correct_import(grp["max_kmer_len"][()], 0)
            if self.max_kmer_len is not None:
                self.max_kmer_len = int(self.max_kmer_len)
            self.kmer_source_strand = grp["kmer_source_strand"][()].decode("utf-8")
            # a persisted non-forward index came from the from_strand()
            # extension; restore its working mode
            self._strand_extension = self.kmer_source_strand != "forward"
            self.track_strands_separately = bool(grp["track_strands_separately"][()])
            self._is_initialized = bool(grp["_is_initialized"][()])
            self._is_set = bool(grp["_is_set"][()])
            self._is_sorted = bool(grp["_is_sorted"][()])
            self.kmer_sba_start_indices = self._correct_import(
                grp["kmer_sba_start_indices"][:], empty_start_indices
            )
        if seq_coll is not None:
            self.seq_coll = seq_coll
        else:
            self.seq_coll = SequenceCollection()
            self.seq_coll.load(load_file_path, format="hdf5")

    def _save_shelve(self, save_file_path, include_sequence_collection=False) -> None:
        with shelve.open(save_file_path) as db:
            db["min_kmer_len"] = self.min_kmer_len
            db["max_kmer_len"] = self.max_kmer_len
            db["kmer_source_strand"] = self.kmer_source_strand
            db["track_strands_separately"] = self.track_strands_separately
            db["_is_initialized"] = self._is_initialized
            db["_is_set"] = self._is_set
            db["_is_sorted"] = self._is_sorted
            db["kmer_sba_start_indices"] = self.kmer_sba_start_indices
        if include_sequence_collection:
            self.seq_coll.save(save_file_path, format="shelve")

    def _load_shelve(self, load_file_path, seq_coll=None) -> None:
        with shelve.open(load_file_path) as db:
            self.min_kmer_len = db["min_kmer_len"]
            self.max_kmer_len = db["max_kmer_len"]
            self.kmer_source_strand = db["kmer_source_strand"]
            self._strand_extension = self.kmer_source_strand != "forward"
            self.track_strands_separately = db["track_strands_separately"]
            self._is_initialized = db["_is_initialized"]
            self._is_set = db["_is_set"]
            self._is_sorted = db["_is_sorted"]
            self.kmer_sba_start_indices = db["kmer_sba_start_indices"]
        if seq_coll is None:
            self.seq_coll = SequenceCollection()
            self.seq_coll.load(load_file_path, format="shelve")
        else:
            self.seq_coll = seq_coll

    # ------------------------------------------------------------------ #
    # string extraction (reference kmers.py:1533-1622)
    # ------------------------------------------------------------------ #

    def get_kmer_str_no_checks(self, kmer_num: int, kmer_strand: str, kmer_len: int) -> str:
        if kmer_strand == "+":
            sba = self._host_sba()
            sba_start_idx = self.kmer_sba_start_indices[kmer_num]
        elif kmer_strand == "-":
            raise NotImplementedError("Only implemented for kmer_strand='+'")
        else:
            raise ValueError(f"kmer_strand ({kmer_strand}) not recognized")
        return bytearray(sba[sba_start_idx : sba_start_idx + kmer_len]).decode("utf-8")

    def get_kmer_strs(self, kmer_nums, kmer_len: Union[int, None]) -> list:
        """EXTENSION: decode many k-mers at once — bulk native/contiguous
        decode instead of a per-k-mer Python loop (reference
        kmers.py:1561-1622 is per-k-mer only). Bounds are checked in bulk; a
        k-mer running past its segment end raises like ``get_kmer_str``.
        ``kmer_len=None`` decodes each k-mer at its natural length
        (``min(max_kmer_len, bases to segment end)``), matching
        ``get_kmer_str(num, None)``."""
        if kmer_len is not None and kmer_len < 1:
            raise ValueError(f"kmer_len ({kmer_len}) must be a positive int")
        self._check_forward_only()
        nums = np.asarray(kmer_nums, dtype=np.int64)
        if nums.size == 0:
            return []
        if (nums < 0).any() or (nums >= len(self)).any():
            raise ValueError("kmer_num out of bounds")
        pos = self.kmer_sba_start_indices[nums].astype(np.int64)
        sba = self._host_sba()
        seg_starts = self._host_seg_starts().astype(np.int64)
        seg_ids = np.searchsorted(seg_starts, pos, side="right") - 1
        seg_e = np.where(
            seg_ids == len(seg_starts) - 1,
            len(sba) - 1,
            seg_starts[np.minimum(seg_ids + 1, len(seg_starts) - 1)] - 2,
        )
        if kmer_len is None:
            lens = seg_e - pos + 1
            if self.max_kmer_len is not None:
                lens = np.minimum(lens, self.max_kmer_len)
            data, offsets = self._decode_var_bytes(sba, pos, lens)
            b = data.tobytes()
            return [
                b[offsets[r] : offsets[r + 1]].decode("ascii")
                for r in range(len(pos))
            ]
        if (pos + kmer_len - 1 > seg_e).any():
            bad = int(nums[np.flatnonzero(pos + kmer_len - 1 > seg_e)[0]])
            raise ValueError(
                f"kmer_len ({kmer_len}) for kmer_num ({bad}) extends beyond the end of the segment"
            )
        return self._decode_block(sba, pos, kmer_len).tolist()

    @staticmethod
    def _decode_block_bytes(sba, pos, kmer_len) -> np.ndarray:
        """(n, kmer_len) uint8 byte matrix decoded at each position.

        Native path: one contiguous k-byte memcpy per row, multithreaded
        (native.decode_rows_native — measured ~12x the NumPy formulation at
        5M rows x k=31). NumPy fallback: one contiguous gather per OFFSET
        (itself ~10x the 2-D fancy-index gather: no giant int64 index
        temp), k passes over the output working set."""
        from .native import decode_rows_native

        p = pos.astype(np.int64)
        native = decode_rows_native(sba, p, kmer_len)
        if native is not None:
            return native
        out = np.empty((len(pos), kmer_len), dtype=np.uint8)
        for j in range(kmer_len):
            out[:, j] = sba[p + j]
        return out

    @classmethod
    def _decode_block(cls, sba, pos, kmer_len) -> np.ndarray:
        """Fixed-width decode to an U{k} string array, all in C (no per-row
        Python slicing — ~10x the old text-splitting loop at 10M rows)."""
        block = cls._decode_block_bytes(sba, pos, kmer_len)
        return block.view(f"S{kmer_len}").ravel().astype(f"U{kmer_len}")

    @staticmethod
    def _decode_var_bytes(sba, pos, lens) -> tuple[np.ndarray, np.ndarray]:
        """Variable-width decode: (data, offsets) with
        data[offsets[r] : offsets[r+1]] = sba[pos[r] : pos[r]+lens[r]] — an
        arrow-style string column (native memcpy rows; NumPy repeat-gather
        fallback)."""
        from .native import decode_rows_var_native

        p = pos.astype(np.int64)
        L = lens.astype(np.int64)
        native = decode_rows_var_native(sba, p, L)
        if native is not None:
            return native
        offsets = np.zeros(len(p) + 1, dtype=np.int64)
        np.cumsum(L, out=offsets[1:])
        total = int(offsets[-1])
        idx = np.repeat(p - offsets[:-1], L) + np.arange(total, dtype=np.int64)
        return sba[idx], offsets

    def get_kmer_str(self, kmer_num: int, kmer_len: Union[int, None] = None) -> str:
        self._check_forward_only()
        if kmer_num < 0:
            raise ValueError(f"kmer_num ({kmer_num}) cannot be less than zero")
        if kmer_num >= len(self):
            raise ValueError(f"kmer_num ({kmer_num}) is out of bounds (num kmers = {len(self)})")
        if kmer_len is not None and kmer_len < self.min_kmer_len:
            raise ValueError(
                f"kmer_len ({kmer_len}) is less than min_kmer_len ({self.min_kmer_len})"
            )
        if self.max_kmer_len is not None and kmer_len is not None and kmer_len > self.max_kmer_len:
            raise ValueError(
                f"kmer_len ({kmer_len}) is greater than max_kmer_len ({self.max_kmer_len})"
            )

        sba_start_idx = int(self.kmer_sba_start_indices[kmer_num])
        if self.kmer_source_strand == "both":
            # seq_coll per-strand lookups need an explicit strand when both
            # are loaded; segment bounds come straight off the concatenated
            # view instead
            _, _, sba_seg_end_idx, _, _, _ = self._record_info_func(False)(
                sba_start_idx
            )
        else:
            seg_num = self.seq_coll.get_segment_num_from_sba_index(sba_start_idx)
            _, sba_seg_end_idx = self.seq_coll.get_sba_start_end_indices_for_segment(seg_num)

        if kmer_len is None:
            largest_kmer_len = sba_seg_end_idx - sba_start_idx + 1
            if self.max_kmer_len is None:
                kmer_len = largest_kmer_len
            else:
                kmer_len = min(self.max_kmer_len, largest_kmer_len)

        if sba_start_idx + kmer_len - 1 > sba_seg_end_idx:
            raise ValueError(
                f"kmer_len ({kmer_len}) for kmer_num ({kmer_num}) extends beyond the end of the segment"
            )

        sba = self._host_sba()
        return bytearray(sba[sba_start_idx : sba_start_idx + kmer_len]).decode("utf-8")

    # ------------------------------------------------------------------ #
    # sort
    # ------------------------------------------------------------------ #

    def sort(self, mesh=None):
        """Sort kmer_sba_start_indices lexicographically by the k-mers they
        define (reference kmers.py:1624-1652), on the accelerator.

        Equal k-mers end up ordered by start index (the reference's
        break_ties=True mode) — deterministic, and string-identical to the
        reference's default unstable order.

        Args:
            mesh: optional ``jax.sharding.Mesh`` — run the splitter-based
                sample sort over the mesh instead of single-chip. EXTENSION;
                the reference is single-process only. A 1-D mesh
                (parallel.make_mesh) uses the flat one-hop all_to_all
                exchange; a 2-D ``(node, local)`` mesh
                (parallel.hier.make_mesh2) routes the SAME pipeline through
                the two-stage hierarchical exchange — node-aggregated blocks
                over the ``node`` axis (DCN on a real pod), intra-node
                fan-out over ``local`` (ICI) — with byte-identical output
                (tests/test_hier_integration.py).
        """
        self._check_forward_only()

        from .ops.keys import cap_lengths, compute_valid_len
        from .ops.sort import sort_positions

        self._lanes_cache = None  # every branch below re-establishes or clears
        self._suffix_gid_cache = None
        dc = self._dc()

        # Fresh-sort fast path: while _init_geometry is live the index IS the
        # canonical dense start set, so the sort can run gather-free over
        # every SBA position (shifted-slice key build + scatter/cummax
        # valid_len, invalid rows folded to the tail —
        # ops/sort.sort_positions_dense single-chip,
        # parallel.sample_sort_positions_dense_ragged on a mesh; the per-row
        # key gathers avoided are ~80% of the fresh k=31 build at 2^24 rows
        # on v5e). The position array is never materialized, and the
        # reference's validate_kmers check (kmers.py:1715-1727) holds by
        # construction.
        if self._init_geometry is not None:
            use2 = (
                self.max_kmer_len is not None
                and self.max_kmer_len <= 64
                and dc.packed2 is not None
            )
            limit = 64 if use2 else 32
            in_range = (
                self.max_kmer_len is not None and self.max_kmer_len <= limit
            )
            # only force the (lazy) 4-bit pack build once the k-limit gate
            # has passed — the unbounded mesh path below rides the 2-bit pack
            d_packed = (dc.packed2 if use2 else dc.packed) if in_range else None
            if (
                d_packed is not None
                and in_range
                and int(self._init_geometry[2]) > 1
            ):
                uniform = self.min_kmer_len == self.max_kmer_len
                if mesh is not None:
                    from .parallel import sample_sort_positions_dense_ragged

                    rag_pos, rag_pad, rag_lanes = sample_sort_positions_dense_ragged(
                        d_packed, dc.seg_starts, dc.seg_ends,
                        int(self._init_geometry[2]),
                        self.min_kmer_len, self.max_kmer_len, mesh,
                        two_bit=use2, uniform_cap=uniform, return_lanes=True,
                    )
                    self._dist_cache = _DistIndexCache(
                        mesh, rag_pos, rag_pad, int(self._init_geometry[2]),
                        lanes=rag_lanes, lanes_two_bit=use2,
                        built_k=self.max_kmer_len,
                    )
                    self._pos_dev = None
                    self._pos_host = None
                    self._init_geometry = None
                    self._lanes_cache = None
                    self._is_sorted = True
                    return
                from .ops.sort import sort_positions_dense

                sorted_pos, self._lanes_cache = sort_positions_dense(
                    d_packed, dc.seg_starts, dc.seg_ends,
                    int(self._init_geometry[2]),
                    self.min_kmer_len, self.max_kmer_len,
                    two_bit=use2, uniform_cap=uniform, return_lanes=True,
                )
                self._pos_dev = sorted_pos
                self._pos_host = None
                self._init_geometry = None
                self._dist_cache = None
                self._is_sorted = True
                return
            if mesh is None and int(self._init_geometry[2]) > 1 and not in_range:
                # unbounded (suffix-mode) or beyond-window max_kmer_len: the
                # first — dominant — refinement round still runs gather-free
                # over all SBA positions; only the unresolved-group re-sorts
                # gather (ops/sort.sort_positions_suffix_dense). ACGT
                # genomes ride the 2-bit rounds (half the key lanes).
                from .ops.sort import sort_positions_suffix_dense

                s_packed2 = dc.packed2
                s_packed = dc.packed if s_packed2 is None else None
                sorted_pos, sfx_gid = sort_positions_suffix_dense(
                    s_packed, dc.seg_starts, dc.seg_ends,
                    int(self._init_geometry[2]),
                    self.min_kmer_len, self.max_kmer_len, packed2=s_packed2,
                    return_gid=True,
                )
                # retain the converged run ids: suffix-identity boundary
                # masks (stats at kmer_len=None / =max_kmer_len) become a
                # pure adjacent diff — no window-loop re-compare
                self._suffix_gid_cache = (sfx_gid, self.max_kmer_len)
                self._pos_dev = sorted_pos
                self._pos_host = None
                self._init_geometry = None
                self._dist_cache = None
                self._is_sorted = True
                return

        positions = self._device_positions()
        valid_len = compute_valid_len(positions, dc.seg_starts, dc.seg_ends)

        # equivalent of the reference's validate_kmers pass (kmers.py:1715-1727)
        if self.min_kmer_len > 1:
            vl_min = int(valid_len.min()) if positions.shape[0] else self.min_kmer_len
            if vl_min < self.min_kmer_len:
                raise AssertionError(
                    f"kmers compared were less than min_kmer_len ({self.min_kmer_len}).  Was kmer_sba_start_indices initialized correctly?"
                )

        if mesh is not None:
            # 2-bit keys whenever the alphabet allows — never force the 4-bit
            # pack alongside (it would cost HBM + pack time for nothing)
            m_packed2 = dc.packed2
            m_packed = dc.packed if m_packed2 is None else None
            limit = 64 if m_packed2 is not None else 32
            uniform = (
                self.max_kmer_len is not None
                and self.min_kmer_len == self.max_kmer_len
            )
            if self.max_kmer_len is not None and self.max_kmer_len <= limit:
                from .parallel import sample_sort_positions_ragged

                rag_pos, rag_pad, rag_lanes = sample_sort_positions_ragged(
                    m_packed, positions, dc.seg_starts, dc.seg_ends,
                    self.max_kmer_len, mesh, packed2=m_packed2,
                    uniform_cap=uniform, return_lanes=True,
                )
                # retain the device-resident layout: a following mesh stats
                # or query call reuses it instead of re-sorting (and the
                # sorted word lanes, so stats skip the key re-gather)
                self._dist_cache = _DistIndexCache(
                    mesh, rag_pos, rag_pad, int(positions.shape[0]),
                    lanes=rag_lanes, lanes_two_bit=m_packed2 is not None,
                    built_k=self.max_kmer_len,
                )
                self._pos_dev = None
                self._pos_host = None
                self._init_geometry = None
                self._lanes_cache = None
                self._is_sorted = True
                return
            from .parallel import sample_sort_positions_unbounded

            rag_pos, rag_pad, gid_full = sample_sort_positions_unbounded(
                m_packed, positions, dc.seg_starts, dc.seg_ends, mesh,
                packed2=m_packed2, max_kmer_len=self.max_kmer_len,
                return_ragged=True,
            )
            # retain the device-resident ragged layout + its converged run
            # ids: mesh stats at the same identity then need ZERO
            # refinement rounds (EXTENSION: unbounded stats on the mesh)
            self._dist_cache = _DistIndexCache(
                mesh, rag_pos, rag_pad, int(positions.shape[0]),
                lanes=None, lanes_two_bit=m_packed2 is not None,
                built_k=None, gid_full=gid_full, gid_full_k=self.max_kmer_len,
            )
            self._pos_dev = None
            self._pos_host = None
            self._init_geometry = None
            self._lanes_cache = None
            self._is_sorted = True
            return
        else:
            # the 2-bit pack serves both the single-window sorts (k <= 64)
            # and the iterative-refinement rounds (suffix mode / long k,
            # halved key lanes) — only IUPAC genomes need the 4-bit pack
            packed2 = dc.packed2
            packed = dc.packed if packed2 is None else None
            uniform = (
                self.max_kmer_len is not None and self.min_kmer_len == self.max_kmer_len
            )
            cap = cap_lengths(valid_len, self.max_kmer_len)
            # N-containing genomes take the 4-bit path directly. The hybrid
            # 2-bit/4-bit split (ops/hybrid.py) is exact but measured SLOWER
            # on v5e: its partition step costs more than the key-lane savings
            # (docs/development.md). It remains available for callers on
            # hardware where the trade-off differs.
            # The sorted key lanes are retained (bounded k only): boundary
            # masks for any kmer_len <= max_kmer_len then need no genome
            # gathers (ops/sort.boundaries_from_sorted_lanes) — measured
            # ~65% of the stats cost. Costs n_words extra uint32 arrays of
            # HBM while the index lives.
            sorted_pos, self._lanes_cache = sort_positions(
                packed, positions, cap, self.max_kmer_len, packed2=packed2,
                uniform_cap=uniform, return_lanes=True,
            )
        # keep the result device-resident; the host view materializes lazily
        # (an eager transfer would cost a full index round-trip per sort)
        self._pos_dev = sorted_pos
        self._pos_host = None
        self._init_geometry = None  # no longer describes the (sorted) order
        self._dist_cache = None
        self._is_sorted = True

    def get_is_less_than_func(
        self, validate_kmers: bool = True, break_ties: bool = False
    ) -> Callable:
        """Host parity version of the reference's quicksort comparator
        closure (kmers.py:1654-1731). The TPU sort never calls it; it exists
        for API compatibility and comparator-level tests."""
        self._check_forward_only()
        sba = self._host_sba()
        min_kmer_len = self.min_kmer_len
        max_kmer_len = self.max_kmer_len

        def is_less_than(kmer_sba_start_idx_a: int, kmer_sba_start_idx_b: int) -> bool:
            comparison, last_kmer_index_compared = compare_sba_kmers_lexicographically(
                sba, sba, kmer_sba_start_idx_a, kmer_sba_start_idx_b, max_kmer_len=max_kmer_len
            )
            if comparison < 0:
                a_lt_b = True
            elif comparison > 0:
                a_lt_b = False
            else:
                a_lt_b = kmer_sba_start_idx_a < kmer_sba_start_idx_b if break_ties else False

            if validate_kmers:
                num_bases_to_check = min_kmer_len - (last_kmer_index_compared + 1)
                kmer_a_is_valid = kmer_has_required_len(
                    sba, kmer_sba_start_idx_a + last_kmer_index_compared + 1, num_bases_to_check
                )
                kmer_b_is_valid = kmer_has_required_len(
                    sba, kmer_sba_start_idx_b + last_kmer_index_compared + 1, num_bases_to_check
                )
                if not kmer_a_is_valid or not kmer_b_is_valid:
                    raise AssertionError(
                        f"kmers compared were less than min_kmer_len ({min_kmer_len}).  Was kmer_sba_start_indices initialized correctly?"
                    )
            return a_lt_b

        return is_less_than

    # ------------------------------------------------------------------ #
    # extensions beyond the reference (flagged; no reference analog)
    # ------------------------------------------------------------------ #

    def count_queries(
        self, queries: list, kmer_len: Union[int, None] = None, mesh=None
    ) -> np.ndarray:
        """EXTENSION: streaming occurrence counts for query k-mer strings via
        vectorized binary search over the sorted index (ops/query.py). The
        reference can only count by walking groups (kmers.py:994-1083).

        Query identity matches ``get_kmers(kmer_len=L)`` group identity, with
        L defaulting to the first query's length — so queries shorter than
        the index's max_kmer_len count PREFIX occurrences (the sorted order
        is a refinement of any shorter-prefix order, so this is exact).
        Requires a sorted index. Pass ``mesh`` to search a sharded copy of
        the index (per-shard bound search + psum, parallel/query.py).
        """
        if not self._is_sorted:
            raise ValueError("count_queries requires a sorted index. Run sort() first.")
        self._check_forward_only()
        if not queries:
            return np.zeros(0, dtype=np.uint32)
        if kmer_len is None:
            kmer_len = len(queries[0])
        if kmer_len < 1:
            raise ValueError(f"kmer_len ({kmer_len}) must be > 0")

        if mesh is not None:
            import jax.numpy as jnp

            from .parallel import distributed_count_queries
            from .parallel.distributed import mesh_pspec, mesh_size
            from .ops.sort import _PAD_POS

            dc = self._dc()
            cache = self._dist_cache
            if cache is not None and cache.mesh == mesh:
                # reuse the sharded layout retained by sort(mesh=...)
                return distributed_count_queries(
                    dc.packed, cache.positions, cache.is_pad,
                    dc.seg_starts, dc.seg_ends, queries, kmer_len, mesh,
                )
            positions = self._device_positions()
            n = positions.shape[0]
            n_dev = mesh_size(mesh)
            n_pad = -(-max(n, 1) // n_dev) * n_dev
            pad_rows = n_pad - n
            pos_p = jnp.concatenate(
                [positions, jnp.full((pad_rows,), _PAD_POS, dtype=positions.dtype)]
            ) if pad_rows else positions
            is_pad = jnp.concatenate(
                [jnp.zeros(n, dtype=jnp.uint32), jnp.ones(pad_rows, dtype=jnp.uint32)]
            ) if pad_rows else jnp.zeros(n, dtype=jnp.uint32)
            from jax.sharding import NamedSharding, PartitionSpec as P
            from .parallel.distributed import put_global

            sharding = NamedSharding(mesh, mesh_pspec(mesh))
            return distributed_count_queries(
                dc.packed, put_global(pos_p, sharding), put_global(is_pad, sharding),
                dc.seg_starts, dc.seg_ends, queries, kmer_len, mesh,
            )

        from .ops.keys import cap_lengths, compute_valid_len
        from .ops.query import count_queries as _count_queries
        from .ops.query import encode_query_words

        dc = self._dc()
        positions = self._device_positions()
        cap = cap_lengths(
            compute_valid_len(positions, dc.seg_starts, dc.seg_ends), kmer_len
        )
        q_words = encode_query_words(queries, kmer_len)
        return np.asarray(_count_queries(dc.packed, positions, cap, q_words, kmer_len))

    def count_queries_canonical(
        self, queries: list, kmer_len: Union[int, None] = None, mesh=None
    ) -> np.ndarray:
        """EXTENSION: strand-collapsed occurrence counts — each query counts
        its forward hits plus its reverse complement's hits (once, for
        palindromes). Completes BASELINE config 5's canonical + streaming
        query pairing; uppercase IUPAC queries (round 5 — was ACGT-only;
        complements per reference sequence_collection.py:402-433) and a
        sorted index. ``mesh`` routes both direction lookups through the
        distributed per-shard bound search
        (parallel.distributed_count_queries).
        """
        from .ops.encoding import iupac_revcomp_strs

        if self.kmer_source_strand == "both":
            raise NotImplementedError(
                "canonical queries are defined on a single-strand index; "
                "count_queries on a both-strand index already counts both "
                "strands"
            )
        if not queries:
            return np.zeros(0, dtype=np.uint32)
        rcs = iupac_revcomp_strs(queries)
        fwd = self.count_queries(queries, kmer_len, mesh=mesh)
        rc = self.count_queries(rcs, kmer_len, mesh=mesh)
        is_palindrome = np.array([q == r for q, r in zip(queries, rcs)])
        return fwd + np.where(is_palindrome, 0, rc).astype(np.uint32)

    def get_canonical_kmer_group_counts(
        self,
        kmer_len: int,
        max_counts_bin: int = 1000000,
        mesh=None,
    ) -> tuple[np.ndarray, int]:
        """EXTENSION: group-size histogram over CANONICAL (strand-collapsed)
        k-mers — each k-mer identified with min(kmer, revcomp(kmer))
        (ops/canonical.py). The reference declares both-strand handling but
        raises NotImplementedError (kmers.py:689-696).

        ACGT genomes ride the 2-bit lanes (kmer_len <= 64); IUPAC genomes
        take the 4-bit lanes with a per-nibble rank-space complement
        (round 5 — was NotImplementedError; R<->Y, K<->M, B<->V, D<->H, and
        N/S/W self-complementary per reference
        sequence_collection.py:402-433; kmer_len <= 32 there). Only
        full-length k-mers participate (truncated k-mers have no canonical
        form).

        Pass ``mesh`` (a jax.sharding.Mesh) to run the whole pipeline on the
        mesh: sharded gather-free canonical sample sort
        (parallel.sample_sort_canonical_dense_ragged) + halo-stitched
        distributed histogram over the retained canonical lanes. The mesh
        path requires the index to be the fresh dense start set (positions
        never customized).
        """
        self._check_forward_only()
        if self.kmer_source_strand == "both":
            raise NotImplementedError(
                "canonical statistics are defined on a single-strand index "
                "(a both-strand index already contains each k-mer's reverse "
                "complement)"
            )
        if max_counts_bin <= 0:
            raise ValueError(f"max_counts_bin ({max_counts_bin}) must be >= 1")

        import jax.numpy as jnp

        from .ops.canonical import canonical_sizes_digest, canonical_sizes_digest4
        from .ops.keys import compute_valid_len
        from .ops.sort import _PAD_POS, _bucket, _pad_to

        dc = self._dc()
        two_bit = dc.packed2 is not None
        limit = 64 if two_bit else 32
        if kmer_len is None or kmer_len < 1 or kmer_len > limit:
            raise ValueError(
                f"kmer_len ({kmer_len}) must be in [1, {limit}]"
                + ("" if two_bit else " (4-bit IUPAC lanes)")
            )
        packed_e = dc.packed2 if two_bit else dc.packed
        if mesh is not None:
            from .parallel import (
                distributed_group_size_histogram_ragged,
                sample_sort_canonical_dense_ragged,
                sample_sort_canonical_ragged,
            )

            from .parallel.distributed import distributed_hist_from_sizes

            if self._init_geometry is not None:
                if int(self._init_geometry[2]) == 0:
                    return np.zeros(max_counts_bin + 1, dtype=np.int64), 0
                rag_pos, rag_pad, rag_words = sample_sort_canonical_dense_ragged(
                    packed_e, dc.seg_starts, dc.seg_ends, self.min_kmer_len,
                    kmer_len, mesh, two_bit=two_bit,
                )
            else:
                # customized/filtered position sets: gather canonical
                # sample sort (round 4 — was NotImplementedError)
                positions = self._device_positions()
                if int(positions.shape[0]) == 0:
                    return np.zeros(max_counts_bin + 1, dtype=np.int64), 0
                rag_pos, rag_pad, rag_words = sample_sort_canonical_ragged(
                    packed_e, positions, dc.seg_starts, dc.seg_ends,
                    kmer_len, mesh, two_bit=two_bit,
                )
            size, qualifies, digest = distributed_group_size_histogram_ragged(
                None if two_bit else dc.packed, rag_pos, rag_pad,
                dc.seg_starts, dc.seg_ends, kmer_len, mesh,
                packed2=dc.packed2, sorted_words=rag_words,
                return_sizes=True,
            )
            return self._adaptive_hist_to_host(
                size, qualifies, np.asarray(digest), max_counts_bin,
                hist_fn=lambda s, q, b: distributed_hist_from_sizes(s, q, b, mesh),
            )
        # Gather-free dense fast path: while _init_geometry is live the index
        # IS the canonical dense start set, so the forward key words are
        # shifted slices of the 2-bit pack — no position materialization, no
        # per-row key gathers (the same formulation as the dense fresh sort;
        # the 2 key gathers are most of the gather kernel's cost at 2^24).
        if self._init_geometry is not None:
            if int(self._init_geometry[2]) == 0:
                return np.zeros(max_counts_bin + 1, dtype=np.int64), 0
            from .ops.canonical import canonical_sizes_digest_dense

            size, qualifies, digest = canonical_sizes_digest_dense(
                packed_e, dc.seg_starts, dc.seg_ends, self.min_kmer_len,
                kmer_len, two_bit=two_bit,
            )
            return self._adaptive_hist_to_host(
                size, qualifies, np.asarray(digest), max_counts_bin
            )
        positions = self._device_positions()
        n = int(positions.shape[0])
        if n == 0:
            return np.zeros(max_counts_bin + 1, dtype=np.int64), 0
        valid_len = compute_valid_len(positions, dc.seg_starts, dc.seg_ends)
        # shape-bucket (padding rows carry valid_len 0 => invalid lane) so
        # nearby sizes share one executable; truncated k-mers are excluded
        # on device — no valid_len download, no survivor-index upload
        n_pad = _bucket(n)
        positions = _pad_to(positions, n_pad, _PAD_POS)
        valid_len = _pad_to(valid_len, n_pad, jnp.uint32(0))
        digest_fn = canonical_sizes_digest if two_bit else canonical_sizes_digest4
        size, qualifies, digest = digest_fn(
            packed_e, positions, valid_len, kmer_len
        )
        return self._adaptive_hist_to_host(
            size, qualifies, np.asarray(digest), max_counts_bin
        )

    def to_csv(self, kmer_len, output_file_path, fields=["kmer"]):
        """Write k-mers to CSV.

        The reference declares this but leaves it a stub (kmers.py:1733-1737);
        implemented here as an extension. Supported fields: "kmer",
        "kmer_num", "chrom", "start", "strand", "group_size".
        """
        allowed = {"kmer", "kmer_num", "chrom", "start", "strand", "group_size"}
        bad = set(fields) - allowed
        if bad:
            raise ValueError(f"unrecognized fields: {sorted(bad)}")
        need_full = bool({"chrom", "start", "strand"} & set(fields))

        # bulk path (all kmer_len, incl. None): vectorized record lookup,
        # one native/contiguous string decode (fixed- or variable-width),
        # and a columnar C CSV writer (pyarrow; pandas fallback) — no
        # per-row Python loop (the reference-shaped loop, kept as
        # _to_csv_row_loop for parity tests, was the named API's throughput
        # ceiling at 10M+ rows). Output bytes are identical to the row-loop
        # writer, including its raise behavior.
        names = (
            self.seq_coll.revcomp_record_names
            if self.kmer_source_strand == "reverse_complement"
            else self.seq_coll.forward_record_names
        )
        seg_e = None
        if "group_size" not in fields:
            # lean path: with default group parameters every k-mer is
            # yielded in index order, so the group-geometry pass (and
            # its device downloads) is pure overhead — skip it
            nums = np.arange(len(self), dtype=np.int64)
            pos64 = self.kmer_sba_start_indices.astype(np.int64)
            gst_arr = None
            record_num, strand_col, seq_idx, seg_e = self._record_columns(
                pos64, False
            )
            # the row-loop writer only reaches a per-row length check when
            # it decodes a kmer (get_kmer_str) or yields full info — a bare
            # fields=["kmer_num"] run never raises, so neither does this
            if (
                kmer_len is not None
                and (need_full or "kmer" in set(fields))
                and (pos64 + kmer_len - 1 > seg_e).any()
            ):
                bad = int(nums[np.flatnonzero(pos64 + kmer_len - 1 > seg_e)[0]])
                raise ValueError(
                    f"kmer_len ({kmer_len}) for kmer_num ({bad}) extends beyond the end of the segment"
                )
            arrs = {
                "record_num": record_num,
                "strand": strand_col,
                "seq_start_idx": seq_idx,
            }
        else:
            arrs = self.get_kmers_full_arrays(kmer_len) if need_full else None
            if need_full:
                nums = arrs["kmer_num"]
                gst_arr = arrs["group_size_total"]
            else:
                nums, _, _, gst_arr = self.get_kmers_arrays(kmer_len)
        var_kmer = None  # (data, offsets) when kmer_len is None
        cols = {}
        for field in dict.fromkeys(fields):
            if field == "kmer":
                sba = self._host_sba()
                pos = self.kmer_sba_start_indices[nums].astype(np.int64)
                if kmer_len is None:
                    if seg_e is None:
                        _, _, _, seg_e = self._record_columns(pos, False)
                    lens = seg_e - pos + 1
                    if need_full:
                        # parity: the row-loop writer feeds the UNCLAMPED
                        # full-info kmer_len into get_kmer_str, which
                        # min/max-checks it per row
                        viol_min = lens < self.min_kmer_len
                        viol_max = (
                            (lens > self.max_kmer_len)
                            if self.max_kmer_len is not None
                            else np.zeros_like(viol_min)
                        )
                        viol = np.flatnonzero(viol_min | viol_max)
                        if viol.size:
                            r = int(viol[0])
                            if viol_min[r]:
                                raise ValueError(
                                    f"kmer_len ({int(lens[r])}) is less than min_kmer_len ({self.min_kmer_len})"
                                )
                            raise ValueError(
                                f"kmer_len ({int(lens[r])}) is greater than max_kmer_len ({self.max_kmer_len})"
                            )
                    elif self.max_kmer_len is not None:
                        # get_kmer_str(num, None) clamps to max_kmer_len
                        lens = np.minimum(lens, self.max_kmer_len)
                    var_kmer = self._decode_var_bytes(sba, pos, lens)
                    cols[field] = var_kmer
                else:
                    if seg_e is None:
                        # group_size paths with minimum info skipped the
                        # upfront check; get_kmer_str would raise per row
                        _, _, _, seg_e_k = self._record_columns(pos, False)
                        bad_rows = np.flatnonzero(pos + kmer_len - 1 > seg_e_k)
                        if bad_rows.size:
                            raise ValueError(
                                f"kmer_len ({kmer_len}) for kmer_num ({int(nums[bad_rows[0]])}) extends beyond the end of the segment"
                            )
                    cols[field] = (
                        self._decode_block_bytes(sba, pos, kmer_len)
                        .view(f"S{kmer_len}")
                        .ravel()
                    )
            elif field == "kmer_num":
                cols[field] = nums
            elif field == "chrom":
                cols[field] = arrs["record_num"]  # id; names applied below
            elif field == "start":
                cols[field] = arrs["seq_start_idx"]
            elif field == "strand":
                cols[field] = arrs["strand"]
            elif field == "group_size":
                cols[field] = gst_arr
        from .io.csv_out import write_csv_columnar

        write_csv_columnar(cols, fields, names, kmer_len, var_kmer,
                           output_file_path)

    def _to_csv_row_loop(self, kmer_len, output_file_path, fields=["kmer"]):
        """The reference-shaped per-row writer (generator walk +
        ``get_kmer_str`` per k-mer). Retained as the byte-identity oracle
        for ``to_csv``'s bulk path; tests compare the two outputs."""
        need_full = bool({"chrom", "start", "strand"} & set(fields))
        info_kind = "full" if need_full else "minimum"
        with open(output_file_path, "w") as f:
            f.write(",".join(fields) + "\n")
            for info in self.get_kmers(kmer_len, kmer_info_to_yield=info_kind):
                if need_full:
                    kmer_num, strand, chrom, start, klen, gsy, gst = info
                else:
                    kmer_num, gsy, gst = info
                    strand = chrom = start = None
                    klen = kmer_len
                row = []
                for field in fields:
                    if field == "kmer":
                        row.append(self.get_kmer_str(kmer_num, klen))
                    elif field == "kmer_num":
                        row.append(str(kmer_num))
                    elif field == "chrom":
                        row.append(str(chrom))
                    elif field == "start":
                        row.append(str(start))
                    elif field == "strand":
                        row.append(str(strand))
                    elif field == "group_size":
                        row.append(str(gst))
                f.write(",".join(row) + "\n")
