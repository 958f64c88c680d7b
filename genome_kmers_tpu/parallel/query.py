"""Streaming count queries against a DISTRIBUTED sorted index — EXTENSION
(BASELINE.json config 5: "streaming count queries against the distributed
sorted index").

The globally sorted index is partitioned across shards (possibly ragged with
per-shard trailing pads, as the sample sort leaves it), so a k-mer's global
occurrence count is the sum of its per-shard counts: every shard runs the
same vectorized lower/upper-bound binary search over its local run
(ops/query.py's algorithm, with an is_pad lead lane so trailing pads compare
above every query), and one psum produces the global counts. Queries are
replicated; cost is O(Q log(N/P)) gathers per shard, one small collective.
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

from ..ops.keys import build_key_words, cap_lengths, compute_valid_len
from ..ops.query import encode_query_words
from .distributed import AXIS, Mesh, mesh_axes, mesh_pspec, mesh_size, put_global


def _lex_less(a: tuple, b: tuple):
    lt = jnp.zeros(a[0].shape, dtype=bool)
    eq = jnp.ones(a[0].shape, dtype=bool)
    for wa, wb in zip(a, b):
        lt = lt | (eq & (wa < wb))
        eq = eq & (wa == wb)
    return lt


def _local_counts(packed, positions, cap_len, is_pad, q_words, n_words, n_rounds,
                  axes=AXIS):
    n = positions.shape[0]
    nq = q_words[0].shape[0]
    q_pad = jnp.zeros(nq, dtype=jnp.uint32)

    def bound(upper):
        lo = jnp.zeros(nq, dtype=jnp.int32)
        hi = jnp.full(nq, n, dtype=jnp.int32)
        # the loop carry becomes shard-varying (it reads local rows); mark the
        # replicated initial values varying so shard_map's vma typing matches
        try:
            lo = jax.lax.pcast(lo, axes, to="varying")
            hi = jax.lax.pcast(hi, axes, to="varying")
        except (AttributeError, TypeError):
            try:
                lo = jax.lax.pvary(lo, axes)
                hi = jax.lax.pvary(hi, axes)
            except AttributeError:
                pass

        def body(_, state):
            lo, hi = state
            active = lo < hi
            mid = (lo + hi) >> 1
            pos = jnp.take(positions, mid, mode="clip")
            cap = jnp.take(cap_len, mid, mode="clip")
            pad = jnp.take(is_pad, mid, mode="clip")
            kw = (pad,) + build_key_words(packed, pos, cap, n_words, jnp.uint32(0))
            qw = (q_pad,) + q_words
            if upper:
                go_right = ~_lex_less(qw, kw)
            else:
                go_right = _lex_less(kw, qw)
            lo = jnp.where(active & go_right, mid + 1, lo)
            hi = jnp.where(active & ~go_right, mid, hi)
            return lo, hi

        lo, hi = jax.lax.fori_loop(0, n_rounds, body, (lo, hi))
        return lo

    counts = (bound(True) - bound(False)).astype(jnp.uint32)
    return jax.lax.psum(counts, axes)


@partial(jax.jit, static_argnames=("n_words", "n_rounds", "mesh"))
def _dist_counts_jit(packed, positions, cap_len, is_pad, q_words, n_words, n_rounds, mesh):
    sp = mesh_pspec(mesh)
    fn = shard_map(
        partial(_local_counts, n_words=n_words, n_rounds=n_rounds,
                axes=mesh_axes(mesh)),
        mesh=mesh,
        in_specs=(P(), sp, sp, sp, tuple(P() for _ in q_words)),
        out_specs=P(),
    )
    return fn(packed, positions, cap_len, is_pad, q_words)


def _dist_counts_large_local(genome, pos_hi, pos_lo, cap_len, is_pad, q_words,
                             q_cap, n_words, n_rounds, two_bit, with_cap_key,
                             axes=AXIS):
    """Per-shard bound search in the LARGE regime: probe rows gather the
    (hi, lo) position pair and rebuild key words with the strided funnel
    build (ops/large.py). On the 2-bit path the compare cap rides as an
    explicit trailing key lane (termination is not in-word there), matching
    the sort's key order projected to the query length."""
    from ..ops.large import build_key2_words_strided, build_key_words_strided

    build = build_key2_words_strided if two_bit else build_key_words_strided
    n = pos_hi.shape[0]
    nq = q_words[0].shape[0]
    q_pad = jnp.zeros(nq, dtype=jnp.uint32)

    def bound(upper):
        lo = jnp.zeros(nq, dtype=jnp.int32)
        hi = jnp.full(nq, n, dtype=jnp.int32)
        try:
            lo = jax.lax.pcast(lo, axes, to="varying")
            hi = jax.lax.pcast(hi, axes, to="varying")
        except (AttributeError, TypeError):
            try:
                lo = jax.lax.pvary(lo, axes)
                hi = jax.lax.pvary(hi, axes)
            except AttributeError:
                pass

        def body(_, state):
            lo, hi = state
            active = lo < hi
            mid = (lo + hi) >> 1
            ph = jnp.take(pos_hi, mid, mode="clip")
            pl = jnp.take(pos_lo, mid, mode="clip")
            cap = jnp.take(cap_len, mid, mode="clip")
            pad = jnp.take(is_pad, mid, mode="clip")
            words = build(genome, ph, pl, cap, n_words, 0)
            if with_cap_key:
                kw = (pad,) + words + (cap,)
                qw = (q_pad,) + q_words + (q_cap,)
            else:
                kw = (pad,) + words
                qw = (q_pad,) + q_words
            if upper:
                go_right = ~_lex_less(qw, kw)
            else:
                go_right = _lex_less(kw, qw)
            lo = jnp.where(active & go_right, mid + 1, lo)
            hi = jnp.where(active & ~go_right, mid, hi)
            return lo, hi

        lo, hi = jax.lax.fori_loop(0, n_rounds, body, (lo, hi))
        return lo

    # per-shard counts stay local (P(AXIS)) — the cross-shard sum happens on
    # host in uint64, where a psum could wrap uint32 in this regime
    return (bound(True) - bound(False)).astype(jnp.uint32)


@partial(jax.jit, static_argnames=("n_words", "n_rounds", "two_bit",
                                   "with_cap_key", "mesh"))
def _dist_counts_large_jit(genome, pos_hi, pos_lo, cap_len, is_pad, q_words,
                           q_cap, n_words, n_rounds, two_bit, with_cap_key,
                           mesh):
    sp = mesh_pspec(mesh)
    fn = shard_map(
        partial(
            _dist_counts_large_local,
            n_words=n_words,
            n_rounds=n_rounds,
            two_bit=two_bit,
            with_cap_key=with_cap_key,
            axes=mesh_axes(mesh),
        ),
        mesh=mesh,
        in_specs=(P(), sp, sp, sp, sp,
                  tuple(P() for _ in q_words), P()),
        out_specs=sp,
    )
    return fn(genome, pos_hi, pos_lo, cap_len, is_pad, q_words, q_cap)


@partial(jax.jit, static_argnames=("kmer_len",))
def _large_caps_jit(pos_hi, pos_lo, is_pad, seg_tables, kmer_len):
    """Per-row compare caps at the query length, pads forced to 0 (they sort
    above every real row via the is_pad lead lane anyway)."""
    from ..ops.large import compute_valid_len64

    sh, sl, eh, el = seg_tables
    vl = compute_valid_len64(pos_hi, pos_lo, sh, sl, eh, el)
    cap = jnp.minimum(vl, jnp.uint32(kmer_len))
    return jnp.where(is_pad != 0, jnp.uint32(0), cap)


def distributed_count_queries_large(
    packed_strided,
    pos_hi: jax.Array,
    pos_lo: jax.Array,
    is_pad: jax.Array,
    seg_starts_u64: np.ndarray,
    seg_ends_u64: np.ndarray,
    queries: list,
    kmer_len: int,
    mesh: Mesh,
    two_bit: bool = True,
) -> np.ndarray:
    """Occurrence count per query string over a sharded sorted LARGE index
    (``sample_sort_positions_large_ragged`` layout) — uint64 counts, exact
    past 2^32 (per-query matches are per-shard uint32 sums accumulated on
    host in uint64). On the 2-bit pack, non-ACGT queries return 0 (they
    cannot occur in an ACGT-only genome)."""
    from ..ops.large import split64_np
    from ..ops.query import encode_query2_words, encode_query_words

    if not queries:
        return np.zeros(0, dtype=np.uint64)
    nq = len(queries)
    if two_bit:
        q_words_np, matchable = encode_query2_words(queries, kmer_len)
    else:
        q_words_np = encode_query_words(queries, kmer_len)
        matchable = np.ones(nq, dtype=bool)
    nq_pad = max(128, 1 << max(0, int(np.ceil(np.log2(max(nq, 1))))))
    q_words = tuple(np.pad(w, (0, nq_pad - nq)) for w in q_words_np)
    q_cap = np.full(nq_pad, kmer_len, dtype=np.uint32)

    sh, sl = split64_np(np.asarray(seg_starts_u64, dtype=np.uint64))
    eh, el = split64_np(np.asarray(seg_ends_u64, dtype=np.uint64))
    rep = NamedSharding(mesh, P())
    seg_tables = tuple(put_global(jnp.asarray(a), rep) for a in (sh, sl, eh, el))
    genome = put_global(packed_strided, rep)

    cap_len = _large_caps_jit(pos_hi, pos_lo, is_pad, seg_tables, kmer_len)
    bpw = 16 if two_bit else 8
    n_words = -(-kmer_len // bpw)
    n_local = pos_hi.shape[0] // mesh_size(mesh)
    n_rounds = max(1, int(np.ceil(np.log2(max(n_local, 2)))) + 1)
    counts = _dist_counts_large_jit(
        genome, pos_hi, pos_lo, cap_len, is_pad, q_words, q_cap,
        n_words, n_rounds, two_bit, two_bit, mesh,
    )
    n_dev = mesh_size(mesh)
    per_shard = np.asarray(counts).reshape(n_dev, nq_pad).astype(np.uint64)
    out = per_shard.sum(axis=0)[:nq]
    out[~matchable] = 0
    return out


def distributed_count_queries(
    packed: jax.Array,
    sorted_positions: jax.Array,
    is_pad: jax.Array,
    seg_starts: jax.Array,
    seg_ends: jax.Array,
    queries: list,
    kmer_len: int,
    mesh: Mesh,
) -> np.ndarray:
    """Occurrence count per query string over a sharded sorted index
    (``sample_sort_positions_ragged`` layout or evenly padded). Uses the
    4-bit key space, so full-IUPAC genomes are supported."""
    if not queries:
        return np.zeros(0, dtype=np.uint32)
    cap_len = cap_lengths(
        compute_valid_len(sorted_positions, seg_starts, seg_ends), kmer_len
    )
    cap_len = jnp.where(is_pad != 0, jnp.uint32(0), cap_len)
    n_words = -(-kmer_len // 8)
    n_local = sorted_positions.shape[0] // mesh_size(mesh)
    n_rounds = max(1, int(np.ceil(np.log2(max(n_local, 2)))) + 1)
    # numpy (not device-committed) so multi-process jit replicates them;
    # query count bucketed to the next power of two so nearby batch sizes
    # share one compiled program (pad queries = zero keys, sliced away)
    nq = len(queries)
    nq_pad = max(128, 1 << max(0, int(np.ceil(np.log2(max(nq, 1))))))
    q_words = tuple(
        np.pad(w, (0, nq_pad - nq)) for w in encode_query_words(queries, kmer_len)
    )
    packed = put_global(packed, NamedSharding(mesh, P()))
    counts = _dist_counts_jit(
        packed, sorted_positions, cap_len, is_pad, q_words, n_words, n_rounds, mesh
    )
    return np.asarray(counts)[:nq]
