"""Hierarchical (two-level) sample sort: node-aggregated exchange.

Real TPU pods are ICI/DCN-hierarchical — devices within a node (slice) talk
over fast ICI, nodes talk over slower DCN — while the flat sample sort's
single ``all_to_all`` (sample_sort.py step 4) is topology-oblivious: every
shard sends P-1 separate bucket messages, so a P-shard exchange crosses the
DCN in P*(P-L) small messages. This module keys the same pipeline over a
2-D ``(node, local)`` mesh and splits the exchange in two:

  stage A (inter-node): one ``all_to_all`` over the ``node`` axis moves,
    per source shard, ONE aggregated (L, C) block per destination node —
    the DCN sees N*N node-pair messages of L-bucket size instead of P*P
    shard-pair messages;
  stage B (intra-node): one ``all_to_all`` over the ``local`` axis fans the
    received blocks out to their final local shard — pure ICI traffic.

Output layout and values are IDENTICAL to the 1-D sample sort (same
splitters, same position tie-break): the ragged (positions, is_pad) pair is
sharded over the flattened ``("node", "local")`` axes in row-major shard
order, so downstream consumers that treat the global array see the same
bytes. The reference has no distributed code at all (SURVEY.md §2); this is
TPU-native design per SURVEY §5.8.

ROUND 5: the two-stage exchange is integrated into the MAIN pipeline —
``Kmers.sort(mesh=make_mesh2(...))`` / ``LargeKmers.sort(mesh2)`` and every
downstream stats/filter/query path accept a 2-D mesh directly
(sample_sort._exchange_merge branches on distributed.mesh_axes;
tests/test_hier_integration.py pins byte identity for all sort families).
``sample_sort_positions_ragged_hier`` below is the original standalone
twin, retained for its direct unit tests; ``make_mesh2`` is the public
mesh constructor.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..ops.sort import _cdiv
from .distributed import _pad_to_multiple, put_global
from .sample_sort import _lex_less_tuple, _searchsorted_rows, _words_at

AXES = ("node", "local")
_ONES = 0xFFFFFFFF


def make_mesh2(n_nodes: int, n_local: int, devices=None) -> Mesh:
    """2-D ``(node, local)`` mesh. On a real pod, map ``node`` to the
    DCN-separated dimension (hosts/slices) and ``local`` to ICI neighbors;
    on virtual CPU devices the split is logical but exercises the exact
    collective structure."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: n_nodes * n_local]).reshape(n_nodes, n_local)
    return Mesh(devices, AXES)


def _shard_map2(body, mesh, in_specs, out_specs):
    try:
        return shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except TypeError:  # older jax: no check_vma kwarg
        return shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs)


def _exchange_merge2(lanes, n_pos_lanes, padm, n_nodes, n_local, n_samples,
                     capacity):
    """Steps 1-5 of the sample-sort pipeline with the two-stage exchange.

    Identical math to sample_sort._exchange_merge — same regular-stride
    samples, same splitters, same destination search — only step 4's
    one-hop all_to_all becomes inter-node aggregation + intra-node fan-out.
    """
    m = lanes[0].shape[0]
    n_dev = n_nodes * n_local
    ones = jnp.uint32(_ONES)

    # 1. local sort
    lanes = jax.lax.sort(lanes, num_keys=len(lanes))

    # 2. regular-stride samples -> all_gather over BOTH axes -> splitters
    stride = max(m // n_samples, 1)
    samp_idx = (jnp.arange(n_samples, dtype=jnp.int32) * stride + stride // 2) % m
    local_samples = tuple(jnp.take(w, samp_idx) for w in lanes)
    gathered = tuple(
        jax.lax.all_gather(w, AXES).reshape(-1) for w in local_samples
    )
    gsorted = jax.lax.sort(gathered, num_keys=len(gathered))
    split_idx = (jnp.arange(n_dev - 1, dtype=jnp.int32) + 1) * n_samples
    splitters = tuple(jnp.take(w, split_idx, mode="clip") for w in gsorted)

    # 3. destination shard per row (global shard id = node * n_local + local)
    dest = _searchsorted_rows(splitters, lanes, n_dev - 1)

    n_real = (m - jnp.sum(padm.astype(jnp.int32))).astype(jnp.int32)
    b_range = jnp.arange(n_dev, dtype=jnp.int32)
    starts = jnp.minimum(jnp.searchsorted(dest, b_range, side="left").astype(jnp.int32), n_real)
    ends = jnp.minimum(jnp.searchsorted(dest, b_range, side="right").astype(jnp.int32), n_real)
    counts = ends - starts
    overflow = jnp.max(counts) > capacity

    # 4. two-stage exchange: pack (n_nodes, n_local, C) buffers; stage A
    # moves node-aggregated blocks over the node axis, stage B fans out
    # within the destination node
    slot = jax.lax.broadcasted_iota(jnp.int32, (n_dev, capacity), 1)
    row = starts[:, None] + slot
    valid = slot < counts[:, None]
    row = jnp.where(valid, row, 0)

    def pack(w, fill):
        out = jnp.take(w, row.reshape(-1), mode="clip").reshape(n_dev, capacity)
        return jnp.where(valid, out, fill)

    send = [pack(w, jnp.uint32(_ONES)) for w in lanes]
    send_valid = valid.astype(jnp.uint32)

    recv = []
    for w in send + [send_valid]:
        w3 = w.reshape(n_nodes, n_local, capacity)
        ra = jax.lax.all_to_all(w3, "node", split_axis=0, concat_axis=0)
        sb = jnp.swapaxes(ra, 0, 1)  # (n_local, n_nodes, C): dim 0 = local dest
        rb = jax.lax.all_to_all(sb, "local", split_axis=0, concat_axis=0)
        recv.append(rb.reshape(-1))
    flat, flat_valid = recv[:-1], recv[-1]

    # 5. local merge: is_pad leads so valid rows come first, in global order
    out_pad = (flat_valid == 0).astype(jnp.uint32)
    merged = jax.lax.sort((out_pad,) + tuple(flat), num_keys=len(flat) + 1)
    out_is_pad = merged[0]
    out_pos = tuple(merged[len(merged) - n_pos_lanes:])
    ov = jax.lax.psum(overflow.astype(jnp.uint32), AXES)
    out_lanes = tuple(merged[1 : len(merged) - n_pos_lanes])
    return out_pos, out_is_pad, out_lanes, ov


def _sample_sort_local2(genome, positions, cap_len, is_pad, n_words, n_nodes,
                        n_local, two_bit, n_samples, capacity, uniform_cap):
    words = _words_at(genome, (positions,), cap_len, n_words, two_bit, 0)
    padm = is_pad != jnp.uint32(0)
    ones = jnp.uint32(_ONES)
    words = tuple(jnp.where(padm, ones, w) for w in words)
    pos_k = (jnp.where(padm, ones, positions),)
    if uniform_cap:
        lanes = words + pos_k
    else:
        lanes = words + (jnp.where(padm, ones, cap_len),) + pos_k
    out_pos, out_is_pad, _lanes, ov = _exchange_merge2(
        lanes, 1, padm, n_nodes, n_local, n_samples, capacity
    )
    return out_pos[0], out_is_pad, ov


@partial(jax.jit, static_argnames=("n_words", "two_bit", "n_samples",
                                   "capacity", "uniform_cap", "mesh"))
def _sample_sort2_jit(genome, positions, cap_len, is_pad, n_words, two_bit,
                      n_samples, capacity, uniform_cap, mesh):
    n_nodes, n_local = mesh.shape["node"], mesh.shape["local"]
    fn = _shard_map2(
        partial(
            _sample_sort_local2,
            n_words=n_words,
            n_nodes=n_nodes,
            n_local=n_local,
            two_bit=two_bit,
            n_samples=n_samples,
            capacity=capacity,
            uniform_cap=uniform_cap,
        ),
        mesh,
        (P(), P(AXES), P(AXES), P(AXES)),
        (P(AXES), P(AXES), P()),
    )
    return fn(genome, positions, cap_len, is_pad)


def sample_sort_positions_ragged_hier(
    packed,
    positions,
    seg_starts,
    seg_ends,
    max_kmer_len: int,
    mesh2: Mesh,
    packed2=None,
    n_samples: int = 256,
    capacity_factor: float = 1.5,
    uniform_cap: bool = False,
):
    """Hierarchical-exchange twin of ``sample_sort_positions_ragged`` over a
    2-D ``(node, local)`` mesh (``make_mesh2``). Byte-identical output to
    the 1-D sort at the same total device count."""
    from ..ops.keys import cap_lengths, compute_valid_len
    from ..ops.sort import _PAD_POS

    limit = 64 if packed2 is not None else 32
    if max_kmer_len is None or max_kmer_len > limit:
        raise NotImplementedError(
            f"hierarchical sample sort requires max_kmer_len <= {limit} bases"
        )
    cap_len = cap_lengths(
        compute_valid_len(positions, seg_starts, seg_ends), max_kmer_len
    )
    two_bit = packed2 is not None
    genome = packed2 if two_bit else packed
    n = positions.shape[0]
    n_nodes, n_local = mesh2.shape["node"], mesh2.shape["local"]
    n_dev = n_nodes * n_local
    n_words = _cdiv(max_kmer_len, 16 if two_bit else 8)

    positions_p = _pad_to_multiple(positions, n_dev, _PAD_POS)
    cap_p = _pad_to_multiple(cap_len, n_dev, jnp.uint32(0))
    is_pad = _pad_to_multiple(jnp.zeros(n, dtype=jnp.uint32), n_dev, jnp.uint32(1))
    m = positions_p.shape[0] // n_dev
    n_samples = min(n_samples, m)

    sharding = NamedSharding(mesh2, P(AXES))
    positions_p = put_global(positions_p, sharding)
    cap_p = put_global(cap_p, sharding)
    is_pad = put_global(is_pad, sharding)
    genome = put_global(genome, NamedSharding(mesh2, P()))

    factor = capacity_factor
    while True:
        capacity = min(m, int(np.ceil(m / n_dev * factor)) + n_dev)
        out_pos, out_is_pad, overflow = _sample_sort2_jit(
            genome, positions_p, cap_p, is_pad, n_words, two_bit, n_samples,
            capacity, uniform_cap, mesh2,
        )
        if int(overflow) == 0:
            return out_pos, out_is_pad
        if capacity >= m:
            raise AssertionError("hier sample sort overflow at full capacity (bug)")
        factor *= 2.0
