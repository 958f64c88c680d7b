"""Hierarchical (node, local) two-stage exchange sample sort
(parallel/hier.py): byte-identical output to the flat 1-D sample sort at
the same total device count, for every factorization of the mesh and both
key encodings. The multiprocess harness (tests/test_multiprocess.py ->
mp_worker.py) additionally runs it with the node axis on a REAL process
boundary."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genome_kmers_tpu.ops.keys import pack_rank2_words, pack_rank_words
from genome_kmers_tpu.parallel import make_mesh, sample_sort_positions_ragged
from genome_kmers_tpu.parallel.hier import (
    make_mesh2,
    sample_sort_positions_ragged_hier,
)


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(0)
    n = 20_003
    sba = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n)
    sba[8000] = ord("$")
    seg_starts = jnp.asarray(np.array([0, 8001], dtype=np.uint32))
    seg_ends = jnp.asarray(np.array([7999, n - 1], dtype=np.uint32))
    positions = np.sort(rng.choice(n - 40, size=15_000, replace=False)).astype(
        np.uint32
    )
    positions = positions[positions != 8000]
    sba_j = jnp.asarray(sba)
    return (
        pack_rank_words(sba_j),
        pack_rank2_words(sba_j),
        jnp.asarray(positions),
        seg_starts,
        seg_ends,
    )


def _factorizations():
    n = len(jax.devices())
    out = []
    a = 1
    while a <= n:
        if n % a == 0:
            out.append((a, n // a))
        a *= 2
    return out


@pytest.mark.parametrize("two_bit", [True, False])
def test_hier_equals_flat(genome, two_bit):
    packed, packed2, positions, seg_starts, seg_ends = genome
    k = 21
    n_dev = len(jax.devices())
    p2 = packed2 if two_bit else None
    flat_pos, flat_pad = sample_sort_positions_ragged(
        packed, positions, seg_starts, seg_ends, k, make_mesh(n_dev), packed2=p2
    )
    for nn, nl in _factorizations():
        h_pos, h_pad = sample_sort_positions_ragged_hier(
            packed, positions, seg_starts, seg_ends, k, make_mesh2(nn, nl),
            packed2=p2,
        )
        np.testing.assert_array_equal(np.asarray(flat_pos), np.asarray(h_pos))
        np.testing.assert_array_equal(np.asarray(flat_pad), np.asarray(h_pad))


def test_hier_feeds_ragged_stats(genome):
    """The hierarchical layout is a valid ragged layout: the distributed
    statistics consume it unchanged (re-laid onto the 1-D stats mesh)."""
    from genome_kmers_tpu.parallel import distributed_group_size_histogram_ragged

    packed, packed2, positions, seg_starts, seg_ends = genome
    k = 21
    n_dev = len(jax.devices())
    mesh1 = make_mesh(n_dev)
    flat_pos, flat_pad = sample_sort_positions_ragged(
        packed, positions, seg_starts, seg_ends, k, mesh1, packed2=packed2
    )
    c_ref, t_ref = distributed_group_size_histogram_ragged(
        packed, flat_pos, flat_pad, seg_starts, seg_ends, k, mesh1,
        max_counts_bin=30, packed2=packed2,
    )
    h_pos, h_pad = sample_sort_positions_ragged_hier(
        packed, positions, seg_starts, seg_ends, k,
        make_mesh2(max(n_dev // 2, 1), 2 if n_dev >= 2 else 1), packed2=packed2,
    )
    from genome_kmers_tpu.parallel.distributed import put_global
    from jax.sharding import NamedSharding, PartitionSpec as P
    from genome_kmers_tpu.parallel import AXIS

    sharding = NamedSharding(mesh1, P(AXIS))
    c_h, t_h = distributed_group_size_histogram_ragged(
        packed,
        put_global(np.asarray(h_pos), sharding),
        put_global(np.asarray(h_pad), sharding),
        seg_starts, seg_ends, k, mesh1, max_counts_bin=30, packed2=packed2,
    )
    np.testing.assert_array_equal(np.asarray(c_h), np.asarray(c_ref))
    assert int(t_h) == int(t_ref)


def test_hier_rejects_unbounded(genome):
    packed, packed2, positions, seg_starts, seg_ends = genome
    with pytest.raises(NotImplementedError, match="bounded|<="):
        sample_sort_positions_ragged_hier(
            packed, positions, seg_starts, seg_ends, None, make_mesh2(2, 2)
        )
