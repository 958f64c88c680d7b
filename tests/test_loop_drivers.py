"""The two refinement-loop drivers must be bit-identical.

Iterative sorts have a fused lax.while_loop driver (zero host syncs; the
default where the backend executes device-side loops — CPU, real TPU
runtimes) and a host-driven fallback (the axon remote tunnel compiles
while_loop but never finishes executing it; ops/sort._device_loops_ok).
GKT_HOST_LOOPS=1 forces the fallback; these tests pin both drivers to the
same outputs on genomes that need multiple refinement rounds."""

import numpy as np
import pytest

import jax.numpy as jnp

from genome_kmers_tpu.ops import sort as sort_mod
from genome_kmers_tpu.ops.keys import (
    cap_lengths,
    compute_seg_ends,
    compute_valid_len,
    pack_rank2_words,
    pack_rank_words,
)


def _repeat_genome(n=4096, unit=96, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=unit)
    return np.tile(u, n // unit + 1)[:n]


def _both_drivers(monkeypatch, fn):
    # a pre-set GKT_HOST_LOOPS (the axon escape hatch) would silently turn
    # this into host==host — force the fused driver for the first run
    monkeypatch.delenv("GKT_HOST_LOOPS", raising=False)
    assert sort_mod._device_loops_ok()
    res_fused = fn()
    monkeypatch.setenv("GKT_HOST_LOOPS", "1")
    assert not sort_mod._device_loops_ok()
    res_host = fn()
    monkeypatch.delenv("GKT_HOST_LOOPS")
    assert sort_mod._device_loops_ok()
    return res_fused, res_host


@pytest.mark.parametrize("two_bit", [True, False])
@pytest.mark.parametrize("min_k,max_k", [(1, None), (3, None), (1, 80)])
def test_suffix_dense_drivers_equal(monkeypatch, two_bit, min_k, max_k):
    sba = _repeat_genome()
    n_bp = len(sba)
    seg_starts = jnp.zeros(1, dtype=jnp.uint32)
    seg_ends = compute_seg_ends(seg_starts, n_bp)
    packed2 = pack_rank2_words(jnp.asarray(sba)) if two_bit else None
    packed = None if two_bit else pack_rank_words(jnp.asarray(sba))
    n = n_bp - min_k + 1

    def run():
        return sort_mod.sort_positions_suffix_dense(
            packed, seg_starts, seg_ends, n, min_k, max_k, packed2=packed2,
            return_gid=True,
        )

    (pf, gf), (ph, gh) = _both_drivers(monkeypatch, run)
    np.testing.assert_array_equal(np.asarray(pf), np.asarray(ph))
    np.testing.assert_array_equal(np.asarray(gf), np.asarray(gh))


@pytest.mark.parametrize("two_bit", [True, False])
def test_gather_iterative_drivers_equal(monkeypatch, two_bit):
    sba = _repeat_genome(2048, 64, seed=3)
    n_bp = len(sba)
    seg_starts = jnp.zeros(1, dtype=jnp.uint32)
    seg_ends = compute_seg_ends(seg_starts, n_bp)
    rng = np.random.default_rng(1)
    positions = jnp.asarray(
        rng.permutation(np.arange(n_bp - 7, dtype=np.uint32))
    )
    cap = cap_lengths(
        compute_valid_len(positions, seg_starts, seg_ends), 0xFFFFFFF0
    )
    packed2 = pack_rank2_words(jnp.asarray(sba)) if two_bit else None
    packed = pack_rank_words(jnp.asarray(sba))

    def run():
        return sort_mod.sort_positions(
            packed, positions, cap, None, packed2=packed2
        )

    pf, ph = _both_drivers(monkeypatch, run)
    np.testing.assert_array_equal(np.asarray(pf), np.asarray(ph))


def test_adjacent_boundaries_drivers_equal(monkeypatch):
    sba = _repeat_genome(2048, 64, seed=5)
    n_bp = len(sba)
    seg_starts = jnp.zeros(1, dtype=jnp.uint32)
    seg_ends = compute_seg_ends(seg_starts, n_bp)
    packed = pack_rank_words(jnp.asarray(sba))
    positions = jnp.asarray(np.arange(n_bp - 1, dtype=np.uint32))
    cap = cap_lengths(
        compute_valid_len(positions, seg_starts, seg_ends), 0xFFFFFFF0
    )
    spos = sort_mod.sort_positions(packed, positions, cap, None)
    scap = cap_lengths(
        compute_valid_len(spos, seg_starts, seg_ends), 0xFFFFFFF0
    )

    def run():
        # kmer_len beyond the 32-base window, 4-bit path (the loop driver)
        return sort_mod.adjacent_boundaries(packed, spos, scap, 200)

    bf, bh = _both_drivers(monkeypatch, run)
    np.testing.assert_array_equal(np.asarray(bf), np.asarray(bh))


def test_axon_runtime_detected_by_platform_version(monkeypatch):
    """The axon plugin registers platform == "tpu" (jax.default_backend()
    says "tpu", not "axon") — only the client's platform_version string
    identifies the tunnel runtime. A platform check alone would route the
    fused while_loop driver onto axon and wedge the chip."""

    class _Client:
        platform_version = (
            "axon 0.1.0; SerializedExecutable v9; compile-cache v14"
        )

    class _Dev:
        platform = "tpu"
        client = _Client()

    import jax as _jax

    monkeypatch.setattr(_jax, "devices", lambda *a, **k: [_Dev()])
    assert not sort_mod._device_loops_ok()
    _Client.platform_version = "TFRT CPU v0"
    assert sort_mod._device_loops_ok()


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_suffix_dense_drivers_fuzz_multiseg(monkeypatch, seed):
    """Random multi-segment genomes (tiny + repeat-bearing segments, '$'
    boundaries in play) through both drivers, both encodings."""
    rng = np.random.default_rng(seed)
    segs = []
    for _ in range(int(rng.integers(2, 5))):
        n = int(rng.integers(40, 900))
        seg = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n)
        if rng.random() < 0.7 and n > 120:  # plant a long internal repeat
            u = seg[: int(rng.integers(36, 70))]
            reps = min(n // len(u), 4)
            seg[: len(u) * reps] = np.tile(u, reps)
        segs.append(seg)
    dollar = np.frombuffer(b"$", dtype=np.uint8)
    sba = np.concatenate(sum(([s, dollar] for s in segs), []))[:-1]
    starts, pos_acc = [], 0
    for s in segs:
        starts.append(pos_acc)
        pos_acc += len(s) + 1
    seg_starts = jnp.asarray(np.asarray(starts, dtype=np.uint32))
    seg_ends = jnp.asarray(
        np.asarray([st + len(s) - 1 for st, s in zip(starts, segs)],
                   dtype=np.uint32)
    )
    min_k = int(rng.integers(1, 4))
    max_k = None if rng.random() < 0.6 else int(rng.integers(40, 90))
    n = sum(len(s) - min_k + 1 for s in segs)
    packed2 = pack_rank2_words(jnp.asarray(sba))
    packed = pack_rank_words(jnp.asarray(sba))

    for p, p2 in ((None, packed2), (packed, None)):
        def run():
            return sort_mod.sort_positions_suffix_dense(
                p, seg_starts, seg_ends, n, min_k, max_k, packed2=p2,
                return_gid=True,
            )

        (pf, gf), (ph, gh) = _both_drivers(monkeypatch, run)
        np.testing.assert_array_equal(np.asarray(pf), np.asarray(ph))
        np.testing.assert_array_equal(np.asarray(gf), np.asarray(gh))
