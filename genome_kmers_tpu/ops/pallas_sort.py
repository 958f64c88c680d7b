"""In-VMEM bitonic tile sort (Pallas TPU) — experimental round-2 groundwork.

``jax.lax.sort`` on TPU runs ~100x off HBM speed-of-light for this
workload's key shapes. This kernel sorts a VMEM-resident tile of uint32 key
lanes with a bitonic network driven entirely by on-the-fly index arithmetic:

  * the (L, d) stage schedule (153 stages for 2^17 rows) streams from SMEM;
  * compare-exchange partners are i XOR d — for d < 128 a lane-axis
    take_along_axis with ``lane_iota ^ d``, for d >= 128 a row-axis gather
    with ``row_iota ^ (d >> 7)`` (capability probed on v5e: 2D gathers with
    dynamic indices lower correctly; flat 1D gathers do not);
  * direction bit = (i & L) == 0, the classic ascending/descending tiling;
  * all lanes swap together under one lexicographic comparison, so the sort
    is a total order when the last lane is unique (position).

Single-tile scope for now: tiles up to VMEM capacity (~2^17 rows x 4 lanes).
The cross-tile streaming merge ladder is the remaining piece before this can
replace lax.sort in production (see CLAUDE.md round-2 notes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_LANES = 128


def _schedule(n: int):
    """Bitonic (L, d) stage list for n = power of two."""
    Ls, ds = [], []
    L = 2
    while L <= n:
        d = L >> 1
        while d >= 1:
            Ls.append(L)
            ds.append(d)
            d >>= 1
        L <<= 1
    return np.asarray(Ls, dtype=np.int32), np.asarray(ds, dtype=np.int32)


def _lex_lt(a: tuple, b: tuple):
    lt = jnp.zeros(a[0].shape, dtype=bool)
    eq = jnp.ones(a[0].shape, dtype=bool)
    for wa, wb in zip(a, b):
        lt = lt | (eq & (wa < wb))
        eq = eq & (wa == wb)
    return lt


def _make_kernel(n_lanes: int, rows: int, schedule, interpret: bool):
    """Statically unrolled bitonic network. XOR-partner exchange at distance
    d is two rolls + a bit-mask select (axis-0 gathers only span one vreg on
    TPU, so gathers are out; rolls are supported on both 2D axes). Static
    unrolling keeps every roll shift a compile-time constant."""
    from jax.experimental.pallas import tpu as pltpu

    def _roll(x, shift, axis):
        if interpret:
            return jnp.roll(x, shift, axis=axis)
        return pltpu.roll(x, shift % x.shape[axis], axis)

    def kernel(*refs):
        in_refs = refs[:n_lanes]
        out_refs = refs[n_lanes : 2 * n_lanes]

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
        gidx = row_iota * _LANES + lane_iota

        lanes = tuple(r[:, :] for r in in_refs)

        for L, d in schedule:
            if d < _LANES:
                axis, dist, iota = 1, d, lane_iota
            else:
                axis, dist, iota = 0, d // _LANES, row_iota
            # partner(i) = i XOR d: rows/lanes with the d-bit clear look
            # +dist ahead, the rest -dist behind
            fwd = tuple(_roll(x, -dist, axis) for x in lanes)
            bwd = tuple(_roll(x, dist, axis) for x in lanes)
            bit_clear = (iota & dist) == 0
            partners = tuple(
                jnp.where(bit_clear, f, b) for f, b in zip(fwd, bwd)
            )

            ascending = (gidx & L) == 0
            i_lt_j = (gidx & d) == 0
            # take_min = (i_lt_j == ascending), as pure logical ops — Mosaic
            # rejects i1==i1 / i1-select ("unsupported bitwidth truncation")
            take_min = (i_lt_j & ascending) | (~i_lt_j & ~ascending)
            p_lt_x = _lex_lt(partners, lanes)
            # min(x, p) when take_min else max(x, p)
            pick_partner = (take_min & p_lt_x) | (~take_min & ~p_lt_x)
            lanes = tuple(
                jnp.where(pick_partner, p, x) for x, p in zip(lanes, partners)
            )

        for o, x in zip(out_refs, lanes):
            o[:, :] = x

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def bitonic_sort_tile(lanes: tuple, interpret: bool = False) -> tuple:
    """Sort one VMEM tile of uint32 lanes lexicographically (all lanes are
    keys; swap together). Row count must make lanes[0].size a power of two
    with last dim 128."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, l128 = lanes[0].shape
    assert l128 == _LANES
    n = rows * _LANES
    assert n & (n - 1) == 0, "tile size must be a power of two"
    Ls, ds = _schedule(n)
    schedule = list(zip(Ls.tolist(), ds.tolist()))
    n_lanes = len(lanes)

    out = pl.pallas_call(
        _make_kernel(n_lanes, rows, schedule, interpret),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, _LANES), jnp.uint32) for _ in range(n_lanes)
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_lanes)],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_lanes)
        ),
        interpret=interpret,
    )(*lanes)
    return out if isinstance(out, tuple) else (out,)
