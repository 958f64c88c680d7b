"""Pallas TPU kernels for the hot preprocessing ops.

The compute path's heavy lifting (the sort) is XLA's tuned variadic sort; the
kernels here cover the ops *around* it where manual control of HBM traffic
pays: the 2-bit rank packing reads the genome once through VMEM with
double-buffered DMA and writes packed words in the same pass
(`pack_rank2_words_pallas`), instead of relying on XLA to fuse 16 shifted
slices of the rank array.

Rank mapping is arithmetic, not a table gather (TPU Pallas has no efficient
small-table lookup): for ACGT bytes, ``x = (b >> 1) & 3`` gives A0 C1 G3 T2
and ``x ^ ((x >> 1) & 1)`` swaps 2<->3 into lexicographic A0 C1 G2 T3.
Non-ACGT bytes ('$' separators) produce garbage ranks — harmless, because
every consumer masks key fields beyond the per-position compare cap, and a
'$' always lies at or beyond the cap (ops/keys.py). Parity with the jnp
implementation is pinned by tests for ACGT+'$' content.

Kernels fall back to the jnp implementations automatically when Pallas is
unavailable (CPU test runs use interpret mode instead).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .encoding import BASES_PER_WORD2

BLOCK = 1 << 16  # bytes of genome per grid step
_HALO = 1024  # Mosaic u8 VMEM slices must be 1024-aligned; 16 bytes needed


def _rank2_arith(b):
    """Arithmetic 2-bit rank for ACGT bytes (see module docstring)."""
    x = (b >> 1) & 3
    return x ^ ((x >> 1) & 1)


_LANES = 128
_BROWS = BLOCK // _LANES  # data rows per grid step
_HROWS = _HALO // _LANES  # halo rows (>= 1 needed; 8 keeps DMA 1024-aligned)


def _make_pack2_kernel(interpret: bool):
    """Mosaic supports rolls on 2D vectors only, so the kernel views the
    genome as (rows, 128) and expresses the flat shift-by-j as a lane roll
    plus a row-shifted copy selected by lane index."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = _BROWS + _HROWS

    def _roll(x, shift, axis):
        if interpret:
            return jnp.roll(x, shift, axis=axis)
        return pltpu.roll(x, shift, axis)

    def kernel(hbm_ref, out_ref, scratch, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(i * _BROWS, R), :], scratch, sem
        )
        dma.start()
        dma.wait()

        ranks = _rank2_arith(scratch[:].astype(jnp.int32)).astype(jnp.uint32)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
        acc = jnp.zeros((R, _LANES), dtype=jnp.uint32)
        for j in range(BASES_PER_WORD2):
            if j == 0:
                shifted = ranks
            else:
                # flat[i + j] laid out 2D: lane-roll left by j, and lanes that
                # wrapped take the NEXT row's values
                b = _roll(ranks, _LANES - j, 1)
                b_down = _roll(b, R - 1, 0)
                shifted = jnp.where(col < _LANES - j, b, b_down)
            acc = acc | (shifted << (2 * (15 - j)))
        out_ref[:, :] = acc[:_BROWS, :]

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def pack_rank2_words_pallas(sba_u8: jax.Array, interpret: bool = False) -> jax.Array:
    """2-bit packing as a single-pass Pallas kernel (TPU) — output identical
    to ``keys.pack_rank2_words`` for ACGT/'$' content up to cap-masked
    fields. The input is padded to a BLOCK multiple (+ an aligned halo) with
    zeros, which pack as garbage-but-masked fields exactly like '$'."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = sba_u8.shape[0]
    n_blocks = -(-n // BLOCK)
    total_rows = n_blocks * _BROWS + _HROWS
    padded = (
        jnp.zeros(total_rows * _LANES, dtype=jnp.uint8)
        .at[:n]
        .set(sba_u8)
        .reshape(total_rows, _LANES)
    )

    out = pl.pallas_call(
        _make_pack2_kernel(interpret),
        out_shape=jax.ShapeDtypeStruct((n_blocks * _BROWS, _LANES), jnp.uint32),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_BROWS, _LANES), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((_BROWS + _HROWS, _LANES), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    return out.reshape(-1)[:n]
