"""Experimental Pallas row-gather: DMA-pipelined HBM row fetches.

The eval render is bound by gather ROW throughput (~100M rows/s on a v5e
via XLA's native gather, payload-insensitive to ~256 channels —
docs/PERFORMANCE.md). Each row is one trilinear sample's corner bundle
(8C channels). This kernel tests whether an explicit DMA pipeline — many
outstanding row copies rotated over a semaphore ring — beats XLA's gather
lowering. Numerics are pinned in interpret mode (tests/test_gather_rows.py);
throughput is measured by tools/bench_gather.py on real hardware
(tools/tpu_battery.sh runs it when the tunnel is up).

Layout note: this kernel gathers ROWS of a row-major (R, C) table (one row
= C contiguous bytes = one DMA descriptor). The production path
(ops/interp.py) keeps the repo's channel-first (C, R) layout for XLA; an
integration would transpose the bundled volume once at prepare time.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(block: int, inflight: int,
                   idx_ref, table_ref, out_ref, sems):
    """Grid dim 0 walks index blocks; per block, issue `block` single-row
    HBM->VMEM copies rotated over `inflight` DMA semaphores."""
    b = pl.program_id(0)

    def row_dma(i, slot):
        row = idx_ref[b * block + i]
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(row, 1), :],
            out_ref.at[pl.ds(i, 1), :],
            sems.at[slot])

    def issue(i, _):
        slot = jax.lax.rem(i, inflight)

        # before reusing a slot, retire the copy that used it last round
        @pl.when(i >= inflight)
        def _():
            row_dma(i - inflight, slot).wait()

        row_dma(i, slot).start()
        return 0

    jax.lax.fori_loop(0, block, issue, 0)

    # retire the tail: the last min(block, inflight) copies are in flight
    def drain(i, _):
        slot = jax.lax.rem(i, inflight)
        row_dma(i, slot).wait()
        return 0

    jax.lax.fori_loop(max(block - inflight, 0), block, drain, 0)


@functools.partial(jax.jit, static_argnames=("block", "inflight",
                                             "interpret"))
def gather_rows(table: jax.Array, idx: jax.Array, block: int = 512,
                inflight: int = 16, interpret: bool = False) -> jax.Array:
    """``table[idx]`` for a row-major (R, C) table and (N,) int32 indices.

    N must be a multiple of ``block`` (callers pad; padded indices must be
    in-range — use 0). Returns (N, C) in ``table.dtype``.
    """
    N = idx.shape[0]
    C = table.shape[1]
    assert N % block == 0, (N, block)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // block,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((block, C), lambda b, idx_ref: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((inflight,))],
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, block, inflight),
        out_shape=jax.ShapeDtypeStruct((N, C), table.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx.astype(jnp.int32), table)
