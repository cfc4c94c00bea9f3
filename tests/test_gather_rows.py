"""Numerics for the experimental Pallas DMA row-gather (interpret mode on
CPU; throughput is a TPU question — tools/bench_gather.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from selfocc_tpu.ops.gather_rows import gather_rows


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("block,inflight", [(64, 8), (128, 128)])
def test_gather_rows_matches_take(dtype, block, inflight):
    rng = np.random.RandomState(0)
    R, C, N = 300, 24, 256
    table = jnp.asarray(rng.randn(R, C), dtype)
    idx = jnp.asarray(rng.randint(0, R, size=(N,)), jnp.int32)
    got = gather_rows(table, idx, block=block, inflight=inflight,
                      interpret=True)
    want = jnp.take(table, idx, axis=0)
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gather_rows_repeated_and_boundary_indices():
    rng = np.random.RandomState(1)
    R, C = 50, 8
    table = jnp.asarray(rng.randn(R, C), jnp.float32)
    idx = jnp.asarray([0, 0, R - 1, R - 1, 7, 7, 7, 0] * 16, jnp.int32)
    got = gather_rows(table, idx, block=32, inflight=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(jnp.take(table, idx, axis=0)))
