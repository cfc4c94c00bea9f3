"""Pallas NeuS-weights kernel vs the jnp exclusive-cumprod golden, value+grad.

Runs in interpret mode on the CPU test backend; compiled Mosaic on TPU.
"""
import numpy as np
import jax
import jax.numpy as jnp

from selfocc_tpu.models.neus import weights_from_alpha
from selfocc_tpu.ops.render_pallas import weights_from_alpha_pallas


def test_weights_match_jnp():
    rng = np.random.RandomState(0)
    alpha = jnp.asarray(rng.uniform(0, 1, size=(37, 19)).astype(np.float32))
    ref = np.asarray(weights_from_alpha(alpha))
    got = np.asarray(jax.jit(weights_from_alpha_pallas)(alpha))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_weights_saturated_alpha():
    alpha = jnp.asarray(
        np.r_[np.zeros(3), np.ones(3), 0.5 * np.ones(2)]
        .astype(np.float32)[None].repeat(4, 0))
    ref = np.asarray(weights_from_alpha(alpha))
    got = np.asarray(weights_from_alpha_pallas(alpha))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_weights_grad_matches_jnp():
    rng = np.random.RandomState(1)
    alpha = jnp.asarray(rng.uniform(0.01, 0.99, size=(9, 13)).astype(np.float32))
    cot = jnp.asarray(rng.randn(9, 13).astype(np.float32))
    g_ref = jax.grad(lambda a: jnp.sum(weights_from_alpha(a) * cot))(alpha)
    g_new = jax.grad(
        lambda a: jnp.sum(weights_from_alpha_pallas(a) * cot))(alpha)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-3)
