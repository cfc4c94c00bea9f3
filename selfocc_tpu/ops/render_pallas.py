"""Pallas TPU kernel for the NeuS weight accumulation (exclusive-cumprod
transmittance), the renderer's only non-gather hot op.

Replaces nerfacc's CUDA ``render_weight_from_alpha`` scan kernel (reference
``model/head/nerfacc_head.py`` / SURVEY §2.9) with an MXU formulation:

    w_i = a_i * prod_{j<i} (1 - a_j + eps)
        = a_i * exp( sum_{j<i} log(1 - a_j + eps) )

and the strictly-lower-triangular *exclusive cumsum* is computed as one
(S, S) matmul per ray block — a sequential scan recast onto the systolic
array, the idiomatic TPU shape for short-axis scans (S = 256 in all shipped
configs).  XLA lowers ``jnp.cumprod`` to a log-depth chain of shifted
multiplies over HBM-resident temporaries; here the whole block stays in VMEM.

Autodiff: ``pallas_call`` has no AD rule, so ``weights_from_alpha_pallas``
carries a closed-form ``custom_vjp`` (the backward is two dense ops, plain
XLA — training batches are small; the forward is the 2M-ray eval hot path).

Off-TPU (the CPU test mesh) the kernel runs in interpret mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_EPS = 1e-7


def _weights_kernel(a_ref, o_ref):
    a = a_ref[...]                                        # (Rb, S) f32
    S = a.shape[-1]
    la = jnp.log(1.0 - a + _EPS)
    # M[j, i] = 1 iff j < i  ->  (la @ M)[r, i] = sum_{j<i} la[r, j]
    row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    tri = (row < col).astype(jnp.float32)
    # HIGHEST: the default bf16 MXU passes give ~4e-3 rel error on the log
    # sums, which exp() turns into percent-level weight error
    ex = jnp.dot(la, tri, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    o_ref[...] = a * jnp.exp(ex)


def _forward(alpha, block_rays: int):
    R, S = alpha.shape
    pad_r = (-R) % block_rays
    pad_s = (-S) % 128                                    # lane alignment
    a = jnp.pad(alpha.astype(jnp.float32), ((0, pad_r), (0, pad_s)))
    Sp = S + pad_s
    out = pl.pallas_call(
        _weights_kernel,
        grid=((R + pad_r) // block_rays,),
        in_specs=[pl.BlockSpec((block_rays, Sp), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((block_rays, Sp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R + pad_r, Sp), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(a)
    return out[:R, :S]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def weights_from_alpha_pallas(alpha, block_rays: int = 256):
    """Drop-in for ``neus.weights_from_alpha`` on (R, S) alpha."""
    return _forward(alpha, block_rays)


def _fwd(alpha, block_rays):
    w = _forward(alpha, block_rays)
    return w, (alpha, w)


def _bwd(block_rays, res, g):
    alpha, w = res
    # w_i = a_i * t_i,  t_i = exp(sum_{j<i} log(1 - a_j + eps))
    # da_k = g_k t_k - (1/(1 - a_k + eps)) * sum_{i>k} g_i w_i
    t = w / jnp.where(alpha > 0, alpha, 1.0)
    t = jnp.where(alpha > 0, t, _recompute_trans(alpha))
    gw = g * w
    suffix = jnp.flip(jnp.cumsum(jnp.flip(gw, -1), -1), -1) - gw
    return (g * t - suffix / (1.0 - alpha + _EPS),)


def _recompute_trans(alpha):
    trans = jnp.cumprod(1.0 - alpha + _EPS, axis=-1)
    return jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)


weights_from_alpha_pallas.defvjp(_fwd, _bwd)
