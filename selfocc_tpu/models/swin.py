"""Swin Transformer backbone (flax, NHWC, TPU-first).

The reference's semantic teacher is OpenSeeD — a Swin-T backbone under a
detectron2/CUDA stack imported from an external, un-vendored package
(reference ``utils/openseed_utils.py:12-21``: ``from openseed import
build_model``). This module is the TPU-native backbone for the in-JAX
teacher (``models/upernet.py`` + ``utils/openseed_utils.py::JaxSemTeacher``):
a faithful Swin implementation, golden-tested against the runnable
HuggingFace torch implementation (``tests/test_swin_teacher.py``) and
weight-importable from any HF Swin/UperNet checkpoint
(``utils/swin_import.py``).

Design notes (TPU):
  - NHWC throughout; window partitioning is pure reshape/transpose (no
    gathers), so XLA keeps everything in registers between the LN and the
    attention matmuls.
  - All window bookkeeping (padding, shift masks, relative-position index)
    is computed with numpy at trace time from static shapes — nothing
    dynamic reaches the compiled program.
  - The relative-position index is a static constant; only the bias table
    is a parameter (matches HF parameter surface for import).
  - ``always_partition=True`` reproduces HF ``SwinBackbone`` semantics
    (fixed window/shift regardless of resolution); ``False`` reproduces
    ``SwinModel`` (window shrinks to min(resolution), shift drops to 0,
    decided statically at trace time).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    """Swin-T defaults (HF ``microsoft/swin-tiny-patch4-window7-224``)."""
    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-5


def _rel_pos_index(window: int) -> np.ndarray:
    """(w*w, w*w) index into the (2w-1)^2 bias table (HF
    ``modeling_swin.py:418-429``)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))                  # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]                      # (2, L, L)
    rel = rel.transpose(1, 2, 0).copy()
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)                                             # (L, L)


def _shift_mask(h_pad: int, w_pad: int, window: int, shift: int) -> np.ndarray:
    """(nW, L, L) additive attention mask for shifted windows (HF
    ``get_attn_mask``, ``modeling_swin.py:594-620``): 0 within a region,
    -100 across region boundaries created by the cyclic shift."""
    img = np.zeros((h_pad, w_pad), np.float32)
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    mw = img.reshape(h_pad // window, window, w_pad // window, window)
    mw = mw.transpose(0, 2, 1, 3).reshape(-1, window * window)     # (nW, L)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x, window: int):
    """(B, H, W, C) -> (B*nW, window*window, C); H, W multiples of window."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def window_reverse(x, window: int, h: int, w: int):
    """inverse of :func:`window_partition`."""
    c = x.shape[-1]
    x = x.reshape(-1, h // window, w // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, h, w, c)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (HF ``SwinSelfAttention`` +
    ``SwinSelfOutput``)."""
    dim: int
    num_heads: int
    window: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, mask: np.ndarray | None):
        # x: (B*nW, L, C); mask: static (nW, L, L) or None
        bn, L, c = x.shape
        hd = self.dim // self.num_heads
        q = nn.Dense(self.dim, use_bias=self.qkv_bias, name="query")(x)
        k = nn.Dense(self.dim, use_bias=self.qkv_bias, name="key")(x)
        v = nn.Dense(self.dim, use_bias=self.qkv_bias, name="value")(x)
        q = q.reshape(bn, L, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(bn, L, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(bn, L, self.num_heads, hd).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhld,bhmd->bhlm", q, k) / np.sqrt(hd)
        table = self.param(
            "relative_position_bias_table", nn.initializers.zeros,
            ((2 * self.window - 1) ** 2, self.num_heads))
        idx = _rel_pos_index(self.window)                        # static
        bias = table[idx.reshape(-1)].reshape(L, L, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None]
        if mask is not None:
            n_w = mask.shape[0]
            attn = attn.reshape(bn // n_w, n_w, self.num_heads, L, L)
            attn = attn + jnp.asarray(mask)[None, :, None]
            attn = attn.reshape(bn, self.num_heads, L, L)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhlm,bhmd->bhld", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(bn, L, c)
        return nn.Dense(self.dim, name="proj")(out)


class SwinBlock(nn.Module):
    """Pre-norm Swin layer (HF ``SwinLayer``): LN -> (S)W-MSA -> +res ->
    LN -> MLP -> +res. Window/shift resolved statically at trace time."""
    cfg: SwinConfig
    dim: int
    num_heads: int
    shift: int

    @nn.compact
    def __call__(self, x, always_partition: bool):
        b, h, w, c = x.shape
        window, shift = self.cfg.window_size, self.shift
        if not always_partition and min(h, w) <= window:
            # SwinModel semantics: window shrinks, shift drops (HF
            # set_shift_and_window_size)
            window, shift = min(h, w), 0
        eps = self.cfg.layer_norm_eps

        shortcut = x
        y = nn.LayerNorm(epsilon=eps, name="norm1")(x)
        pad_b = (window - h % window) % window
        pad_r = (window - w % window) % window
        y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = _shift_mask(hp, wp, window, shift)
        else:
            mask = None
        y = window_partition(y, window)
        y = WindowAttention(self.dim, self.num_heads, window,
                            self.cfg.qkv_bias, name="attn")(y, mask)
        y = window_reverse(y, window, hp, wp)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :h, :w]
        x = shortcut + y

        y = nn.LayerNorm(epsilon=eps, name="norm2")(x)
        y = nn.Dense(int(self.cfg.mlp_ratio * self.dim), name="mlp_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    """2x2 concat -> LN(4C) -> Linear(4C, 2C, no bias) (HF
    ``SwinPatchMerging``; odd dims padded first)."""
    dim: int
    eps: float

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        f0 = x[:, 0::2, 0::2]
        f1 = x[:, 1::2, 0::2]
        f2 = x[:, 0::2, 1::2]
        f3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([f0, f1, f2, f3], axis=-1)
        x = nn.LayerNorm(epsilon=self.eps, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


class SwinBackbone(nn.Module):
    """Swin encoder returning per-stage NHWC feature maps, each through its
    own LayerNorm (HF ``SwinBackbone`` with ``out_features`` = all stages,
    ``modeling_swin.py:1174-1269`` — the configuration UperNet consumes).
    """
    cfg: SwinConfig = SwinConfig()
    always_partition: bool = True

    @nn.compact
    def __call__(self, images) -> Sequence[jax.Array]:
        """images: (B, H, W, 3) float; returns 4 maps at strides 4/8/16/32
        with channels ``embed_dim * 2**i``."""
        cfg = self.cfg
        p = cfg.patch_size
        b, h, w, _ = images.shape
        images = jnp.pad(images, ((0, 0), (0, (p - h % p) % p),
                                  (0, (p - w % p) % p), (0, 0)))
        x = nn.Conv(cfg.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    name="patch_embed")(images)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="patch_norm")(x)

        feats = []
        for i, depth in enumerate(cfg.depths):
            dim = cfg.embed_dim * 2 ** i
            for j in range(depth):
                x = SwinBlock(cfg, dim, cfg.num_heads[i],
                              shift=0 if j % 2 == 0 else cfg.window_size // 2,
                              name=f"stage{i}_block{j}")(
                                  x, self.always_partition)
            # per-stage feature norm applies to the BEFORE-downsample map
            f = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                             name=f"stage{i}_out_norm")(x)
            feats.append(f)
            if i < len(cfg.depths) - 1:
                x = PatchMerging(dim, cfg.layer_norm_eps,
                                 name=f"stage{i}_downsample")(x)
        return feats
