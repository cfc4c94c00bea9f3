"""Grid <-> metric-space mappings for TPV/BEV plane representations.

TPU-native re-design of the coordinate mappings in the SelfOcc reference
(``model/encoder/bevformer/mappings.py``): pure-functional jax.numpy math over
static Python-scalar geometry so everything traces cleanly under ``jax.jit``.

Two modes (reference ``mappings.py:153-196``):
  * ``linear``: piecewise-linear inner/outer cells, optional half-range axes
    (reference ``LinearMapping``, ``mappings.py:4-150``).
  * ``linear_upscale``: uniform inner cells + quadratically growing outer cells
    (reference ``NonLinearMapping``, ``mappings.py:199-287``).

Conventions (identical to the reference):
  * ``grid`` coordinates are fractional cell indices ordered ``(h, w, d)``.
  * ``meter`` coordinates are metric ``(x, y, z)``; ``h`` maps to ``y``,
    ``w`` maps to ``x`` and ``d`` maps to ``z``.
  * ``meter2grid(..., normalize=True)`` divides by ``size - 1`` so the result
    lands in ``[0, 1]`` for in-range points (align_corners=True convention).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp


def _piecewise_fwd(ctr_abs, size, rng):
    """|grid-center| -> |meters| for a two-segment piecewise-linear axis.

    Mirrors reference ``mappings.py:52-61``: inner segment covers ``size[0]``
    cells over ``rng[0]`` meters, outer segment ``size[1]`` cells over
    ``rng[1]`` meters.
    """
    if size[1] == 0:
        return ctr_abs / size[0] * rng[0]
    return jnp.where(
        ctr_abs > size[0],
        rng[0] + (ctr_abs - size[0]) / size[1] * rng[1],
        ctr_abs / size[0] * rng[0],
    )


def _piecewise_inv(m_abs, size, rng):
    """|meters| -> |grid-center|, inverse of :func:`_piecewise_fwd`.

    Mirrors reference ``mappings.py:101-109``.
    """
    if size[1] == 0:
        return m_abs / rng[0] * size[0]
    return jnp.where(
        m_abs > rng[0],
        size[0] + (m_abs - rng[0]) / rng[1] * size[1],
        m_abs / rng[0] * size[0],
    )


@dataclasses.dataclass(frozen=True)
class LinearMapping:
    """Piecewise-linear grid<->meter mapping (reference ``mappings.py:4-150``)."""

    h_size: Sequence[int] = (128, 32)
    h_range: Sequence[float] = (51.2, 28.8)
    h_half: bool = False
    w_size: Sequence[int] = (128, 32)
    w_range: Sequence[float] = (51.2, 28.8)
    w_half: bool = False
    d_size: Sequence[int] = (20, 10)
    d_range: Sequence[float] = (-4.0, 4.0, 12.0)

    @property
    def d_spans(self):
        # (inner span, outer span) in meters along z; reference mappings.py:26.
        return (self.d_range[1] - self.d_range[0], self.d_range[2] - self.d_range[1])

    @property
    def d_start(self):
        return self.d_range[0]

    @property
    def size_h(self) -> int:
        if self.h_half:
            return 1 + self.h_size[0] + self.h_size[1]
        return 1 + 2 * (self.h_size[0] + self.h_size[1])

    @property
    def size_w(self) -> int:
        if self.w_half:
            return 1 + self.w_size[0] + self.w_size[1]
        return 1 + 2 * (self.w_size[0] + self.w_size[1])

    @property
    def size_d(self) -> int:
        return 1 + self.d_size[0] + self.d_size[1]

    def grid2meter(self, grid: jnp.ndarray) -> jnp.ndarray:
        """``[..., (h, w[, d])]`` fractional indices -> ``[..., (x, y[, z])]``."""
        h, w = grid[..., 0], grid[..., 1]
        has_d = grid.shape[-1] == 3

        h_ctr = h if self.h_half else h - (self.h_size[0] + self.h_size[1])
        y = jnp.sign(h_ctr) * _piecewise_fwd(jnp.abs(h_ctr), self.h_size, self.h_range)

        w_ctr = w if self.w_half else w - (self.w_size[0] + self.w_size[1])
        x = jnp.sign(w_ctr) * _piecewise_fwd(jnp.abs(w_ctr), self.w_size, self.w_range)

        if not has_d:
            return jnp.stack([x, y], axis=-1)
        d_ctr = grid[..., 2]
        z = jnp.sign(d_ctr) * _piecewise_fwd(jnp.abs(d_ctr), self.d_size, self.d_spans)
        z = z + self.d_start
        return jnp.stack([x, y, z], axis=-1)

    def meter2grid(self, meter: jnp.ndarray, normalize: bool = False) -> jnp.ndarray:
        """``[..., (x, y, z)]`` meters -> ``[..., (h, w, d)]`` fractional indices."""
        x, y, z = meter[..., 0], meter[..., 1], meter[..., 2]

        w_ctr = jnp.sign(x) * _piecewise_inv(jnp.abs(x), self.w_size, self.w_range)
        w = w_ctr if self.w_half else w_ctr + self.w_size[0] + self.w_size[1]

        h_ctr = jnp.sign(y) * _piecewise_inv(jnp.abs(y), self.h_size, self.h_range)
        h = h_ctr if self.h_half else h_ctr + self.h_size[0] + self.h_size[1]

        z_ctr = z - self.d_start
        d = jnp.sign(z_ctr) * _piecewise_inv(jnp.abs(z_ctr), self.d_size, self.d_spans)

        if normalize:
            h = h / (self.size_h - 1)
            w = w / (self.size_w - 1)
            d = d / (self.size_d - 1)
        return jnp.stack([h, w, d], axis=-1)


@dataclasses.dataclass(frozen=True)
class NonLinearMapping:
    """Inner-uniform + quadratically growing outer cells (ref ``mappings.py:199-287``)."""

    bev_inner: int = 128
    bev_outer: int = 32
    range_inner: float = 51.2
    range_outer: float = 51.2
    z_inner: int = 20
    z_outer: int = 10
    z_ranges: Sequence[float] = (-5.0, 3.0, 11.0)

    @property
    def size_h(self) -> int:
        return 1 + 2 * (self.bev_inner + self.bev_outer)

    size_w = size_h

    @property
    def size_d(self) -> int:
        return 1 + self.z_inner + self.z_outer

    @property
    def hw_unit(self) -> float:
        return self.range_inner * 1.0 / self.bev_inner

    @property
    def increase_unit(self) -> float:
        return (self.range_outer - self.bev_outer * self.hw_unit) * 2.0 / \
            self.bev_outer / (self.bev_outer + 1)

    @property
    def z_unit(self) -> float:
        return (self.z_ranges[1] - self.z_ranges[0]) * 1.0 / self.z_inner

    @property
    def z_increase_unit(self) -> float:
        return (self.z_ranges[2] - self.z_ranges[1] - self.z_outer * self.z_unit) * 2.0 / \
            self.z_outer / (self.z_outer + 1)

    def grid2meter(self, grid: jnp.ndarray) -> jnp.ndarray:
        hw = grid[..., :2]
        hw_center = hw - (self.bev_inner + self.bev_outer)
        hw_abs = jnp.abs(hw_center)
        yx_base = hw_abs * self.hw_unit
        hw_outer = jnp.maximum(hw_abs - self.bev_inner, 0.0)
        hw_outer_int = jnp.floor(hw_outer)
        yx_outer_base = hw_outer_int * (hw_outer_int + 1) / 2.0 * self.increase_unit
        yx_outer_resi = (hw_outer - hw_outer_int) * (hw_outer_int + 1) * self.increase_unit
        yx = jnp.sign(hw_center) * (yx_base + yx_outer_base + yx_outer_resi)

        if grid.shape[-1] != 3:
            return yx[..., ::-1]

        d_center = grid[..., 2]
        z_base = d_center * self.z_unit
        d_outer = jnp.maximum(d_center - self.z_inner, 0.0)
        d_outer_int = jnp.floor(d_outer)
        z_outer_base = d_outer_int * (d_outer_int + 1) / 2.0 * self.z_increase_unit
        z_outer_resi = (d_outer - d_outer_int) * (d_outer_int + 1) * self.z_increase_unit
        z = z_base + z_outer_base + z_outer_resi + self.z_ranges[0]
        return jnp.stack([yx[..., 1], yx[..., 0], z], axis=-1)

    def meter2grid(self, meter: jnp.ndarray, normalize: bool = False) -> jnp.ndarray:
        xy = meter[..., :2]
        xy_abs = jnp.abs(xy)
        wh_base = jnp.minimum(xy_abs / self.hw_unit, float(self.bev_inner))
        xy_outer = jnp.maximum(xy_abs - self.range_inner, 0.0)
        # Closed-form inverse of the quadratic outer-cell accumulation
        # (reference mappings.py:261-266).
        c = 0.5 + self.hw_unit / self.increase_unit
        wh_outer_base = jnp.floor(jnp.sqrt(c * c + 2 * xy_outer / self.increase_unit) - c)
        xy_outer_resi = xy_outer - wh_outer_base * self.hw_unit - \
            self.increase_unit * wh_outer_base * (wh_outer_base + 1) / 2
        wh_outer_resi = xy_outer_resi / (self.hw_unit + (wh_outer_base + 1) * self.increase_unit)
        wh_center = jnp.sign(xy) * (wh_base + wh_outer_base + wh_outer_resi)
        wh = wh_center + self.bev_inner + self.bev_outer

        z_abs = meter[..., 2] - self.z_ranges[0]
        d_base = jnp.minimum(z_abs / self.z_unit, float(self.z_inner))
        z_outer = jnp.maximum(z_abs - (self.z_ranges[1] - self.z_ranges[0]), 0.0)
        cz = 0.5 + self.z_unit / self.z_increase_unit
        d_outer_base = jnp.floor(jnp.sqrt(cz * cz + 2 * z_outer / self.z_increase_unit) - cz)
        z_outer_resi = z_outer - d_outer_base * self.z_unit - \
            self.z_increase_unit * d_outer_base * (d_outer_base + 1) / 2
        d_outer_resi = z_outer_resi / (self.z_unit + (d_outer_base + 1) * self.z_increase_unit)
        d = d_base + d_outer_base + d_outer_resi

        if normalize:
            wh = wh / (self.size_h - 1)
            d = d / (self.size_d - 1)
        return jnp.stack([wh[..., 1], wh[..., 0], d], axis=-1)


def make_mapping(
    nonlinear_mode: str = "linear_upscale",
    h_size=(128, 32),
    h_range=(51.2, 28.8),
    h_half: bool = False,
    w_size=(128, 32),
    w_range=(51.2, 28.8),
    w_half: bool = False,
    d_size=(20, 10),
    d_range=(-4.0, 4.0, 12.0),
):
    """Facade selecting the mapping mode (reference ``GridMeterMapping``,
    ``mappings.py:153-196``). Returns a frozen dataclass with ``grid2meter`` /
    ``meter2grid`` methods and ``size_h/size_w/size_d`` properties."""
    if nonlinear_mode == "linear_upscale":
        assert tuple(h_size) == tuple(w_size) and tuple(h_range) == tuple(w_range)
        assert not h_half and not w_half
        return NonLinearMapping(
            bev_inner=h_size[0], bev_outer=h_size[1],
            range_inner=h_range[0], range_outer=h_range[1],
            z_inner=d_size[0], z_outer=d_size[1], z_ranges=tuple(d_range))
    if nonlinear_mode == "linear":
        return LinearMapping(
            h_size=tuple(h_size), h_range=tuple(h_range), h_half=h_half,
            w_size=tuple(w_size), w_range=tuple(w_range), w_half=w_half,
            d_size=tuple(d_size), d_range=tuple(d_range))
    raise ValueError(f"unknown nonlinear_mode: {nonlinear_mode}")
