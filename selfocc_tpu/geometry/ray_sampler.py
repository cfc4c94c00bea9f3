"""Pixel-ray samplers (fixed / random / cellular grids).

Behavioral rewrite of reference ``model/head/nerfacc_head/ray_sampler.py``.
The TPU version is a pure function of an explicit PRNG key so the whole
training step stays reproducible and jittable (no host-side numpy RNG).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RaySampler:
    """Samples (R, 2) pixel (x, y) coordinates in the supervision image.

    Modes (reference ``ray_sampler.py:21-68``):
      * ``fixed``: uniform grid at stride img/ray_number (eval).
      * ``random``: R uniform pixels.
      * ``cellular``: a regular ray_number grid, randomly scaled (>=1x) and
        offset so it fits inside the image — used by the training configs.
    """

    ray_sample_mode: str = "fixed"
    ray_number: Sequence[int] = (192, 400)
    ray_img_size: Sequence[int] = (768, 1600)
    ray_upper_crop: int = 0
    ray_x_dsr_max: Optional[float] = None
    ray_y_dsr_max: Optional[float] = None

    def __post_init__(self):
        assert self.ray_sample_mode in ("fixed", "cellular", "random")

    @property
    def num_rays(self) -> int:
        return self.ray_number[0] * self.ray_number[1]

    def _base_grid(self) -> jnp.ndarray:
        ry = jnp.arange(self.ray_number[0], dtype=jnp.float32)
        rx = jnp.arange(self.ray_number[1], dtype=jnp.float32)
        grid = jnp.stack(
            [jnp.broadcast_to(rx[None, :], (self.ray_number[0], self.ray_number[1])),
             jnp.broadcast_to(ry[:, None], (self.ray_number[0], self.ray_number[1]))],
            axis=-1)
        return grid  # (H, W, 2) with (x, y) order

    def __call__(self, rng: Optional[jax.Array] = None) -> jnp.ndarray:
        if self.ray_sample_mode == "fixed":
            x_dsr = 1.0 * self.ray_img_size[1] / self.ray_number[1]
            y_dsr = 1.0 * self.ray_img_size[0] / self.ray_number[0]
            grid = self._base_grid()
            rays = grid * jnp.array([x_dsr, y_dsr], dtype=jnp.float32)
            return rays.reshape(-1, 2)

        assert rng is not None, f"{self.ray_sample_mode} sampling needs a PRNG key"
        if self.ray_sample_mode == "random":
            u = jax.random.uniform(rng, (self.num_rays, 2), dtype=jnp.float32)
            scale = jnp.array([self.ray_img_size[1], self.ray_img_size[0]],
                              dtype=jnp.float32)
            return u * scale

        # cellular (reference ray_sampler.py:58-68)
        x_dsr_max = self.ray_x_dsr_max
        if x_dsr_max is None:
            x_dsr_max = 1.0 * self.ray_img_size[1] / self.ray_number[1]
        y_dsr_max = self.ray_y_dsr_max
        if y_dsr_max is None:
            y_dsr_max = 1.0 * (self.ray_img_size[0] - self.ray_upper_crop) / self.ray_number[0]
        assert x_dsr_max > 1 and y_dsr_max > 1

        k1, k2, k3, k4 = jax.random.split(rng, 4)
        x_dsr = jax.random.uniform(k1) * (x_dsr_max - 1) + 1
        y_dsr = jax.random.uniform(k2) * (y_dsr_max - 1) + 1
        x_emp_max = self.ray_img_size[1] - self.ray_number[1] * x_dsr
        y_emp_max = self.ray_img_size[0] - self.ray_upper_crop - self.ray_number[0] * y_dsr
        x_emp = jax.random.uniform(k3) * x_emp_max
        y_emp = jax.random.uniform(k4) * y_emp_max

        grid = self._base_grid()
        rays = jnp.stack([
            grid[..., 0] * x_dsr + x_emp,
            grid[..., 1] * y_dsr + y_emp + self.ray_upper_crop], axis=-1)
        return rays.reshape(-1, 2)
