"""Device mesh + sharding helpers.

Replaces the reference's NCCL/DDP stack (``train.py:32-45``,
``torch.multiprocessing.spawn``) with the JAX SPMD model (SURVEY §2.10, §5.8):
one process, a ``jax.sharding.Mesh`` over all chips, ``shard_map`` + ``psum``
for data-parallel gradients, sharded ray axes for eval rendering. Collectives
ride ICI within a slice; ``jax.distributed.initialize`` extends the same code
across hosts over DCN.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over all local devices — the reference's only parallelism is
    DP (SURVEY §2.10), and the eval ray axis shards over the same mesh."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch or ray) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad ``axis`` up to a multiple (for even ray sharding); returns
    (padded, original_size)."""
    import jax.numpy as jnp
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), n


MODEL_AXIS = "model"


def make_model_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh named for model parallelism: the encoder's TPV-query axis
    (and anything XLA propagates it to) shards over this axis — the path to
    running the reference-exact DENSE flagship train step, whose per-head
    deformable backward needs ~72 GB on one chip (docs/PERFORMANCE.md), on
    a pod slice."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (MODEL_AXIS,))


def maybe_shard(x, *spec):
    """GSPMD sharding hint, applied only when tracing under a mesh that
    carries the model axis (``jax.sharding.use_mesh(make_model_mesh())``)
    — a no-op on single-device or DP-only runs, so modules can hint
    unconditionally."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
    except AttributeError:          # older jax
        return x
    if mesh is None or MODEL_AXIS not in getattr(mesh, "axis_names", ()):
        return x
    return jax.lax.with_sharding_constraint(x, P(*spec))
