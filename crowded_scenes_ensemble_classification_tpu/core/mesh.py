"""Device-mesh construction and sharding helpers.

The reference's only parallelism was Slurm job fan-out
(launch_train_ensemble.py:144-158) — jobs never communicated.  Here
parallelism is expressed on a `jax.sharding.Mesh` with named axes:

- ``data``   — batch (data-parallel) axis
- ``member`` — ensemble-member axis for vmapped multi-model inference
- ``time``   — optional temporal axis for long-clip halo sharding (see
  parallel.temporal_halo)

Collectives ride ICI inside a slice; multi-slice runs extend the same mesh
over DCN via ``jax.distributed.initialize`` without code changes.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Sequence[Tuple[str, int]] = (("data", -1),),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh from (axis_name, size) pairs.

    A size of ``-1`` means "all remaining devices" (at most one axis may use
    it).  With the default argument this is a pure data-parallel mesh over
    every visible device.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    sizes = [s for _, s in axes]
    wild = [i for i, s in enumerate(sizes) if s == -1]
    if len(wild) > 1:
        raise ValueError("at most one mesh axis may have size -1")
    fixed = math.prod(s for s in sizes if s != -1)
    if wild:
        if n % fixed:
            raise ValueError(f"{n} devices not divisible by fixed axes {fixed}")
        sizes[wild[0]] = n // fixed
    if math.prod(sizes) != n:
        raise ValueError(f"mesh {sizes} does not cover {n} devices")
    names = tuple(name for name, _ in axes)
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def data_parallel_mesh(devices=None) -> Mesh:
    return make_mesh((("data", -1),), devices)


def ensemble_mesh(num_members: int, devices=None) -> Mesh:
    """2-D (member, data) mesh: members spread over devices, remaining
    devices replicate batches within a member group.

    If there are fewer devices than members the member axis is folded
    (vmap handles >1 member per device); we then use a pure data mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % max(num_members, 1) == 0 and num_members <= n:
        return make_mesh((("member", num_members), ("data", -1)), devices)
    return make_mesh((("member", 1), ("data", -1)), devices)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim of a NTHWC tensor over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def member_sharding(mesh: Mesh, axis: str = "member") -> NamedSharding:
    """Shard the leading (member) dim of stacked ensemble params."""
    return NamedSharding(mesh, P(axis))


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Device-put a host batch with its leading dim sharded over ``axis``."""
    return jax.device_put(x, batch_sharding(mesh, axis))
