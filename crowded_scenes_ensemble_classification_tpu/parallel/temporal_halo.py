"""Temporal (frame-axis) sharding with halo exchange.

The reference has no long-sequence capability: every clip is subsampled to a
16/20-frame window that always fits one device (select_frames,
train.py:132-145).  The honest "context parallel" analogue for 3D CNNs
(SURVEY.md §5) is sharding the TIME axis of a long clip across the mesh:
each device holds T/n frames and, before every temporal conv, exchanges
(kernel_t−1)/2 boundary frames with its neighbors over ICI (ppermute) so
the conv's receptive field is seamless — the sharded stack is numerically
identical to the unsharded one.

All reference kernels have temporal extent ≤ 7 (stem 7×7×7 train.py:1026,
C3D/R3D 3³ train.py:1230-1258, R3D stem 7 train.py:1483), so halos are tiny
relative to ICI bandwidth.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def halo_exchange(
    x: jax.Array,
    left: int,
    axis_name: str,
    right: int | None = None,
    fill: float = 0.0,
) -> jax.Array:
    """Inside shard_map: pad the local time axis (axis 1 of NTHWC) with
    `left` frames from the left neighbor and `right` (default = left)
    frames from the right neighbor, over ICI (ppermute).

    Edge devices pad their outer side with `fill` — 0 matches TF-SAME conv
    padding; use −inf for max-pooling halos."""
    right = left if right is None else right
    if left == 0 and right == 0:
        return x
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    send_right = [(i, (i + 1) % n) for i in range(n)]
    send_left = [(i, (i - 1) % n) for i in range(n)]

    parts = []
    if left:
        from_left = lax.ppermute(x[:, -left:], axis_name, send_right)
        from_left = jnp.where(
            idx == 0, jnp.full_like(from_left, fill), from_left
        )
        parts.append(from_left)
    parts.append(x)
    if right:
        from_right = lax.ppermute(x[:, :right], axis_name, send_left)
        from_right = jnp.where(
            idx == n - 1, jnp.full_like(from_right, fill), from_right
        )
        parts.append(from_right)
    return jnp.concatenate(parts, axis=1)


def halo_conv3d(
    x: jax.Array,
    kernel: jax.Array,
    strides: Tuple[int, int, int],
    axis_name: str,
) -> jax.Array:
    """One TF-SAME conv3d on a time-sharded NTHWC tensor, inside shard_map.
    Supports temporal stride 1 AND strided convs (e.g. the I3D 7³/2 stem,
    reference train.py:1026): the asymmetric SAME pads become asymmetric
    halos, and the local shard length must be a multiple of the temporal
    stride so output phases align across shards.

    Equivalent to lax.conv on the gathered tensor: temporal padding is
    supplied by the halo exchange (interior) or zeros (edges); spatial
    dims use ordinary SAME padding."""
    kt = int(kernel.shape[0])
    st = strides[0]
    t_loc = int(x.shape[1])
    if t_loc % st:
        raise ValueError(f"local shard length {t_loc} not divisible by stride {st}")
    # TF-SAME temporal pads over the *global* axis become the halos
    # (global T is a multiple of t_loc, so out = ceil(T/st) ⇒ total pad
    # depends only on kt, st, and T%st==0).
    total = max(kt - st, 0)
    pad_l = total // 2
    pad_r = total - pad_l
    xp = halo_exchange(x, pad_l, axis_name, pad_r)
    # temporal VALID over the halo-padded axis == SAME over the gathered axis
    pads = [(0, 0)] + _same_pads(kernel.shape[1:3], x.shape[2:4], strides[1:])
    return lax.conv_general_dilated(
        xp,
        kernel,
        window_strides=strides,
        padding=pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def _same_pads(kernel_hw, in_hw, strides_hw):
    """TF-SAME padding amounts for the spatial dims."""
    pads = []
    for k, n, s in zip(kernel_hw, in_hw, strides_hw):
        out = -(-n // s)
        total = max((out - 1) * s + k - n, 0)
        pads.append((total // 2, total - total // 2))
    return pads


def time_sharded_conv_stack(
    mesh: Mesh,
    kernels: Sequence[jax.Array],
    time_axis: str = "time",
) -> Callable[[jax.Array], jax.Array]:
    """Build fn(x) applying a ReLU-separated stack of stride-1 SAME conv3d
    layers with the time axis of x sharded over `time_axis`.  Demonstrates
    the halo-exchange pattern end-to-end; numerically identical to the
    unsharded stack (tests/test_parallel.py)."""
    try:
        from jax import shard_map  # jax ≥ 0.7 public API
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    def local_stack(x):
        for k in kernels:
            x = halo_conv3d(x, k, (1, 1, 1), time_axis)
            x = jax.nn.relu(x)
        return x

    sharded = shard_map(
        local_stack,
        mesh=mesh,
        in_specs=P(None, time_axis),
        out_specs=P(None, time_axis),
    )
    return jax.jit(sharded)


def halo_max_pool3d(
    x: jax.Array,
    window: Tuple[int, int, int],
    strides: Tuple[int, int, int],
    axis_name: str,
) -> jax.Array:
    """TF-SAME MaxPool3D on a time-sharded NTHWC tensor (inside shard_map).
    Temporal halos carry −inf edge fill; spatial dims pool locally with
    ordinary SAME.  Local shard length must be a multiple of the temporal
    stride (covers every reference pool: (1,3,3)/1,2,2, (3,3,3)/1, (3,3,3)/2
    and (2,2,2)/2 — train.py:1030-1195)."""
    import flax.linen as nn

    kt, st = window[0], strides[0]
    t_loc = int(x.shape[1])
    if t_loc % st:
        raise ValueError(f"local shard length {t_loc} not divisible by stride {st}")
    total = max(kt - st, 0)
    pad_l = total // 2
    pad_r = total - pad_l
    xp = halo_exchange(x, pad_l, axis_name, pad_r, fill=float("-inf"))
    # temporal VALID over the halo axis; spatial SAME locally
    ph, pw = _same_pads(window[1:3], x.shape[2:4], strides[1:])
    return lax.reduce_window(
        xp,
        -jnp.inf,
        lax.max,
        window_dimensions=(1,) + tuple(window) + (1,),
        window_strides=(1,) + tuple(strides) + (1,),
        padding=[(0, 0), (0, 0), ph, pw, (0, 0)],
    )


def time_sharded_i3d_trunk(
    mesh: Mesh,
    variables,
    time_axis: str = "time",
    bn_eps: float = 1e-3,
):
    """Inference-mode I3D trunk (models.i3d.I3DTrunk) over a TIME-SHARDED
    long clip: every temporal conv/pool runs with halo exchange, everything
    else is local — output features are numerically identical to the
    unsharded trunk, but an arbitrarily long clip is split across the mesh
    (the long-video capability of SURVEY.md §5).

    The global T must satisfy: T/n_shards divisible by 2 at the stem and at
    each stride-2 temporal pool (e.g. T=64 over 8 shards).
    Returns fn(x) for x: (N, T, H, W, C) sharded (None, time)."""
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    from ..models.i3d import INCEPTION_SPECS

    params = variables["params"]
    stats = variables["batch_stats"]

    def conv_bn(x, layer_p, layer_s, strides):
        y = halo_conv3d(x, layer_p["conv"]["kernel"], strides, time_axis)
        y = (y - layer_s["bn"]["mean"]) * lax.rsqrt(
            layer_s["bn"]["var"] + bn_eps
        ) + layer_p["bn"]["bias"]
        return jax.nn.relu(y)

    def block(x, name):
        p, st_ = params[name], stats[name]
        b0 = conv_bn(x, p["b0_1x1"], st_["b0_1x1"], (1, 1, 1))
        b1 = conv_bn(x, p["b1_1x1"], st_["b1_1x1"], (1, 1, 1))
        b1 = conv_bn(b1, p["b1_3x3"], st_["b1_3x3"], (1, 1, 1))
        b2 = conv_bn(x, p["b2_1x1"], st_["b2_1x1"], (1, 1, 1))
        b2 = conv_bn(b2, p["b2_3x3"], st_["b2_3x3"], (1, 1, 1))
        b3 = halo_max_pool3d(x, (3, 3, 3), (1, 1, 1), time_axis)
        b3 = conv_bn(b3, p["b3_1x1"], st_["b3_1x1"], (1, 1, 1))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)

    def local_trunk(x):
        x = conv_bn(x, params["Conv3d_1a_7x7"], stats["Conv3d_1a_7x7"], (2, 2, 2))
        x = halo_max_pool3d(x, (1, 3, 3), (1, 2, 2), time_axis)
        x = conv_bn(x, params["Conv3d_2b_1x1"], stats["Conv3d_2b_1x1"], (1, 1, 1))
        x = conv_bn(x, params["Conv3d_2c_3x3"], stats["Conv3d_2c_3x3"], (1, 1, 1))
        x = halo_max_pool3d(x, (1, 3, 3), (1, 2, 2), time_axis)
        for name in ("Mixed_3b", "Mixed_3c"):
            x = block(x, name)
        x = halo_max_pool3d(x, (3, 3, 3), (2, 2, 2), time_axis)
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = block(x, name)
        x = halo_max_pool3d(x, (2, 2, 2), (2, 2, 2), time_axis)
        for name in ("Mixed_5b", "Mixed_5c"):
            x = block(x, name)
        return x

    sharded = shard_map(
        local_trunk,
        mesh=mesh,
        in_specs=P(None, time_axis),
        out_specs=P(None, time_axis),
    )
    return jax.jit(sharded)
