"""Halo-sharded TRAINING for time-sharded 3D CNNs.

Round 1 shipped inference-mode temporal sharding (temporal_halo.py); this
module adds the training side (SURVEY.md §5 long-context analogue):

- cross-shard BatchNorm statistics: train-mode BN reduces over
  (N, T_global, H, W) — with T sharded, the sums are psum'd over the time
  axis so normalization is numerically identical to the unsharded step
  (reference conv3d_bn semantics, train.py:615-670; Flax BatchNorm
  formulas: biased variance via E[x²]−E[x]², Keras eps 1e-3 / momentum
  0.99, scale=False);
- gradients flow through `halo_exchange` (lax.ppermute transposes to the
  reverse permutation automatically inside shard_map) and through psum'd
  BN statistics — the sharded train step's gradients match the unsharded
  step (tests/test_parallel.py).

The layer stack mirrors the I3D building blocks: strided stem conv,
TF-SAME maxpool with −inf temporal halos, stride-1 3³ ConvBN.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..models.common import KERAS_BN_EPS, KERAS_BN_MOMENTUM
from .temporal_halo import halo_conv3d, halo_max_pool3d

try:
    from jax import shard_map  # jax ≥ 0.7 public API
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def halo_conv_bn_relu_train(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    axis_name: str,
    strides: Tuple[int, int, int] = (1, 1, 1),
    eps: float = KERAS_BN_EPS,
):
    """One train-mode conv3d_bn on a time-sharded NTHWC tensor, inside
    shard_map.  Returns (relu(bn(conv(x))), batch_mean, batch_var) with the
    BN statistics reduced over the GLOBAL (N, T, H, W) via psum — exactly
    Flax BatchNorm's biased moments on the gathered tensor."""
    y = halo_conv3d(x, kernel, strides, axis_name)
    n_local = y.shape[0] * y.shape[1] * y.shape[2] * y.shape[3]
    s = lax.psum(jnp.sum(y, axis=(0, 1, 2, 3)), axis_name)
    ss = lax.psum(jnp.sum(jnp.square(y), axis=(0, 1, 2, 3)), axis_name)
    cnt = n_local * lax.axis_size(axis_name)
    mean = s / cnt
    var = ss / cnt - jnp.square(mean)
    yn = (y - mean) * lax.rsqrt(var + eps) + bias
    return jax.nn.relu(yn), mean, var


LayerSpec = Dict  # {"strides": (st,sh,sw), "pool": Optional[(window, strides)]}


def make_time_sharded_convbn_train_step(
    mesh: Mesh,
    layer_specs: Sequence[LayerSpec],
    time_axis: str = "time",
    eps: float = KERAS_BN_EPS,
    momentum: float = KERAS_BN_MOMENTUM,
):
    """Build a jitted train step over a ConvBN(+optional maxpool) stack with
    the time axis sharded over `time_axis`.

    step(params, x, target) → (loss, grads, batch_stats) where
      params: tuple of {"kernel", "bias"} per layer (replicated),
      x, target: NTHWC with axis 1 sharded over the mesh,
      loss: global MSE (replicated scalar),
      grads: same tree as params — identical to the unsharded step's,
      batch_stats: tuple of {"mean", "var"} batch moments per layer.

    Apply the Keras running-stat update outside:
      ra = momentum * ra + (1 − momentum) * batch_stat.
    """

    def local_forward(params, x, target):
        h = x
        stats = []
        for spec, layer in zip(layer_specs, params):
            h, mean, var = halo_conv_bn_relu_train(
                h,
                layer["kernel"],
                layer["bias"],
                time_axis,
                tuple(spec.get("strides", (1, 1, 1))),
                eps,
            )
            stats.append({"mean": mean, "var": var})
            pool = spec.get("pool")
            if pool is not None:
                h = halo_max_pool3d(h, tuple(pool[0]), tuple(pool[1]), time_axis)
        se = lax.psum(jnp.sum(jnp.square(h - target)), time_axis)
        cnt = h.size * lax.axis_size(time_axis)
        return se / cnt, tuple(stats)

    sharded = shard_map(
        local_forward,
        mesh=mesh,
        in_specs=(P(), P(None, time_axis), P(None, time_axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def step(params, x, target):
        (loss, stats), grads = jax.value_and_grad(sharded, has_aux=True)(
            params, x, target
        )
        return loss, grads, stats

    return jax.jit(step)


def update_running_stats(
    running: Sequence[Dict],
    batch: Sequence[Dict],
    momentum: float = KERAS_BN_MOMENTUM,
):
    """Keras/Flax running-average update for the per-layer BN moments."""
    return tuple(
        {
            "mean": momentum * r["mean"] + (1.0 - momentum) * b["mean"],
            "var": momentum * r["var"] + (1.0 - momentum) * b["var"],
        }
        for r, b in zip(running, batch)
    )
