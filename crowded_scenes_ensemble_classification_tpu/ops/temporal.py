"""Temporal (frame-axis) transforms.

Device-side, static-shape equivalents of the reference's frame sampling
(`select_frames` train.py:132-145) and the vidaug temporal augmenters
(vidaug/augmentors/temporal.py).  All functions take a clip `(T, H, W, C)`
and return a clip with a *statically known* output length, expressed as
gather indices so XLA compiles them to a single HBM-friendly gather.

Parity notes
------------
- The reference's loop-pad ("if the clip is shorter than `size`, cycle its
  frames") maps to index arithmetic `idx % span` here — bit-identical.
- vidaug `InverseOrder` has an off-by-one (drops frame 0 and returns T−1
  frames, temporal.py:108-116); we implement the intended full reverse and
  document the deviation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _take_frames(clip: jax.Array, indices) -> jax.Array:
    return jnp.take(clip, jnp.asarray(indices, jnp.int32), axis=0)


def select_frame_indices(num_frames: int, n: int) -> np.ndarray:
    """Stride-subsample indices: step = max(T//n, 1), first n of every
    step-th frame (reference select_frames train.py:132-145).  For clips
    shorter than n the reference under-fills; we cycle (idx % T) so output
    length is always n (static shape)."""
    step = max(num_frames // n, 1)
    idx = np.arange(n) * step
    return idx % num_frames


def select_frames(clip: jax.Array, n: int) -> jax.Array:
    return _take_frames(clip, select_frame_indices(int(clip.shape[0]), n))


def temporal_begin_crop(clip: jax.Array, size: int) -> jax.Array:
    """First `size` frames, cycled when short (vidaug temporal.py:28-49)."""
    t = int(clip.shape[0])
    span = min(t, size)
    idx = np.arange(size) % span
    return _take_frames(clip, idx)


def temporal_center_crop(clip: jax.Array, size: int) -> jax.Array:
    """Centered `size` frames, cycled when short (vidaug temporal.py:52-77)."""
    t = int(clip.shape[0])
    begin = max(0, t // 2 - size // 2)
    end = min(begin + size, t)
    span = end - begin
    idx = begin + (np.arange(size) % span)
    return _take_frames(clip, idx)


def temporal_random_crop(clip: jax.Array, size: int, key: jax.Array) -> jax.Array:
    """Random `size`-frame window, cycled when short
    (vidaug temporal.py:80-105: begin ∈ [0, max(0, T−size−1)])."""
    t = int(clip.shape[0])
    rand_end = max(0, t - size - 1)
    begin = jax.random.randint(key, (), 0, rand_end + 1)
    span = jnp.minimum(begin + size, t) - begin
    idx = begin + (jnp.arange(size) % span)
    return _take_frames(clip, idx)


def inverse_order(clip: jax.Array) -> jax.Array:
    """Full temporal reverse.  (Intended semantics of vidaug InverseOrder;
    the reference implementation drops frame 0 — deliberate fix.)"""
    return jnp.flip(clip, axis=0)


def _linspace_resample_indices(num_frames: int, out_frames: int) -> np.ndarray:
    """vidaug's resample recipe `int(linspace(1, T, n)) − 1`
    (temporal.py:119-175) — truncating cast, 1-based, inclusive ends."""
    vals = np.linspace(1, num_frames, out_frames)
    return vals.astype(np.int64) - 1


def downsample(clip: jax.Array, ratio: float) -> jax.Array:
    """ratio ∈ [0, 1] (vidaug temporal.py:119-137)."""
    t = int(clip.shape[0])
    n = int(np.floor(ratio * t))
    return _take_frames(clip, _linspace_resample_indices(t, n))


def upsample(clip: jax.Array, ratio: float) -> jax.Array:
    """ratio > 1 (vidaug temporal.py:140-156)."""
    t = int(clip.shape[0])
    n = int(np.floor(ratio * t))
    return _take_frames(clip, _linspace_resample_indices(t, n))


def temporal_fit(clip: jax.Array, size: int) -> jax.Array:
    """Resample to exactly `size` frames (vidaug temporal.py:159-175)."""
    return _take_frames(clip, _linspace_resample_indices(int(clip.shape[0]), size))


def temporal_elastic_transformation(clip: jax.Array, key: jax.Array) -> jax.Array:
    """tanh/atanh time warping (vidaug temporal.py:178-214).

    inverse=0: indices = tanh(linspace(-s, s, T)) with s ∈ [0.8, 1.4]
    inverse=1: indices = atanh(linspace(-s, s, T)) with s ∈ [0.6, 0.81]
    then normalize by the last value and map to [0, T−1] with round().
    """
    t = int(clip.shape[0])
    k_inv, k_scale = jax.random.split(key)
    inverse = jax.random.bernoulli(k_inv)
    u = jax.random.uniform(k_scale, ())
    scale = jnp.where(inverse, u * 0.21 + 0.6, u * 0.6 + 0.8)
    xs = jnp.linspace(-scale, scale, t)
    vals = jnp.where(inverse, jnp.arctanh(xs), jnp.tanh(xs))
    vals = vals / vals[-1]
    idx = jnp.round(((vals + 1.0) / 2.0) * (t - 1)).astype(jnp.int32)
    return _take_frames(clip, idx)
