"""Streaming long-video evaluation.

The reference could only classify fixed 16/20-frame subsamples of a video
(select_frames, train.py:132-145) — arbitrarily long videos were collapsed
to one window.  This module scans overlapping windows over a long clip and
averages the per-window softmax scores on device — the same fusion math the
reference applies to per-clip softmax (ensemble_predictions tensordot,
evaluate_ensemble.py:362-366), extended along time.

Windows become the batch axis, so the scan parallelizes over the `data`
mesh axis for free; combined with ensemble.members this gives
members × windows fully-parallel long-video inference.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.registry import ModelBundle


def window_starts(num_frames: int, window: int, stride: int) -> np.ndarray:
    """Start indices covering the clip; the tail window is clamped so the
    last frames are always seen."""
    if num_frames <= window:
        return np.zeros(1, np.int64)
    starts = np.arange(0, num_frames - window + 1, stride)
    if starts[-1] != num_frames - window:
        starts = np.append(starts, num_frames - window)
    return starts


def extract_windows(clip: jax.Array, window: int, stride: int) -> jax.Array:
    """(T, H, W, C) → (num_windows, window, H, W, C) gather."""
    t = int(clip.shape[0])
    starts = window_starts(t, window, stride)
    idx = starts[:, None] + np.arange(window)[None, :]
    idx = np.minimum(idx, t - 1)
    return jnp.take(clip, jnp.asarray(idx.reshape(-1)), axis=0).reshape(
        (len(starts), window) + clip.shape[1:]
    )


def streaming_predict(
    bundle: ModelBundle,
    variables: Dict,
    clip: jax.Array,
    stride: Optional[int] = None,
    input_scale: float = 1.0,
) -> jax.Array:
    """Average softmax over all windows of one long clip → (C,) scores.

    clip must already be at model spatial resolution; window length is the
    model's canonical frame count."""
    window = bundle.clip.frames
    stride = stride or window // 2
    wins = extract_windows(clip.astype(jnp.float32) * input_scale, window, stride)
    logits = bundle.apply(variables, {"rgb": wins}, train=False)
    return jnp.mean(jax.nn.softmax(logits, axis=-1), axis=0)


def streaming_predict_batch(
    bundle: ModelBundle,
    variables: Dict,
    clips: jax.Array,
    stride: Optional[int] = None,
    input_scale: float = 1.0,
) -> jax.Array:
    """(B, T, H, W, C) long clips → (B, C) averaged scores.  Windows of all
    clips are flattened into one big batch (MXU-friendly) and re-averaged."""
    window = bundle.clip.frames
    stride = stride or window // 2
    b, t = int(clips.shape[0]), int(clips.shape[1])
    n_win = len(window_starts(t, window, stride))

    wins = jax.vmap(lambda c: extract_windows(c, window, stride))(
        clips.astype(jnp.float32) * input_scale
    )  # (B, W, window, H, Wd, C)
    flat = wins.reshape((b * n_win,) + wins.shape[2:])
    logits = bundle.apply(variables, {"rgb": flat}, train=False)
    probs = jax.nn.softmax(logits, axis=-1).reshape(b, n_win, -1)
    return jnp.mean(probs, axis=1)


def _jitted_member_probabilities(
    bundle: ModelBundle, stride: int, input_scale: float
):
    """One jitted closure per (bundle, stride, input_scale), cached on the
    bundle — repeated calls (CLI batches, epochs) reuse the same trace."""
    cache = bundle.__dict__.setdefault("_streaming_jit_cache", {})
    key = (stride, input_scale)
    if key not in cache:
        window = bundle.clip.frames
        # I3D: one shared s2d stem staging for all members × windows
        # (ensemble.members share_stem_staging, same 1.2× stem win)
        prestaged = (
            bundle.module.clone(stem_prestaged=True)
            if bundle.model_type == "I3D" and not bundle.two_stream
            else None
        )

        @jax.jit
        def fn(stacked_variables, clips):
            b, t = int(clips.shape[0]), int(clips.shape[1])
            n_win = len(window_starts(t, window, stride))
            wins = jax.vmap(lambda c: extract_windows(c, window, stride))(
                clips.astype(jnp.float32) * input_scale
            )
            flat = wins.reshape((b * n_win,) + wins.shape[2:])

            if prestaged is not None:
                from ..models.common import s2d_stem_stage

                xs = s2d_stem_stage(flat)

                def member(variables):
                    logits = prestaged.apply(variables, xs, train=False)
                    probs = jax.nn.softmax(logits, axis=-1).reshape(b, n_win, -1)
                    return jnp.mean(probs, axis=1)

            else:

                def member(variables):
                    logits = bundle.apply(variables, {"rgb": flat}, train=False)
                    probs = jax.nn.softmax(logits, axis=-1).reshape(b, n_win, -1)
                    return jnp.mean(probs, axis=1)

            return jax.vmap(member)(stacked_variables)

        cache[key] = fn
    return cache[key]


def streaming_member_probabilities(
    bundle: ModelBundle,
    stacked_variables: Dict,
    clips: jax.Array,
    stride: Optional[int] = None,
    input_scale: float = 1.0,
) -> jax.Array:
    """Long-video ensemble inference: (B, T, H, W, C) clips × M stacked
    members → (M, B, C) window-averaged softmax scores.  Members vmap over
    the stacked params (ensemble.members), windows batch over the data axis
    — members × windows fully parallel.  Jitted (trace cached per bundle +
    stride + input shapes)."""
    stride = stride or bundle.clip.frames // 2
    return _jitted_member_probabilities(bundle, int(stride), float(input_scale))(
        stacked_variables, clips
    )


def streaming_member_probabilities_over_pipeline(
    bundle: ModelBundle,
    variables_list,
    pipeline,
    stride: Optional[int] = None,
    input_scale: float = 1.0,
) -> np.ndarray:
    """member_probabilities for LONG clips: a BatchPipeline staging
    (B, T≫frames, S, S, 3) u8 clips → device resize to model resolution →
    per-member window-scan probabilities → (M, N, C) float32 in dataset
    order.  Drop-in replacement for ensemble.members.member_probabilities
    when the staged clips are longer than the model window — the long-video
    capability the reference lacked (select_frames collapsed any video to
    one 16/20-frame window, train.py:132-145)."""
    from ..data.pipeline import prefetch_batches
    from ..ensemble.members import stack_variables
    from ..ops.augment import identity_resize_batch

    out_hw = (bundle.clip.height, bundle.clip.width)
    stacked = stack_variables(variables_list)
    resize = jax.jit(lambda u8: identity_resize_batch(u8.astype(jnp.float32), out_hw))
    chunks = []
    for batch in prefetch_batches(pipeline, epoch=0):
        clips = resize(jnp.asarray(batch["rgb"]))
        probs = streaming_member_probabilities(
            bundle, stacked, clips, stride=stride, input_scale=input_scale
        )
        valid = np.asarray(batch["valid"])
        chunks.append(np.asarray(probs)[:, valid])
    return np.concatenate(chunks, axis=1)
