"""Synthetic crowd-video dataset for tests and benchmarks.

Generates tiny videos whose class is visually decodable (each class gets a
distinct moving-pattern signature), organized exactly like Crowd-11:
a clip table with scene_number / label / rgb+flow paths, so the whole
pipeline — folds → splits → train → ensemble — runs end-to-end on CPU in CI
(SURVEY.md §4f).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
import pandas as pd

from .video_io import write_video, HAVE_CV2


def make_clip_array(
    label: int,
    rng: np.random.Generator,
    num_frames: int = 12,
    hw: Tuple[int, int] = (64, 64),
    num_classes: int = 4,
) -> np.ndarray:
    """A (T, H, W, 3) uint8 clip: class-dependent moving stripes + noise."""
    t, (h, w) = num_frames, hw
    ys, xs = np.mgrid[0:h, 0:w]
    freq = 2 * np.pi * (label + 1) / 16.0
    phase_step = (label % 2 * 2 - 1) * (1 + label // 2)
    # per-class mean brightness makes the task learnable in very few steps
    # (tests train for only a handful of epochs on CPU)
    mean = 40.0 + 170.0 * (label + 0.5) / num_classes
    frames = []
    for i in range(t):
        base = mean + 35.0 * np.sin(freq * (xs + phase_step * i) + 0.3 * ys)
        noise = rng.normal(0, 8, size=(h, w))
        g = np.clip(base + noise, 0, 255)
        frame = np.stack([g, np.roll(g, label, axis=1), np.roll(g, -label, axis=0)], -1)
        frames.append(frame)
    return np.asarray(frames, np.uint8)


def generate_synthetic_dataset(
    root: str,
    num_scenes: int = 12,
    clips_per_scene: int = 3,
    num_classes: int = 4,
    num_frames: int = 12,
    hw: Tuple[int, int] = (64, 64),
    seed: int = 0,
    write_flow: bool = True,
    as_videos: bool = True,
) -> pd.DataFrame:
    """Create clips on disk (mp4 via cv2, or .npy when as_videos=False) and
    return the clip table (rgbclips_path, x/y flow paths, scene_number,
    label)."""
    rng = np.random.default_rng(seed)
    rgb_dir = os.path.join(root, "rgb")
    flow_dir = os.path.join(root, "flow")
    os.makedirs(rgb_dir, exist_ok=True)
    os.makedirs(flow_dir, exist_ok=True)

    rows = []
    for scene in range(num_scenes):
        label = scene % num_classes
        for c in range(clips_per_scene):
            stem = f"{label}_{scene}_{c}_clip"
            clip = make_clip_array(label, rng, num_frames, hw, num_classes)
            if as_videos and HAVE_CV2:
                rgb_path = os.path.join(rgb_dir, stem + ".mp4")
                write_video(rgb_path, clip)
            else:
                rgb_path = os.path.join(rgb_dir, stem + ".npy")
                np.save(rgb_path, clip)
            if write_flow:
                # synthetic "flow": temporal difference magnitudes, stored as
                # two gray videos like TV-L1 precompute (_x/_y.avi convention)
                diff = np.abs(np.diff(clip.astype(np.int16), axis=0)).astype(np.uint8)
                diff = np.concatenate([diff, diff[-1:]], axis=0)
                fx = diff[..., 0:1]
                fy = diff[..., 1:2]
                if as_videos and HAVE_CV2:
                    fx_path = os.path.join(flow_dir, stem + "_x.avi")
                    fy_path = os.path.join(flow_dir, stem + "_y.avi")
                    write_video(fx_path, np.repeat(fx, 3, -1))
                    write_video(fy_path, np.repeat(fy, 3, -1))
                else:
                    fx_path = os.path.join(flow_dir, stem + "_x.npy")
                    fy_path = os.path.join(flow_dir, stem + "_y.npy")
                    np.save(fx_path, fx)
                    np.save(fy_path, fy)
            else:
                fx_path = fy_path = ""
            rows.append(
                {
                    "rgbclips_path": rgb_path,
                    "x_axis_flowclips_path": fx_path,
                    "y_axis_flowclips_path": fy_path,
                    "scene_number": scene,
                    "label": label,
                    "video_name": os.path.basename(rgb_path),
                }
            )
    return pd.DataFrame(rows)
