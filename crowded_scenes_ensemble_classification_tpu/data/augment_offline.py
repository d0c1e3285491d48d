"""Offline ("precomputed") augmentation pipeline.

Re-implementation of the reference augment_dataset.py: pre-compute
`augmentation_frequency` augmented mp4 copies of every train clip and append
`rgbclips_augmented_{i}_path` columns to the fold CSVs
(augment_dataset.py:88-123).  Idempotent like the reference: existing
columns are skipped, and an `update_links` mode refreshes the CSV columns
without re-encoding videos (augment_dataset.py:131-148).

TPU-first: the pixel policy (Sometimes(0.85) crop/flip/salt/pepper + resize
224, augment_dataset.py:16-32,74-83) runs as the fused device kernel
(ops.augment.crowd11_augment) on whole decoded clips — one jit region per
distinct source geometry (cached) — instead of the reference's per-frame
Python/PIL loops.  Randomness is keyed on (seed, fold, clip index,
frequency) so re-runs are bitwise reproducible.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
import pandas as pd

from ..ops.augment import crowd11_augment
from .video_io import write_video

OFFLINE_AUGMENT_P = 0.85  # reference augment_dataset.py:74
OFFLINE_OUT_HW = (224, 224)  # reference augment_dataset.py:78


def _load_full_clip(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame)
    cap.release()
    if not frames:
        raise IOError(f"could not decode {path}")
    return np.stack(frames)


class _AugmentKernelCache:
    """jit cache keyed by source clip geometry (offline clips vary in
    shape; each distinct (T, H, W) compiles once)."""

    def __init__(self, out_hw: Tuple[int, int], p: float):
        self.out_hw = out_hw
        self.p = p
        self._cache = {}

    def __call__(self, clip: np.ndarray, key) -> np.ndarray:
        shape = clip.shape
        if shape not in self._cache:
            self._cache[shape] = jax.jit(
                lambda c, k: crowd11_augment(c, k, self.out_hw, p=self.p)
            )
        out = self._cache[shape](clip.astype(np.float32), key)
        return np.asarray(out).astype(np.uint8)


def augment_video_file(
    src_path: str,
    dst_path: str,
    key,
    kernel: Optional[_AugmentKernelCache] = None,
) -> str:
    """Decode → fused device augment → resize 224 → write mp4
    (reference augment_video + write_video, augment_dataset.py:34-85)."""
    kernel = kernel or _AugmentKernelCache(OFFLINE_OUT_HW, OFFLINE_AUGMENT_P)
    clip = _load_full_clip(src_path)
    augmented = kernel(clip, key)
    write_video(dst_path, augmented, fps=20.0)
    return dst_path


def augment_folds(
    folds_folder: str,
    augmented_data_folder: str,
    nb_folds: int,
    augmentation_frequency: int,
    operation: str = "augment_videos",  # or "update_links"
    seed: int = 0,
) -> None:
    """Augment every fold CSV in place (reference augment_folds,
    augment_dataset.py:88-123)."""
    os.makedirs(augmented_data_folder, exist_ok=True)
    kernel = _AugmentKernelCache(OFFLINE_OUT_HW, OFFLINE_AUGMENT_P)
    root_key = jax.random.key(seed)

    for fold_index in range(nb_folds):
        fold_path = os.path.join(folds_folder, f"fold{fold_index}.csv")
        df = pd.read_csv(fold_path)
        changed = False
        for freq in range(augmentation_frequency):
            column = f"rgbclips_augmented_{freq}_path"
            if column in df.columns and operation != "update_links":
                continue
            paths = []
            for clip_idx, src in enumerate(df["rgbclips_path"].values):
                stem = os.path.splitext(os.path.basename(src))[0]
                dst = os.path.join(
                    augmented_data_folder, f"{stem}_augmented_{freq}.mp4"
                )
                paths.append(dst)
                if operation == "augment_videos" and not os.path.exists(dst):
                    key = jax.random.fold_in(
                        jax.random.fold_in(
                            jax.random.fold_in(root_key, fold_index), clip_idx
                        ),
                        freq,
                    )
                    augment_video_file(src, dst, key, kernel)
            df[column] = paths
            changed = True
        if changed:
            df.to_csv(fold_path, index=False)
