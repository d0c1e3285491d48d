"""Deterministic, prefetched host→device input pipeline.

Replaces the reference `DataGenerator(keras.utils.Sequence)`
(train.py:361-488) with a functional design:

- per-epoch shuffling from an explicit seed (reference shuffled with the
  global RNG in on_epoch_end, train.py:413-419),
- `augmentation_frequency` tiling of the index list for on-the-fly mode
  (train.py:380-383, 416-417) — here every tiled copy *actually* receives a
  fresh augmentation key (the reference's per-sample augmented branch was
  dead code, train.py:442-455; we implement the intended semantics),
- the final partial batch is padded by cycling samples and reported via a
  `valid` mask (the reference fed uninitialized np.empty rows,
  train.py:428-434 — a bug we do not reproduce),
- a thread pool decodes/stages clips ahead of the device step (the
  reference used fit_generator worker threads, train.py:1904-1921).

The host emits uint8 staging batches; ALL pixel math (augment, resize,
normalize) runs on device (ops.augment).
"""

from __future__ import annotations

import concurrent.futures as cf
import math
import os
import threading
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from .video_io import decode_clip, decode_flow_pair, decode_twostream_staging


def expand_precomputed_augmentation(
    df: pd.DataFrame, augmentation_frequency: int
) -> pd.DataFrame:
    """Merge rgbclips_augmented_{i}_path columns into extra rows — the
    reference `augment_dataframe` (train.py:99-125)."""
    parts = [df[["rgbclips_path", "x_axis_flowclips_path", "y_axis_flowclips_path", "class"]]]
    for i in range(augmentation_frequency):
        col = f"rgbclips_augmented_{i}_path"
        if col not in df.columns:
            raise KeyError(f"missing augmented column {col}")
        aug = df[[col, "x_axis_flowclips_path", "y_axis_flowclips_path", "class"]].rename(
            columns={col: "rgbclips_path"}
        )
        parts.append(aug)
    return pd.concat(parts, ignore_index=True)


def _load_array(path: str, num_frames: int, staging_hw, gray: bool = False) -> np.ndarray:
    if path.endswith(".npy"):
        clip = np.load(path)
        from ..ops.temporal import select_frame_indices

        clip = clip[select_frame_indices(clip.shape[0], num_frames)]
        if staging_hw is not None and clip.shape[1:3] != tuple(staging_hw):
            try:
                import cv2

                clip = np.stack(
                    [
                        cv2.resize(f, (staging_hw[1], staging_hw[0]))
                        for f in clip
                    ]
                )
                if clip.ndim == 3:
                    clip = clip[..., None]
            except ImportError:
                raise RuntimeError("resize of .npy clips requires cv2")
        return clip
    return decode_clip(path, num_frames, staging_hw, gray=gray)


@dataclass
class SampleSpec:
    """What to materialize per clip."""

    num_frames: int
    staging_hw: Tuple[int, int]
    two_stream: bool = False
    flow_precomputed: bool = True  # else: gray frames staged for device flow


class ClipSource:
    """Row → staged numpy sample."""

    def __init__(self, spec: SampleSpec):
        self.spec = spec

    def __call__(self, row) -> Dict[str, np.ndarray]:
        s = self.spec
        if s.two_stream and not s.flow_precomputed:
            # one decode pass stages rgb + the gray frame pairs the device
            # Farneback kernel consumes (video_io.decode_twostream_staging)
            staged = decode_twostream_staging(
                row["rgbclips_path"], s.num_frames, s.staging_hw
            )
            staged["label"] = np.int32(row["class"])
            return staged
        out: Dict[str, np.ndarray] = {
            "rgb": _load_array(row["rgbclips_path"], s.num_frames, s.staging_hw),
            "label": np.int32(row["class"]),
        }
        if s.two_stream:
            out["flow"] = decode_flow_pair(
                row["x_axis_flowclips_path"],
                row["y_axis_flowclips_path"],
                s.num_frames,
                s.staging_hw,
            )
        return out


class BatchPipeline:
    """Epoch iterator yielding uniform uint8 batches with a validity mask."""

    def __init__(
        self,
        df: pd.DataFrame,
        spec: SampleSpec,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        augmentation_frequency: int = 1,
        num_workers: int = 8,
        drop_last: bool = False,
        cache_file: Optional[str] = None,
    ):
        """cache_file: path to a native clip-cache shard
        (data.clip_cache) — decode-once mode: the first pass populates the
        cache, later epochs stream from it with threaded pread.  One-stream
        rgb pipelines only."""
        self.df = df.reset_index(drop=True)
        self.spec = spec
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.tile = max(augmentation_frequency, 1)
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.source = ClipSource(spec)
        if cache_file is not None:
            if spec.two_stream:
                raise ValueError("clip cache supports one-stream rgb pipelines")
            from .clip_cache import CachingClipSource

            self.source = CachingClipSource(
                self.source, self.df, cache_file, num_threads=num_workers
            )

    def __len__(self) -> int:
        n = len(self.df) * self.tile
        if self.drop_last:
            return n // self.batch_size
        return math.ceil(n / self.batch_size)

    def epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.tile(np.arange(len(self.df)), self.tile)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, epoch))
            rng.shuffle(idx)
        return idx

    def batches(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        if hasattr(self.source, "populate") and not self.source.ready:
            self.source.populate()
        idx = self.epoch_indices(epoch)
        n = len(idx)
        bs = self.batch_size
        nb = len(self)

        def load(i: int) -> Dict[str, np.ndarray]:
            return self.source(self.df.iloc[int(i)])

        cached = hasattr(self.source, "read_batch") and getattr(
            self.source, "ready", False
        )
        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            for b in range(nb):
                chunk = idx[b * bs : (b + 1) * bs]
                valid = len(chunk)
                if valid < bs:  # pad by cycling (masked out downstream)
                    pad = np.resize(chunk, bs)
                    chunk = pad
                if cached:
                    # native multi-threaded pread path (data.clip_cache)
                    rgb, labels = self.source.read_batch(chunk)
                    batch = {"rgb": rgb, "label": labels}
                else:
                    samples = list(pool.map(load, chunk))
                    batch = {
                        k: np.stack([s[k] for s in samples])
                        for k in samples[0]
                    }
                batch["valid"] = (np.arange(bs) < valid)
                batch["index"] = np.asarray(chunk, np.int64)
                yield batch


def prefetch_batches(pipeline: "BatchPipeline", epoch: int = 0, depth: int = 2):
    """Run pipeline.batches(epoch) on a background thread, keeping up to
    `depth` ready batches queued — decode/staging of batch k+1 overlaps the
    device step on batch k (the reference relied on fit_generator worker
    threads for this, train.py:1904-1921)."""
    import queue

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err: List[BaseException] = []
    stop = threading.Event()  # consumer gone — unblock + end the producer

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in pipeline.batches(epoch):
                if not _put(batch):
                    return  # early consumer exit: end mid-epoch, closing
                    # pipeline.batches' decode pool with it
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            _put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    done = False
    try:
        while True:
            item = q.get()
            if item is sentinel:
                done = True
                break
            yield item
    finally:
        # a consumer that breaks early (e.g. calibration takes the first
        # N batches) must not leave the producer blocked on a full queue
        # for the process lifetime, pinning staged uint8 batches
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        t.join()
    if done and err:
        raise err[0]


def class_weights_balanced(labels: Sequence[int], num_classes: int) -> np.ndarray:
    """sklearn-style 'balanced' weights: n / (k * bincount)
    (reference train.py:1900-1912 used sklearn.compute_class_weight)."""
    counts = np.bincount(np.asarray(labels, np.int64), minlength=num_classes)
    n = len(labels)
    w = np.where(counts > 0, n / (num_classes * np.maximum(counts, 1)), 0.0)
    return w.astype(np.float32)
