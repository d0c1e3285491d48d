"""Python bindings + pipeline integration for the native clip cache.

The C++ library (native/clipcache.cpp) packs staged uint8 clips into one
shard file and reads them back with multi-threaded pread outside the GIL —
the decode-once answer to the reference's decode-every-epoch hot loop
(train.py:160-172, 257-269; SURVEY.md §7.3.3).

Build: compiled on first use with g++ -O3 (no pybind11 — plain C ABI via
ctypes).  The .so is cached next to the source.

Pipeline integration: `CachingClipSource` wraps any ClipSource; epoch 0
decodes + populates the cache, later epochs stream from it.
"""

from __future__ import annotations

import ctypes
import hashlib
import json
import os
import subprocess
import threading
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "clipcache.cpp"))
_LIB_LOCK = threading.Lock()
_LIB = None


def _build_library() -> str:
    build_dir = os.path.join(os.path.dirname(_SRC), "build")
    os.makedirs(build_dir, exist_ok=True)
    so_path = os.path.join(build_dir, "libclipcache.so")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _SRC, "-o", so_path,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return so_path


def _load_library():
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        lib = ctypes.CDLL(_build_library())
        lib.cc_writer_open.restype = ctypes.c_void_p
        lib.cc_writer_open.argtypes = [ctypes.c_char_p]
        lib.cc_writer_add.restype = ctypes.c_int
        lib.cc_writer_add.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_int32,
        ]
        lib.cc_writer_finish.restype = ctypes.c_int
        lib.cc_writer_finish.argtypes = [ctypes.c_void_p]
        lib.cc_open.restype = ctypes.c_void_p
        lib.cc_open.argtypes = [ctypes.c_char_p]
        lib.cc_num_clips.restype = ctypes.c_int64
        lib.cc_num_clips.argtypes = [ctypes.c_void_p]
        lib.cc_clip_shape.restype = ctypes.c_int
        lib.cc_clip_shape.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint32)
        ]
        lib.cc_read_clip.restype = ctypes.c_int
        lib.cc_read_clip.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p
        ]
        lib.cc_read_batch.restype = ctypes.c_int
        lib.cc_read_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int,
        ]
        lib.cc_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib


class ClipCacheWriter:
    def __init__(self, path: str):
        self.lib = _load_library()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        # Write to a sidecar and rename into place in finish() so a crash
        # mid-populate never leaves a partial shard at the final path.
        self.tmp_path = path + ".tmp"
        self.handle = self.lib.cc_writer_open(self.tmp_path.encode())
        if not self.handle:
            raise IOError(f"cannot open {self.tmp_path} for writing")
        self.keys: Dict[str, int] = {}

    def add(self, key: str, clip: np.ndarray, label: int) -> int:
        clip = np.ascontiguousarray(clip, np.uint8)
        t, h, w, c = clip.shape
        idx = self.lib.cc_writer_add(
            self.handle, clip.ctypes.data_as(ctypes.c_char_p), t, h, w, c, label
        )
        if idx < 0:
            raise IOError("clip cache write failed")
        self.keys[key] = idx
        return idx

    def finish(self) -> str:
        if self.lib.cc_writer_finish(self.handle) != 0:
            raise IOError("clip cache finalize failed")
        self.handle = None
        with open(self.path + ".keys.json", "w") as f:
            json.dump(self.keys, f)
        os.replace(self.tmp_path, self.path)
        return self.path


class ClipCacheReader:
    def __init__(self, path: str):
        self.lib = _load_library()
        self.handle = self.lib.cc_open(path.encode())
        if not self.handle:
            raise IOError(f"cannot open clip cache {path}")
        self.path = path
        keys_path = path + ".keys.json"
        self.keys: Dict[str, int] = {}
        if os.path.exists(keys_path):
            with open(keys_path) as f:
                self.keys = json.load(f)

    def __len__(self) -> int:
        return int(self.lib.cc_num_clips(self.handle))

    def shape(self, idx: int) -> Tuple[Tuple[int, int, int, int], int]:
        out = (ctypes.c_uint32 * 6)()
        if self.lib.cc_clip_shape(self.handle, idx, out) != 0:
            raise IndexError(idx)
        return (out[0], out[1], out[2], out[3]), int(np.int32(out[4]))

    def read(self, idx: int) -> Tuple[np.ndarray, int]:
        shape, label = self.shape(idx)
        buf = np.empty(shape, np.uint8)
        rc = self.lib.cc_read_clip(
            self.handle, idx, buf.ctypes.data_as(ctypes.c_char_p)
        )
        if rc != 0:
            raise IOError(f"read failed for clip {idx}")
        return buf, label

    def read_batch(
        self, indices: Sequence[int], num_threads: int = 8
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Uniform-shape batched read (multi-threaded pread in C++)."""
        indices = np.asarray(indices, np.int64)
        shape, _ = self.shape(int(indices[0]))
        stride = int(np.prod(shape))
        out = np.empty((len(indices),) + shape, np.uint8)
        rc = self.lib.cc_read_batch(
            self.handle,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(indices),
            out.ctypes.data_as(ctypes.c_char_p),
            stride,
            num_threads,
        )
        if rc != 0:
            raise IOError("batched clip read failed")
        labels = np.asarray([self.shape(int(i))[1] for i in indices], np.int32)
        return out, labels

    def close(self):
        if self.handle:
            self.lib.cc_close(self.handle)
            self.handle = None


def cache_path_for(df_key: str, cache_dir: str) -> str:
    digest = hashlib.sha1(df_key.encode()).hexdigest()[:16]
    return os.path.join(cache_dir, f"clips_{digest}.ccache")


class CachingClipSource:
    """Wraps a ClipSource: first access per clip decodes and stores; once
    every clip is cached and finalized, reads come from the native shard.

    Population happens on a full pass (`populate`); partially-written shards
    are never read (the writer finalizes atomically at the end)."""

    def __init__(self, source, df, cache_file: str, num_threads: int = 8):
        self.source = source
        self.df = df.reset_index(drop=True)
        self.cache_file = cache_file
        self.num_threads = num_threads
        self.reader: Optional[ClipCacheReader] = None
        if os.path.exists(cache_file):
            try:
                reader = ClipCacheReader(cache_file)
            except IOError:
                reader = None
            if reader is not None and len(reader) != len(self.df):
                # stale/mismatched shard — drop it so populate() rebuilds
                reader.close()
                os.remove(cache_file)
                reader = None
            self.reader = reader

    @property
    def ready(self) -> bool:
        return self.reader is not None

    def populate(self) -> None:
        if self.ready:
            return
        writer = ClipCacheWriter(self.cache_file)
        for i in range(len(self.df)):
            row = self.df.iloc[i]
            sample = self.source(row)
            writer.add(str(i), sample["rgb"], int(sample["label"]))
        writer.finish()
        self.reader = ClipCacheReader(self.cache_file)

    def __call__(self, row) -> Dict[str, np.ndarray]:
        if not self.ready:
            return self.source(row)
        idx = int(row.name)
        clip, label = self.reader.read(idx)
        return {"rgb": clip, "label": np.int32(label)}

    def read_batch(self, indices) -> Tuple[np.ndarray, np.ndarray]:
        assert self.ready
        return self.reader.read_batch(indices, self.num_threads)
