"""HBM-resident dataset: upload staged u8 clips ONCE, gather batches on device.

The reference decodes every clip from disk EVERY EPOCH inside the batch
generator (reference train.py:160-172, 257-269) — decode and host→device
feed are both paid per epoch.  The framework's clip cache (data.clip_cache)
already removes the re-decode; this module removes the per-epoch transfer
too: when the staged dataset fits in device memory — optionally sharded
over the mesh's data axis, so an 8-chip v5e holds 8× more — the pixels
cross the host→device link exactly once, and every later training epoch is
pure device work (the host ships int32 index batches only, a few hundred
bytes per step).  This is the idiomatic TPU recipe for Crowd-11-scale
datasets: all per-step math (gather → augment → forward/backward) stays in
one jit region (train.engine.make_resident_train_step).

Sizing: a staged Crowd-11 clip is T×H×W×3 u8 = 20·256²·3 ≈ 3.9 MB, so one
16 GB chip holds ≈ 4000 staged clips and an 8-chip slice holds the full
dataset with room to spare.  `ResidentClips.nbytes` reports the footprint;
callers decide residency vs the streaming BatchPipeline.

Layout: pixel arrays are stored FLAT per row (`FlatRows`): the TPU's
default tiled layout pads the two minor dims to (8, 128), so a dense
(N, T, 256, 256, 3) u8 resident buffer would pad its 3-channel lane dim
to 128 — 42.7× the raw bytes (measured on v5e: a 1.9 GB split allocated
80 GB and OOMed).  The flat (N, K) layout pads nothing; the jitted
resident steps reshape AFTER the on-device gather, inside the jit region.

Sharding notes: with a mesh, clips are split contiguously over the data
axis; datasets that don't divide evenly are padded with cycled rows that
are NEVER marked valid (they occupy device memory but are excluded from
every epoch pool, so per-epoch coverage of real clips stays exact — the
loss/accuracy masking downstream ignores any padded batch positions).
Each epoch shuffles WITHIN shards (the standard per-host TPU
input-pipeline recipe — no resharding traffic); pass `preshuffle` to
apply a one-time global permutation BEFORE the shard split so shards are
class-mixed even though fold CSVs arrive class-clustered.  Batch rows are
laid out shard-block-major; the per-row `index` field carries ORIGINAL
clip ids for order-sensitive consumers (train.engine.evaluate_model
restores dataset order from it when collecting probabilities).
"""

from __future__ import annotations

import math
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@jax.tree_util.register_pytree_node_class
class FlatRows:
    """(N, K) flat device storage for logically (N, *row_shape) samples.

    TPU default layouts tile the two MINOR dims in (8, 128) blocks, so a
    resident u8 (N, T, 256, 256, 3) buffer pads its 3-channel lane dim to
    128 — a 42.7× HBM blowup (measured on v5e: a 1.9 GB split asked for
    80 GB).  Stored flat, the (N, K) layout pads nothing; the jitted
    resident steps gather flat rows and reshape INSIDE the jit region,
    where XLA lays intermediates out per-consumer (the ragged-wire unpack
    proved that pattern at B=96 on chip).

    Registered as a pytree: jit/shard_map see the flat array as the leaf
    and `row_shape` as static aux, so FlatRows passes through
    device_put/tree.map/shard_map transparently.  Host-side conveniences
    (`shape`/`nbytes`/indexing/`__array__`) present the LOGICAL dense view.
    """

    def __init__(self, flat: jax.Array, row_shape: Tuple[int, ...]):
        self.flat = flat
        self.row_shape = tuple(int(s) for s in row_shape)

    def tree_flatten(self):
        return (self.flat,), self.row_shape

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)

    def densify(self) -> jax.Array:
        """(N, K) → (N, *row_shape) — call INSIDE a jit region only (a
        top-level dense rank-5 small-channel array re-pays the layout
        padding this class exists to avoid)."""
        return self.flat.reshape((self.flat.shape[0],) + self.row_shape)

    # -- host conveniences (logical dense view) -------------------------
    @property
    def shape(self) -> Tuple[int, ...]:
        return (self.flat.shape[0],) + self.row_shape

    @property
    def dtype(self):
        return self.flat.dtype

    @property
    def nbytes(self) -> int:
        return int(self.flat.nbytes)

    def __len__(self) -> int:
        return int(self.flat.shape[0])

    def __getitem__(self, i) -> jax.Array:
        return jnp.asarray(self.flat[i]).reshape(self.row_shape)

    def __array__(self, dtype=None):
        dense = np.asarray(self.flat).reshape(self.shape)
        return dense.astype(dtype) if dtype is not None else dense


class ResidentClips:
    """Device-resident staged samples + per-epoch index batching.

    `arrays` maps staging names (as a BatchPipeline batch would carry
    them: "rgb", optionally "flow" / "gray" / "gray_next") to (N, ...)
    numpy arrays; `labels` is (N,) int.  Batches yielded by
    :meth:`batches` reference the SAME resident device arrays every step
    — only `indices`/`valid` (int32/bool, B elements) are new host data.

    Drop-in for train.engine.fit / evaluate_model when paired with
    make_resident_train_step / make_resident_eval_step: exposes `df`
    (balanced-class hook), `__len__`, and `batches(epoch)`.
    """

    def __init__(
        self,
        arrays: Dict[str, np.ndarray],
        labels,
        batch_size: int,
        mesh: Optional[Mesh] = None,
        data_axis: str = "data",
        shuffle: bool = True,
        seed: int = 0,
        augmentation_frequency: int = 1,
        drop_last: bool = False,
        preshuffle: Optional[int] = None,
        pad_to: Optional[int] = None,
    ):
        """preshuffle: seed for a ONE-TIME global permutation applied
        before the contiguous shard split — fold CSVs are class-clustered
        (folds.make_fold_dataframes sorts by path, and Crowd-11 paths embed
        the class), so without it each shard would hold a class-skewed
        fixed subset for the whole run.  The `index` field still reports
        ORIGINAL (pre-permutation) clip ids.

        pad_to: pad the resident arrays up to (at least) this many rows —
        jitted resident steps are shape-specialized on the padded dataset
        size, so padding every k-fold member's train split to one common
        size lets all members share a single compiled executable
        (orchestration.launch_ensemble_training does this).  Pad rows are
        never valid."""
        labels = np.asarray(labels, np.int32)
        n = len(labels)
        if n == 0:
            raise ValueError("empty dataset")
        for k, v in arrays.items():
            if len(v) != n:
                raise ValueError(f"array {k!r} has {len(v)} rows, labels {n}")
        if preshuffle is not None:
            perm = np.random.default_rng(preshuffle).permutation(n)
            arrays = {k: np.asarray(v)[perm] for k, v in arrays.items()}
            labels = labels[perm]
            self._orig_ids = perm.astype(np.int64)
        else:
            self._orig_ids = np.arange(n, dtype=np.int64)
        self.n = n
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.tile = max(augmentation_frequency, 1)
        self.drop_last = drop_last
        self.mesh = mesh
        self.data_axis = data_axis
        if mesh is not None:
            n_shards = mesh.shape[data_axis]
            if batch_size % n_shards:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by {n_shards} shards"
                )
            sharding = NamedSharding(mesh, P(data_axis))

            def put(a):
                return jax.device_put(a, sharding)

            self.n_shards = n_shards
        else:
            put = jax.device_put
            self.n_shards = 1
        # Pad to a multiple of n_shards (and at least pad_to) with cycled
        # rows.  Pad rows live in device memory so shard extents are
        # uniform, but they are excluded from every epoch pool and never
        # marked valid.
        target = max(n, pad_to or 0)
        self.n_padded = math.ceil(target / self.n_shards) * self.n_shards
        pad_idx = np.arange(self.n_padded) % n  # cycles even when pad > n

        def _padded(a):
            a = np.asarray(a)
            if self.n_padded == n:
                return a
            return a[pad_idx]

        # Pixel-like arrays (ndim ≥ 2) are stored FLAT per row: TPU default
        # layouts tile the two minor dims and pad tiny channel dims (3 →
        # 128 lanes, 42.7× HBM) — see FlatRows.  Scalars-per-row (labels)
        # stay plain.
        def _store(a):
            a = _padded(np.asarray(a))
            if a.ndim < 2:
                return put(a)
            return FlatRows(put(a.reshape(len(a), -1)), a.shape[1:])

        self.resident = {k: _store(v) for k, v in arrays.items()}
        self.resident["label"] = put(_padded(labels))
        self.labels = labels
        # per-shard count of REAL rows (pad rows sit at the global tail)
        rows = self.n_padded // self.n_shards
        self._shard_rows = rows
        self._real_per_shard = np.clip(
            n - rows * np.arange(self.n_shards), 0, rows
        ).astype(int)
        # balanced-class hook: train.engine.fit reads df["class"]
        self.df = pd.DataFrame({"class": labels})

    @classmethod
    def from_pipeline(
        cls,
        pipeline,
        mesh: Optional[Mesh] = None,
        data_axis: str = "data",
        batch_size: Optional[int] = None,
        preshuffle: Optional[int] = None,
        pad_to: Optional[int] = None,
    ) -> "ResidentClips":
        """Materialize a BatchPipeline's staged samples once (host decode
        or clip-cache read — data.pipeline.ClipSource) and pin them in
        device memory.  Decoding uses the pipeline's thread pool (or the
        clip cache's native threaded pread fast path).  Shuffle/seed/
        tiling carry over from the pipeline."""
        import concurrent.futures as cf

        df = pipeline.df
        src = pipeline.source
        if hasattr(src, "populate") and not src.ready:
            src.populate()
        if hasattr(src, "read_batch") and getattr(src, "ready", False):
            rgb, labels = src.read_batch(np.arange(len(df)))
            arrays = {"rgb": rgb}
            labels = np.asarray(labels, np.int32)
        else:
            with cf.ThreadPoolExecutor(max_workers=pipeline.num_workers) as pool:
                samples = list(
                    pool.map(lambda i: src(df.iloc[int(i)]), range(len(df)))
                )
            keys = [k for k in samples[0] if k != "label"]
            arrays = {k: np.stack([s[k] for s in samples]) for k in keys}
            labels = np.asarray([s["label"] for s in samples], np.int32)
        return cls(
            arrays,
            labels,
            batch_size or pipeline.batch_size,
            mesh=mesh,
            data_axis=data_axis,
            shuffle=pipeline.shuffle,
            seed=pipeline.seed,
            augmentation_frequency=pipeline.tile,
            drop_last=pipeline.drop_last,
            preshuffle=preshuffle,
            pad_to=pad_to,
        )

    @property
    def nbytes(self) -> int:
        """Total device footprint of the resident arrays (all shards)."""
        return sum(int(v.nbytes) for v in self.resident.values())

    @property
    def _shard_bs(self) -> int:
        return self.batch_size // self.n_shards

    @property
    def _max_pool(self) -> int:
        return int(self._real_per_shard.max()) * self.tile

    def __len__(self) -> int:
        if self.drop_last:
            return self._max_pool // self._shard_bs
        return math.ceil(self._max_pool / self._shard_bs)

    def epoch_local_indices(self, epoch: int) -> List[np.ndarray]:
        """Per-shard pools of LOCAL row ids (real rows only, tiled
        `augmentation_frequency` times), shuffled per epoch —
        deterministic in (seed, epoch), like BatchPipeline.epoch_indices.
        Pool lengths differ when the dataset doesn't divide evenly."""
        rng = (
            np.random.default_rng((self.seed, epoch)) if self.shuffle else None
        )
        pools = []
        for d in range(self.n_shards):
            pool = np.tile(
                np.arange(self._real_per_shard[d], dtype=np.int32), self.tile
            )
            if rng is not None and len(pool):
                rng.shuffle(pool)
            pools.append(pool)
        return pools

    def batches(self, epoch: int = 0) -> Iterator[Dict]:
        """Yields {"resident": {name → (N_padded,…) device array, "label"
        incl.}, "indices": (B,) int32 local row ids in shard-block order,
        "valid": (B,) bool, "index": (B,) int64 global clip ids}."""
        pools = self.epoch_local_indices(epoch)
        pbs = self._shard_bs
        nb = len(self)
        for b in range(nb):
            idx = np.zeros((self.n_shards, pbs), np.int32)
            valid = np.zeros((self.n_shards, pbs), bool)
            for d, pool in enumerate(pools):
                chunk = pool[b * pbs : (b + 1) * pbs]
                valid[d, : len(chunk)] = True
                if len(chunk) < pbs:  # pad by cycling (masked out downstream)
                    fill = pool if len(pool) else np.zeros(1, np.int32)
                    chunk = np.resize(np.concatenate([chunk, fill]), pbs)
                idx[d] = chunk
            glob = idx.astype(np.int64) + (
                self._shard_rows * np.arange(self.n_shards, dtype=np.int64)
            )[:, None]
            yield {
                "resident": self.resident,
                "indices": idx.reshape(-1),
                "valid": valid.reshape(-1),
                # original clip ids (pre-preshuffle, pad rows cycled)
                "index": self._orig_ids[glob.reshape(-1) % self.n],
            }
