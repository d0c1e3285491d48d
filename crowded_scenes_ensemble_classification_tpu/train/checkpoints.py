"""Checkpoint I/O (orbax; process-local msgpack under multi-process).

Two artifact kinds, mirroring + extending the reference:
- `best/`  — best-val-loss model variables only (the reference's
  `{name}_weights.hdf5`, train.py:1850-1853), used for eval/ensembles.
- `full/`  — the complete TrainState (params, batch_stats, optimizer state,
  step, PRNG) for exact resume — which the reference could not do.

Format selection: single-process saves go through orbax.  Under an
initialized `jax.distributed` runtime (process_count > 1) orbax assumes
every save is a synchronized GLOBAL-array checkpoint — it refuses
host-local arrays and runs cross-process barriers, both wrong for the
ensemble fan-out where each process trains DIFFERENT members into its own
checkpoint dirs (the Slurm-replacement mode, launch_train_ensemble.py:
144-158).  There we write flax msgpack files instead: process-local,
barrier-free, atomic-rename.  Readers accept either format transparently.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def _abs(path: str) -> str:
    return os.path.abspath(path)


def _multiprocess() -> bool:
    try:
        return jax.process_count() > 1
    except Exception:  # backend not initialized yet
        return False


# --- typed-PRNG-safe msgpack serialization ---------------------------------

_PRNG_MARK = "__prng_key_data__"


def _is_prng(x) -> bool:
    try:
        return isinstance(x, jax.Array) and jax.dtypes.issubdtype(
            x.dtype, jax.dtypes.prng_key
        )
    except Exception:
        return False


def _to_msgpack_bytes(tree: Any) -> bytes:
    import flax.serialization

    state = flax.serialization.to_state_dict(tree)
    state = jax.tree_util.tree_map(
        lambda x: (
            {_PRNG_MARK: np.asarray(jax.random.key_data(x))}
            if _is_prng(x)
            else np.asarray(x)
        ),
        state,
        is_leaf=lambda x: _is_prng(x) or not isinstance(x, dict),
    )
    return flax.serialization.msgpack_serialize(state)


def _from_msgpack_bytes(blob: bytes, target: Any) -> Any:
    import flax.serialization

    loaded = flax.serialization.msgpack_restore(blob)

    def restore_keys(node):
        if isinstance(node, dict):
            if set(node.keys()) == {_PRNG_MARK}:
                return jax.random.wrap_key_data(node[_PRNG_MARK])
            return {k: restore_keys(v) for k, v in node.items()}
        return node

    loaded = restore_keys(loaded)
    if target is None:
        return loaded
    return flax.serialization.from_state_dict(target, loaded)


def _save_msgpack(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(_to_msgpack_bytes(jax.device_get(tree)))
    os.replace(tmp, path)


# --- best (variables only) -------------------------------------------------


def _best_msgpack(checkpoint_dir: str) -> str:
    return os.path.join(_abs(checkpoint_dir), "best.msgpack")


def save_best(checkpoint_dir: str, variables: Dict) -> str:
    if _multiprocess():
        path = _best_msgpack(checkpoint_dir)
        _save_msgpack(path, variables)
        return path
    path = os.path.join(_abs(checkpoint_dir), "best")
    ckptr = _ckptr()
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, variables)
    ckptr.wait_until_finished()
    return path


def best_exists(checkpoint_dir: str) -> bool:
    return os.path.exists(
        os.path.join(_abs(checkpoint_dir), "best")
    ) or os.path.exists(_best_msgpack(checkpoint_dir))


def _msgpack_wins(mp_path: str, orbax_path: str) -> bool:
    """True when the msgpack copy should be restored.  When BOTH formats
    exist (a dir trained single-process, then re-trained under the
    multi-process fan-out, or vice versa) the NEWER save wins — format
    preference alone would silently resurrect stale weights."""
    if not os.path.exists(mp_path):
        return False
    if not os.path.exists(orbax_path):
        return True
    return os.path.getmtime(mp_path) >= os.path.getmtime(orbax_path)


def restore_best(checkpoint_dir: str, target: Optional[Dict] = None) -> Dict:
    mp_path = _best_msgpack(checkpoint_dir)
    orbax_path = os.path.join(_abs(checkpoint_dir), "best")
    if _msgpack_wins(mp_path, orbax_path):
        with open(mp_path, "rb") as f:
            return _from_msgpack_bytes(f.read(), target)
    ckptr = _ckptr()
    if target is not None:
        return ckptr.restore(orbax_path, target=target)
    return ckptr.restore(orbax_path)


# --- full (exact-resume TrainState) ----------------------------------------


def _full_msgpack(checkpoint_dir: str) -> str:
    return os.path.join(_abs(checkpoint_dir), "full.msgpack")


def save_full(checkpoint_dir: str, state: Any) -> str:
    if _multiprocess():
        path = _full_msgpack(checkpoint_dir)
        _save_msgpack(path, state)
        return path
    path = os.path.join(_abs(checkpoint_dir), "full")
    ckptr = _ckptr()
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    return path


def full_exists(checkpoint_dir: str) -> bool:
    return os.path.exists(
        os.path.join(_abs(checkpoint_dir), "full")
    ) or os.path.exists(_full_msgpack(checkpoint_dir))


def restore_full(checkpoint_dir: str, target: Any) -> Any:
    mp_path = _full_msgpack(checkpoint_dir)
    orbax_path = os.path.join(_abs(checkpoint_dir), "full")
    if _msgpack_wins(mp_path, orbax_path):
        with open(mp_path, "rb") as f:
            return _from_msgpack_bytes(f.read(), target)
    return _ckptr().restore(orbax_path, target=target)
