"""Checkpoint I/O (orbax).

Two artifact kinds, mirroring + extending the reference:
- `best/`  — best-val-loss model variables only (the reference's
  `{name}_weights.hdf5`, train.py:1850-1853), used for eval/ensembles.
- `full/`  — the complete TrainState (params, batch_stats, optimizer state,
  step, PRNG) for exact resume — which the reference could not do.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckptr():
    return ocp.StandardCheckpointer()


def _abs(path: str) -> str:
    return os.path.abspath(path)


def save_best(checkpoint_dir: str, variables: Dict) -> str:
    path = os.path.join(_abs(checkpoint_dir), "best")
    ckptr = _ckptr()
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, variables)
    ckptr.wait_until_finished()
    return path


def best_exists(checkpoint_dir: str) -> bool:
    return os.path.exists(os.path.join(_abs(checkpoint_dir), "best"))


def restore_best(checkpoint_dir: str, target: Optional[Dict] = None) -> Dict:
    path = os.path.join(_abs(checkpoint_dir), "best")
    ckptr = _ckptr()
    if target is not None:
        return ckptr.restore(path, target=target)
    return ckptr.restore(path)


def save_full(checkpoint_dir: str, state: Any) -> str:
    path = os.path.join(_abs(checkpoint_dir), "full")
    ckptr = _ckptr()
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    return path


def full_exists(checkpoint_dir: str) -> bool:
    return os.path.exists(os.path.join(_abs(checkpoint_dir), "full"))


def restore_full(checkpoint_dir: str, target: Any) -> Any:
    path = os.path.join(_abs(checkpoint_dir), "full")
    return _ckptr().restore(path, target=target)
