"""Probability cache: typed npz tensors with reference-CSV export.

The reference cached each member's softmax matrix as a stringified numpy
array inside a CSV cell (store_probabilities evaluate_ensemble.py:1002-1109,
parsed back by string surgery + ast.literal_eval :65-73).  Here the cache is
one npz per (ensemble, test fold, subset): probs (M, N, C) float32, labels
(N,), member names — with an exporter that writes the legacy
`(path, probabilities)` CSV so reference tooling can still read it.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd


def probability_cache_path(
    cache_dir: str,
    ensemble_name: str,
    test_index: int,
    subset: str,
    variant: str = "",
) -> str:
    """subset ∈ {'test', 'train_val'} (reference evaluate_ensemble.py:1722).

    variant distinguishes alternative inference modes over the same
    (ensemble, fold, subset) — e.g. '_long80s8' for long-video window
    scans — so they never collide with the standard-window cache."""
    return os.path.join(
        cache_dir,
        f"{ensemble_name}_test{test_index}_{subset}{variant}_probabilities.npz",
    )


def save_probabilities(
    path: str,
    probs: np.ndarray,
    labels: np.ndarray,
    member_names: Sequence[str],
) -> str:
    assert probs.ndim == 3 and probs.shape[1] == len(labels)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(
        path,
        probs=probs.astype(np.float32),
        labels=np.asarray(labels, np.int32),
        member_names=np.asarray(list(member_names)),
    )
    return path


def load_probabilities(path: str) -> Dict[str, np.ndarray]:
    with np.load(path, allow_pickle=False) as z:
        return {
            "probs": z["probs"],
            "labels": z["labels"],
            "member_names": [str(x) for x in z["member_names"]],
        }


def probabilities_exist(path: str) -> bool:
    return os.path.exists(path)


def export_reference_csv(npz_path: str, csv_path: str) -> str:
    """Write the legacy `(path, probabilities)` CSV whose cells parse with
    the reference's convert_str2array (evaluate_ensemble.py:65-73):
    `ast.literal_eval` of a nested list literal."""
    data = load_probabilities(npz_path)
    rows = []
    for name, mat in zip(data["member_names"], data["probs"]):
        rows.append({"path": name, "probabilities": repr(mat.tolist())})
    os.makedirs(os.path.dirname(csv_path) or ".", exist_ok=True)
    pd.DataFrame(rows, columns=["path", "probabilities"]).to_csv(csv_path, index=False)
    return csv_path


def import_reference_csv(csv_path: str, num_classes: int) -> Dict[str, np.ndarray]:
    """Read a legacy probability CSV (ours or the reference's) back into the
    typed tensor form."""
    import ast

    df = pd.read_csv(csv_path)
    names, mats = [], []
    for _, row in df.iterrows():
        s = str(row["probabilities"])
        s = s.replace("array(", "").replace(", dtype=float32)", "")
        arr = np.asarray(ast.literal_eval(s), np.float32)
        mats.append(arr.reshape(-1, num_classes))
        names.append(str(row["path"]))
    return {"probs": np.stack(mats), "member_names": names}
