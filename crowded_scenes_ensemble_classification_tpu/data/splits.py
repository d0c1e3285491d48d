"""Split-matrix builder: the k×(k−1) (test, val) pair grid.

Mirrors the reference launcher's loop (launch_train_ensemble.py:117-142):
for every test fold t and every val fold v ≠ t, train = concat of the
remaining k−2 folds; writes `split_test{t}_val{v}/{train,val,test}.csv`.
Idempotent: existing split CSVs are kept (launch_train_ensemble.py:130-142).
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import pandas as pd

from ..core.config import split_pairs


def split_dir_name(test_index: int, val_index: int) -> str:
    return f"split_test{test_index}_val{val_index}"


def build_split(
    fold_dfs: Sequence[pd.DataFrame], test_index: int, val_index: int
) -> Dict[str, pd.DataFrame]:
    k = len(fold_dfs)
    train_parts = [
        fold_dfs[i] for i in range(k) if i not in (test_index, val_index)
    ]
    return {
        "train": pd.concat(train_parts, ignore_index=True),
        "val": fold_dfs[val_index].reset_index(drop=True),
        "test": fold_dfs[test_index].reset_index(drop=True),
    }


def write_split_matrix(
    fold_dfs: Sequence[pd.DataFrame],
    splits_folder: str,
    overwrite: bool = False,
) -> List[Tuple[int, int, str]]:
    """Write every split_test{t}_val{v} directory.  Returns
    [(t, v, dir)] for all k·(k−1) pairs."""
    k = len(fold_dfs)
    out = []
    for t, v in split_pairs(k):
        d = os.path.join(splits_folder, split_dir_name(t, v))
        os.makedirs(d, exist_ok=True)
        split = build_split(fold_dfs, t, v)
        for name, df in split.items():
            path = os.path.join(d, f"{name}.csv")
            if overwrite or not os.path.exists(path):
                df.to_csv(path, index=False)
        out.append((t, v, d))
    return out


def load_fold_csvs(folds_folder: str, nb_folds: int) -> List[pd.DataFrame]:
    return [
        pd.read_csv(os.path.join(folds_folder, f"fold{i}.csv"))
        for i in range(nb_folds)
    ]
